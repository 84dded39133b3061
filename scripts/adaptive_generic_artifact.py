"""Engine-found generic recipe (VERDICT r3 next-round #5): let the
ADAPTIVE machinery build the funnel flow from a neutral starting config —
no hand-chosen n_blocks / mask cycle — then measure the same north-star
metric bench.py's hand-tuned generic variant reports.

Phase "search" (default platform: cpu): `adaptive_fit` with growth from
ONE arqs coupling unit (checkerboard mask, the build_flow default). Growth
is the engine's decision: when the flow-as-proposal IS-ESS stalls below
target, `maybe_grow_flow` appends an affine+RQS pair with the next mask
from the generic menu (checkerboards + half-blocks). Nothing in the
config names the funnel's scale dim. The search is a STRUCTURE+PARAMS
search; it runs on CPU because each growth step changes the program (the
axon tunnel pays ~20 min per arqs compile, and the found flow transfers —
it is an ordinary pytree).

Phase "eval" (platform: the TPU chip): bench.py's exact timed protocol
(priming, pooled-DA warmup, gated 512-draw windows, metric = min
cross-chain data-space ESS / sample wall-time) on the flow the engine
found. Comparison line: the hand-tuned generic artifact
(docs/artifacts/bench_generic_tpu.json, 111,654 eff/s/chip).

Usage:
  python scripts/adaptive_generic_artifact.py --phase search
  python scripts/adaptive_generic_artifact.py --phase eval
  python scripts/adaptive_generic_artifact.py            # both
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIM = 64
N_CHAINS = 1024
NUM_WARMUP = 128
DRAW_WINDOW = 512
MAX_WINDOWS = 4
MAX_DEPTH = 6
RHAT_GATE = 1.05
ESS_GATE = 10_000.0
FLOW_CKPT = os.path.join(ROOT, "docs", "artifacts", "adaptive_generic_flow")
OUT = os.path.join(ROOT, "docs", "artifacts", "adaptive_generic_tpu.json")
HAND_TUNED = 111_654.0  # bench_generic_tpu.json round-3 metric


def _flow_structure(flow):
    out = []
    for t in flow.transforms:
        name = type(t).__name__
        mask = getattr(t, "mask", None)
        if mask is not None:
            m = list(mask)
            if m == [1 - v for v in m[::-1]] and m[0] != m[1]:
                desc = f"checker{m[0]}"
            elif sum(m[:len(m) // 2]) in (0, len(m) // 2) and \
                    len(set(m[:len(m) // 2])) == 1:
                desc = f"block{m[0]}"
            else:
                desc = "mask?"
            out.append(f"{name}[{desc}]")
        else:
            out.append(name)
    return out


def search():
    jax.config.update("jax_platforms", "cpu")
    from tpuflows.adaptive import AdaptiveConfig, adaptive_fit
    from tpuflows.io import save_pytree
    from tpuflows.targets import NealsFunnel

    target = NealsFunnel(dim=DIM)
    # neutral start: ONE generic arqs unit, default checkerboard mask; all
    # structure beyond this is the engine's growth decision
    cfg = AdaptiveConfig(
        flow_kind="arqs", n_blocks=1, knots=8, hidden=(128, 128),
        mask_scheme="alternating", clamp=8.0,
        n_chains=128, num_warmup=150, num_samples=150, max_depth=5,
        fit_method="reverse_kl", vi_steps=4000, vi_batch=1024,
        learning_rate=3e-3,
        grow_on_stall=True, grow_on_ess_stall=True,
        grow_is_ess_target=0.5, grow_min_gain=1.1,
        # the stopping bar is ~40% per-draw min-dim ESS (the regime the
        # hand-tuned recipe reaches): a first run that stopped at 8%
        # (threshold 1500) failed the bench-scale convergence gate —
        # rhat 1.09 over 2048 draws at 1024 chains
        max_grown_blocks=4, max_rounds=10, ess_threshold=8000.0,
    )
    t0 = time.perf_counter()
    res = adaptive_fit(jax.random.key(0), target.log_density, DIM, cfg,
                       checkpoint_dir=os.path.join(ROOT, ".adaptive_ckpt"),
                       verbose=True)
    search_s = time.perf_counter() - t0
    save_pytree(FLOW_CKPT, {"flow": res.flow})
    rounds = [
        {"min_ess": round(float(r.min_ess), 1),
         "flow_is_ess": round(float(r.flow_is_ess), 4),
         "accept": round(float(r.accept_rate), 3)}
        for r in res.rounds
    ]
    row = {
        "phase": "search",
        "backend": jax.default_backend(),
        "n_rounds": res.n_rounds,
        "converged": bool(res.converged),
        "search_wall_s": round(search_s, 1),
        "structure_found": _flow_structure(res.flow),
        "rounds": rounds,
    }
    print(json.dumps(row))
    with open(FLOW_CKPT + "_search.json", "w") as f:
        f.write(json.dumps(row) + "\n")
    return row


def evaluate():
    jax.config.update("jax_compilation_cache_dir",
                      os.path.join(ROOT, ".jax_cache"))
    from tpuflows.diagnostics import effective_sample_size, split_rhat
    from tpuflows.io import load_pytree
    from tpuflows.mcmc import NUTSDriver
    from tpuflows.mcmc.preconditioned import flow_reparameterized
    from tpuflows.targets import NealsFunnel

    target = NealsFunnel(dim=DIM)
    flow = load_pytree(FLOW_CKPT)["flow"]
    logp = flow_reparameterized(target.log_density, flow)
    q0 = jax.random.normal(jax.random.key(4), (N_CHAINS, DIM), jnp.float32)

    driver = NUTSDriver(logp, max_depth=MAX_DEPTH)
    # priming protocol mirrors bench.py: compile + one-time program reload
    # excluded from the timed phases
    st_p = driver.warmup(jax.random.key(99), q0, NUM_WARMUP,
                         chunk_size=DRAW_WINDOW)
    _, z_p, _ = driver.draws(jax.random.fold_in(jax.random.key(98), 0),
                             st_p, DRAW_WINDOW, chunk_size=DRAW_WINDOW)
    float(jnp.sum(z_p))
    float(jnp.sum(driver.warmup(jax.random.key(97), q0, NUM_WARMUP,
                                chunk_size=DRAW_WINDOW).q))

    t0 = time.perf_counter()
    state = driver.warmup(jax.random.key(5), q0, NUM_WARMUP,
                          chunk_size=DRAW_WINDOW)
    float(jnp.sum(state.q))
    warm_time = time.perf_counter() - t0

    inv_chunk = jax.jit(lambda zz: flow.inverse(zz.reshape(-1, DIM))
                        .reshape(zz.shape))
    draw_time, zs = 0.0, []
    converged = False
    min_ess = max_rhat = float("nan")
    for w in range(MAX_WINDOWS):
        t0 = time.perf_counter()
        state, z, info = driver.draws(
            jax.random.fold_in(jax.random.key(6), w), state, DRAW_WINDOW,
            chunk_size=DRAW_WINDOW)
        float(jnp.sum(z))
        draw_time += time.perf_counter() - t0
        zs.append(z)
        z_all = jnp.concatenate(zs, axis=0)
        x = jnp.concatenate(
            [inv_chunk(z_all[lo:lo + 64])
             for lo in range(0, z_all.shape[0], 64)], axis=0)
        min_ess = float(jnp.min(effective_sample_size(x)))
        max_rhat = float(jnp.max(split_rhat(x)))
        print(json.dumps({"window": w, "min_ess": round(min_ess, 0),
                          "max_rhat": round(max_rhat, 4)}), file=sys.stderr)
        if max_rhat < RHAT_GATE and min_ess >= ESS_GATE:
            converged = True
            break

    sample_time = warm_time + draw_time
    eff = min_ess / sample_time
    row = {
        "phase": "eval",
        "artifact": "adaptive_generic_engine_found",
        "backend": jax.default_backend(),
        "structure": _flow_structure(flow),
        "warmup_s": round(warm_time, 3),
        "draw_s": round(draw_time, 3),
        "min_ess": round(min_ess, 1),
        "max_rhat": round(max_rhat, 4),
        "converged": converged,
        "eff_samples_per_s_per_chip": round(eff, 1),
        "hand_tuned_reference": HAND_TUNED,
        "vs_hand_tuned": round(eff / HAND_TUNED, 3),
    }
    print(json.dumps(row))
    return row


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--phase", choices=["search", "eval", "both"],
                    default="both")
    args = ap.parse_args()
    if args.phase == "both":
        # the search pins jax to cpu for this process; run eval in a fresh
        # process so it sees the TPU
        import subprocess

        search()
        sys.exit(subprocess.call(
            [sys.executable, os.path.abspath(__file__), "--phase", "eval"]))
    if args.phase == "search":
        search()
        return
    row = evaluate()
    rows = []
    try:
        rows.append(json.load(open(FLOW_CKPT + "_search.json")))
    except OSError:
        pass
    rows.append(row)
    with open(OUT, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    if not row["converged"]:
        sys.exit(1)


if __name__ == "__main__":
    main()
