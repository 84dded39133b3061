"""North-star benchmark (BASELINE.json:2): effective samples/sec/chip for
flow-preconditioned NUTS on the 64-d Neal's funnel, 1024 vmapped chains on
one chip (config 4, BASELINE.json:10).

Pipeline (timed phases, COMPILATION EXCLUDED via same-shape priming calls):
  1. fit a 64-d flow to the funnel by reverse KL (self-sampling, STL).
     Flow family: standardize + ONE leading-mask affine coupling — the
     funnel's exact transport (x_rest = exp(v/2) z_rest) lives in this
     family, so the fitted latent is near-iid N(0, I) (measured ELBO
     ~ -0.01 nats) and NUTS mixes at close to iid efficiency.
  2. NUTS in the flow's latent space: POOLED dual-averaging step size
     (per-chain adaptation lets one straggler chain force 2^max_depth-leaf
     trees on the whole vmapped batch — measured 10x wall-time blowup and
     run-to-run R-hat flapping in round 1), Welford mass matrix, 1024
     chains, warmup then draw windows.
  3. CONVERGENCE GATE: windows of draws are appended until
     max split-R-hat < 1.05 AND min cross-chain ESS >= 10k (or the window
     budget is exhausted — then the bench FAILS loudly, exit 1, no metric).
     ESS/R-hat are computed on DATA-space draws, min over all 64 dims.

Metric = min_ess / (warmup + draw wall-time), compile excluded.
`vs_baseline`: ratio against the first number this repo recorded
(bench_baseline.json, round-1 driver run: 0.96 eff samples/s/chip).

Variants (TPUFLOWS_BENCH_VARIANT):
  ceiling (default) — standardize + ONE leading-mask affine coupling: the
    funnel's exact transport family (best case, target-specific mask).
  generic — the engine's GENERIC recipe: arqs (affine+RQS hybrid) coupling
    flow with mixed (checkerboard + block) masks, no funnel-specific
    structure, fitted by the same reverse-KL/STL VI. Same convergence
    gates. This is the number a user gets on an unseen target, and it
    exercises the RQS spline stack end-to-end (train + NUTS hot path);
    the detail line's `train_steps_per_s` is the RQS training throughput.
    Run via scripts/bench_generic.py; artifact: docs/artifacts/
    bench_generic_tpu.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "src"))

import jax
import jax.numpy as jnp
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               ".jax_cache"))

DIM = 64
N_CHAINS = 1024
TRAIN_STEPS = 6000
# One device program for the whole fit: a 6000-step train scan is ~0.6 s
# device time (well under the tunnel's program-kill threshold), while
# 200-step chunks paid ~100 ms of per-call tunnel overhead 30 times —
# measured 1,630 steps/s chunked vs 10,880 steps/s in one program.
TRAIN_CHUNK = 6000
NUM_WARMUP = 128
DRAW_WINDOW = 512
MAX_WINDOWS = 4
# One device program per draw window: after the NUTS one-hot fix a full
# 512-draw window runs in ~0.26 s device time, far under the axon tunnel's
# many-minute program kill threshold that originally forced 128-step chunks.
NUTS_CHUNK = 512
MAX_DEPTH = int(os.environ.get('TPUFLOWS_BENCH_MAX_DEPTH', '6'))
RHAT_GATE = 1.05
ESS_GATE = 10_000.0


def _ready(tree):
    """Force device completion by fetching a value (the axon tunnel's
    block_until_ready returns before completion; a host readback does not)."""
    leaves = jax.tree_util.tree_leaves(tree)
    return float(jnp.sum(leaves[0]))


def main():
    from tpuflows.diagnostics import effective_sample_size, split_rhat
    from tpuflows.flows import build_flow, make_reverse_kl_trainer
    from tpuflows.mcmc import NUTSDriver
    from tpuflows.mcmc.preconditioned import flow_reparameterized
    from tpuflows.targets import NealsFunnel
    from tpuflows.vi import elbo

    # "auto" (default): fused whole-transition NUTS kernel on TPU (measured
    # 2.3x metric / 1.65x wall vs the XLA path, round 4); "0" forces the
    # XLA path (the A/B baseline), "1" forces the kernel.
    pallas_env = os.environ.get("TPUFLOWS_BENCH_PALLAS", "auto")
    use_pallas = (jax.default_backend() == "tpu") if pallas_env == "auto" \
        else pallas_env == "1"
    variant = os.environ.get("TPUFLOWS_BENCH_VARIANT", "ceiling")
    target = NealsFunnel(dim=DIM)

    def make_flow0():
        init = jax.random.normal(jax.random.key(1), (1024, DIM), jnp.float32)
        if variant == "generic":
            # n_blocks=3 cycles the mixed masks through BOTH checkerboards
            # plus the first-half block mask — still generic (no knowledge
            # of which dim is the funnel's scale), and measured 6x better
            # reverse-KL on a funnel than the 2-block checkerboard-only
            # cycle (ELBO -0.0018 vs -0.0112, 16-d CPU sweep).
            # Coupling-kernel tier stays on the engine's auto policy
            # (XLA at d=64 — the fused coupling kernel's win regime is
            # d % 128 == 0).
            nb = int(os.environ.get("TPUFLOWS_BENCH_GENERIC_BLOCKS", "3"))
            return build_flow(init, jax.random.key(2), kind="arqs",
                              n_blocks=nb, knots=8, hidden=(128, 128),
                              mask_scheme="mixed", clamp=8.0,
                              use_pallas="auto")
        return build_flow(init, jax.random.key(2), kind="affine", n_blocks=1,
                          hidden=(128, 128), mask_scheme="leading",
                          clamp=8.0, use_pallas="auto")

    def make_opt():
        return optax.chain(
            optax.clip_by_global_norm(10.0),
            optax.adam(optax.cosine_decay_schedule(1e-2, TRAIN_STEPS,
                                                   alpha=0.03)),
        )

    # ---- 1. flow fit (timed: "flow train time", BASELINE.json:2) ---------
    flow0 = make_flow0()
    # ONE reusable trainer: priming shares the jitted chunk program with
    # the timed run, so compilation is excluded deterministically
    trainer = make_reverse_kl_trainer(
        target.log_density, DIM, make_opt(), batch_size=1024, stl=True,
        chunk_size=TRAIN_CHUNK)
    _ready(trainer(jax.random.key(9), flow0, TRAIN_CHUNK).result)  # prime

    t0 = time.perf_counter()
    res = trainer(jax.random.key(3), flow0, TRAIN_STEPS)
    flow = res.result
    _ready(flow)
    train_time = time.perf_counter() - t0
    final_elbo = elbo(jax.random.key(7), flow, target.log_density, DIM)

    # ---- 2. flow-preconditioned NUTS ---------------------------------------
    logp = flow_reparameterized(target.log_density, flow)
    q0 = jax.random.normal(jax.random.key(4), (N_CHAINS, DIM), jnp.float32)

    # ONE reusable driver: priming compiles the warmup/draw chunk programs
    # that the timed phases then reuse (window constants are traced, so the
    # priming warmup can be short).
    # TPUFLOWS_BENCH_PALLAS=1 swaps in the whole-transition Pallas kernel
    # (kernels/nuts_pallas.py): tree bookkeeping VMEM-resident per chain
    # tile instead of vmap-while carry traffic (docs/perf.md round-4
    # accounting: machinery is 3.4x the gradient cost on the XLA path).
    # "auto" engages the fused transition for BOTH variants since round 5:
    # the streamed per-block spline backward (tile_flow.
    # tile_logp_and_grad_streamed) lifted the arqs chain tile 32 -> 128
    # and the same-session A/B reads 142,437 vs 112,580 eff/s/chip
    # (1.27x metric; docs/artifacts/bench_generic_fused_ab.json).
    # PALLAS=0 forces the XLA path (the A/B baseline).
    # TPUFLOWS_BENCH_WINDOW=1: streaming multi-transition draw windows
    # (make_fused_nuts_window: per-chain state machines, one leapfrog per
    # chain per tick — no idling between transitions). Measured round 5
    # (docs/artifacts/nuts_window_ab.json, same-session A/Bs): 2x LOSS on
    # the ceiling variant (per-tick branchless bookkeeping ~ the tiny
    # affine gradient itself) and PAR on the generic variant (draw wall
    # 0.99 vs 1.03 s) — i.e. the "remaining 2x is inter-transition
    # tile-lockstep" hypothesis is falsified; the per-transition fused
    # kernel stays the default everywhere ("auto"/"0").
    window_env = os.environ.get("TPUFLOWS_BENCH_WINDOW", "auto")
    use_window = use_pallas and window_env == "1"
    transition = window_transition = None
    if use_pallas:
        from tpuflows.kernels.nuts_pallas import (
            fused_nuts_for_flow,
            fused_nuts_window_for_flow,
        )

        transition = fused_nuts_for_flow(target.log_density, flow,
                                         max_depth=MAX_DEPTH)
        if use_window:
            window_transition = fused_nuts_window_for_flow(
                target.log_density, flow, window=32, max_depth=MAX_DEPTH)
    driver = NUTSDriver(logp, max_depth=MAX_DEPTH, transition=transition,
                        window_transition=window_transition)
    st_p = driver.warmup(jax.random.key(99), q0, NUM_WARMUP,
                         chunk_size=NUTS_CHUNK)
    # prime with a FULL window AND the same key-derivation op (fold_in) so
    # every program the timed windows run — scan chunks, cross-chunk
    # concatenates, and the tiny eager key ops, whose FIRST compile through
    # the remote-compile tunnel costs ~1 s — is compiled here
    _, z_p, _ = driver.draws(jax.random.fold_in(jax.random.key(98), 0),
                             st_p, DRAW_WINDOW, chunk_size=NUTS_CHUNK)
    _ready(z_p)
    # re-prime warmup LAST: the first execution of the warmup program after
    # another program ran pays a one-time ~0.35 s runtime reload on this
    # tunnel (measured: identical call 0.43 s then 0.08 s back-to-back);
    # making a warmup call the immediate predecessor of the timed one
    # keeps that artifact out of the timed phase
    _ready(driver.warmup(jax.random.key(97), q0, NUM_WARMUP,
                         chunk_size=NUTS_CHUNK).q)

    t0 = time.perf_counter()
    state = driver.warmup(jax.random.key(5), q0, NUM_WARMUP,
                          chunk_size=NUTS_CHUNK)
    _ready(state.q)
    warm_time = time.perf_counter() - t0

    # ---- 3. gated draw windows ------------------------------------------
    draw_time = 0.0
    zs, infos = [], []
    converged = False
    min_ess = max_rhat = float("nan")
    x = None
    # jitted + chunked data-space map (ONE program reused across windows):
    # an eager inverse would materialize the (draws*chains, d, 3K-1)
    # spline-param tensor for ALL draws at once (~GBs for the generic RQS
    # flow) and OOM the chip
    inv_chunk = jax.jit(lambda zz: flow.inverse(zz.reshape(-1, DIM))
                        .reshape(zz.shape))
    for w in range(MAX_WINDOWS):
        t0 = time.perf_counter()
        state, z, info = driver.draws(jax.random.fold_in(jax.random.key(6), w),
                                      state, DRAW_WINDOW,
                                      chunk_size=NUTS_CHUNK)
        _ready(z)
        draw_time += time.perf_counter() - t0
        zs.append(z)
        infos.append(info)
        z_all = jnp.concatenate(zs, axis=0)
        x = jnp.concatenate(
            [inv_chunk(z_all[lo:lo + 64])
             for lo in range(0, z_all.shape[0], 64)],
            axis=0)
        ess = effective_sample_size(x)
        rhat = split_rhat(x)
        min_ess = float(jnp.min(ess))
        max_rhat = float(jnp.max(rhat))
        print(json.dumps({"window": w, "draws": int(z_all.shape[0]),
                          "min_ess": round(min_ess, 0),
                          "max_rhat": round(max_rhat, 4)}), file=sys.stderr)
        if max_rhat < RHAT_GATE and min_ess >= ESS_GATE:
            converged = True
            break

    sample_time = warm_time + draw_time
    eff_sps = min_ess / sample_time
    div = jnp.mean(jnp.concatenate(
        [i.diverging.astype(jnp.float32).reshape(-1) for i in infos]))

    detail = {
        "variant": variant,
        "train_steps_per_s": round(TRAIN_STEPS / train_time, 1),
        "train_time_s": round(train_time, 2),
        "warmup_time_s": round(warm_time, 2),
        "draw_time_s": round(draw_time, 2),
        "sample_time_s": round(sample_time, 2),
        "n_draws": int(sum(z.shape[0] for z in zs)),
        "min_ess": round(min_ess, 1),
        "max_rhat": round(max_rhat, 4),
        "v_mean": round(float(jnp.mean(x[..., 0])), 3),
        "v_std": round(float(jnp.std(x[..., 0])), 3),
        "final_elbo": round(float(final_elbo), 3),
        "divergence_rate": round(float(div), 4),
        "step_size": round(float(state.step_size), 4),
        "pallas": use_pallas,
        "converged": converged,
    }
    print(json.dumps(detail), file=sys.stderr)

    if not converged:
        print(json.dumps({"error": "convergence gate failed",
                          "max_rhat": max_rhat, "min_ess": min_ess}),
              file=sys.stderr)
        sys.exit(1)

    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "bench_baseline.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)["value"]
    else:
        base = eff_sps
        with open(baseline_path, "w") as f:
            json.dump({"metric": "eff_samples_per_sec_per_chip",
                       "value": eff_sps}, f)

    suffix = "" if variant == "ceiling" else f"_{variant}"
    print(json.dumps({
        "metric": f"eff_samples_per_sec_per_chip_nuts_funnel64{suffix}",
        "value": round(eff_sps, 2),
        "unit": "eff_samples/s/chip",
        "vs_baseline": round(eff_sps / base, 3),
    }))


if __name__ == "__main__":
    main()
