"""North-star benchmark (BASELINE.json:2): effective samples/sec/chip for
flow-preconditioned NUTS on the 64-d Neal's funnel, 1024 vmapped chains on
one chip (config 4, BASELINE.json:10).

Pipeline (timed phases):
  1. fit a 64-d RQ-spline flow to the funnel by reverse KL (self-sampling),
  2. run dual-averaging-adapted NUTS in the flow's latent space, 1024 chains,
  3. ESS = min over dims of cross-chain autocorrelation ESS of the
     data-space draws; metric = ESS / sampling wall-time.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.
`vs_baseline`: the reference publishes no numbers (BASELINE.json:13,
BASELINE.md), so the ratio is against the first number this repo recorded
(bench_baseline.json, written on first run) — 1.0 on that first run.
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


def main():
    from tpuflows.diagnostics import effective_sample_size, split_rhat
    from tpuflows.flows import build_flow
    from tpuflows.mcmc import run_nuts
    from tpuflows.mcmc.preconditioned import flow_reparameterized
    from tpuflows.targets import NealsFunnel
    from tpuflows.vi import fit_vi

    dim = 64
    n_chains = 1024
    num_warmup = 256
    num_samples = 256
    use_pallas = os.environ.get("TPUFLOWS_BENCH_PALLAS", "") == "1"

    target = NealsFunnel(dim=dim)
    key = jax.random.key(0)

    # ---- 1. flow fit (timed: "flow train time", BASELINE.json:2) ---------
    # Recipe (measured, see PROGRESS notes): affine+RQS hybrid blocks
    # (affine carries the funnel's exp(v/2) dynamic range, splines the
    # shape), mixed checkerboard+block masks (conditioners see the global
    # scale dim whole), STL gradient estimator, grad clip + cosine decay.
    # Final ELBO ~ -0.05 nats (KL(q||p) ~ 0.05) vs -1.2 for pure-RQS.
    nsteps = 2000
    t0 = time.perf_counter()
    init = jax.random.normal(jax.random.key(1), (1024, dim), jnp.float32)
    flow0 = build_flow(init, jax.random.key(2), kind="arqs", n_blocks=4,
                       knots=8, hidden=(128, 128), mask_scheme="mixed",
                       use_pallas=use_pallas)
    vi = fit_vi(jax.random.key(3), target.log_density, flow0, dim,
                optimizer=optax.chain(
                    optax.clip_by_global_norm(10.0),
                    optax.adam(optax.cosine_decay_schedule(1e-3, nsteps,
                                                           alpha=0.1)),
                ),
                batch_size=1024, nsteps=nsteps, stl=True)
    flow = vi.flow
    # NOTE: host readback, not block_until_ready — the axon tunnel's
    # block_until_ready returns before device completion; only fetching a
    # value forces real execution (verified against matmul rooflines).
    float(jnp.sum(jax.tree_util.tree_leaves(flow)[0]))
    train_time = time.perf_counter() - t0

    # ---- 2. flow-preconditioned NUTS, 1024 chains, one chip --------------
    logp = flow_reparameterized(target.log_density, flow)
    q0 = jax.random.normal(jax.random.key(4), (n_chains, dim), jnp.float32)

    t0 = time.perf_counter()
    # chunked: bounds single-program runtime (the tunnel worker dies on
    # multi-minute programs); results identical to the unchunked run
    res = run_nuts(jax.random.key(5), logp, q0, num_warmup=num_warmup,
                   num_samples=num_samples, max_depth=8, target_accept=0.8,
                   chunk_size=32)
    float(jnp.sum(res.samples))  # host readback (see NOTE above)
    sample_time = time.perf_counter() - t0

    # ---- 3. quality + metric --------------------------------------------
    x = flow.inverse(res.samples.reshape(-1, dim)).reshape(res.samples.shape)
    ess = effective_sample_size(x)
    rhat = split_rhat(x)
    min_ess = float(jnp.min(ess))
    eff_sps = min_ess / sample_time

    # funnel ground truth: v ~ N(0,3^2) on dim 0
    v_mean = float(jnp.mean(x[..., 0]))
    v_std = float(jnp.std(x[..., 0]))

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

    detail = {
        "train_time_s": round(train_time, 2),
        "sample_time_s": round(sample_time, 2),
        "min_ess": round(min_ess, 1),
        "max_rhat": round(float(jnp.max(rhat)), 4),
        "v_mean": round(v_mean, 3),
        "v_std": round(v_std, 3),
        "final_elbo": round(float(vi.final_elbo), 3),
        "divergence_rate": round(
            float(jnp.mean(res.info.diverging.astype(jnp.float32))), 4),
        "pallas": use_pallas,
    }
    print(json.dumps(detail), file=sys.stderr)
    print(json.dumps({
        "metric": "eff_samples_per_sec_per_chip_nuts_funnel64",
        "value": round(eff_sps, 2),
        "unit": "eff_samples/s/chip",
        "vs_baseline": round(eff_sps / base, 3),
    }))


if __name__ == "__main__":
    main()
