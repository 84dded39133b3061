"""Speed-of-light accounting for the north-star bench (BASELINE.json:5:
"vmapped log-prob + leapfrog + flow-Jacobian kernels at speed-of-light per
chip"; VERDICT r2 item 7).

Method — every number is measured or compiler-reported, nothing recalled:
  1. FLOPs/bytes of ONE vmapped leapfrog-gradient evaluation (the hot op of
     the NUTS hot loop: flow forward + ladj + target logp, value_and_grad,
     1024 chains x 64-d) from XLA's own `compiled.cost_analysis()`.
  2. Mean leapfrog steps per NUTS transition from the run's own
     `info.num_steps`, so FLOPs/transition = FLOPs/leapfrog x mean steps.
  3. Achieved FLOP/s = FLOPs/leapfrog x total leapfrogs / draw wall time
     (compile excluded via the shared-program priming the NUTSDriver does).
  4. Host/dispatch gap: the same total draws executed as ONE device program
     (a single scan) vs the chunked driver loop; the difference is host
     round-trip + dispatch overhead, the rest is device time.
  5. Roofline: arithmetic intensity = flops/bytes vs the v5e ridge point;
     fraction-of-peak quoted against both the f32 VPU-bound and bf16 MXU
     peaks (the bench runs f32).

Writes docs/artifacts/perf_accounting.json and prints it.
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
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))

# TPU v5e (v5 lite) public per-chip peaks: 197 TFLOP/s bf16 MXU,
# 819 GB/s HBM BW. f32 ops on the VPU peak far lower; the MXU does not
# accelerate f32 matmuls without explicit bf16 casting.
V5E_BF16_PEAK_TFLOPS = 197.0
V5E_HBM_GBPS = 819.0

DIM = 64
N_CHAINS = 1024
MAX_DEPTH = 6


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--train-steps", type=int, default=1500)
    ap.add_argument("--num-warmup", type=int, default=128)
    ap.add_argument("--num-draws", type=int, default=512)
    ap.add_argument("--chunk", type=int, default=128)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "..", "docs",
        "artifacts", "perf_accounting.json"))
    args = ap.parse_args()

    from tpuflows.flows import build_flow, make_reverse_kl_trainer
    from tpuflows.mcmc import NUTSDriver
    from tpuflows.mcmc.preconditioned import flow_reparameterized
    from tpuflows.targets import NealsFunnel

    target = NealsFunnel(dim=DIM)
    init = jax.random.normal(jax.random.key(1), (1024, DIM), jnp.float32)
    flow = build_flow(init, jax.random.key(2), kind="affine", n_blocks=1,
                      hidden=(128, 128), mask_scheme="leading", clamp=8.0)
    trainer = make_reverse_kl_trainer(
        target.log_density, DIM, optax.adam(1e-2), batch_size=1024, stl=True,
        chunk_size=args.train_steps)
    flow = trainer(jax.random.key(3), flow, args.train_steps).result
    logp = flow_reparameterized(target.log_density, flow)

    # ---- 1. compiler-reported cost of one vmapped leapfrog gradient ------
    grad_fn = jax.jit(jax.vmap(jax.value_and_grad(logp)))
    q = jax.random.normal(jax.random.key(4), (N_CHAINS, DIM), jnp.float32)
    compiled = grad_fn.lower(q).compile()
    ca = compiled.cost_analysis()
    ca = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops_per_grad = float(ca.get("flops", float("nan")))
    bytes_per_grad = float(ca.get("bytes accessed", float("nan")))
    intensity = flops_per_grad / bytes_per_grad

    # ---- 2./3. measured NUTS draw throughput (shared-program priming) ----
    driver = NUTSDriver(logp, max_depth=MAX_DEPTH)
    st = driver.warmup(jax.random.key(5), q, args.num_warmup,
                       chunk_size=args.chunk)
    # prime the FULL chunked call (scan chunks + the cross-chunk
    # concatenates — priming a single chunk would leave the concat
    # programs to compile inside the timed region)
    _, z_p, _ = driver.draws(jax.random.key(98), st, args.num_draws,
                             chunk_size=args.chunk)
    float(jnp.sum(z_p))

    t0 = time.perf_counter()
    st2, z, info = driver.draws(jax.random.key(6), st, args.num_draws,
                                chunk_size=args.chunk)
    float(jnp.sum(z))
    draw_s = time.perf_counter() - t0

    mean_steps = float(jnp.mean(info.num_steps.astype(jnp.float32)))
    total_leapfrogs = float(jnp.sum(info.num_steps.astype(jnp.float64)))
    # under vmap the while_loop body executes for the WHOLE 1024-chain
    # batch while any chain continues; with pooled adaptation all chains
    # run equal-depth trees (straggler ratio 1.0, docs/scaling.md), so the
    # number of BATCHED grad evaluations = per-chain steps, and each costs
    # flops_per_grad (which already covers all 1024 chains)
    batched_leapfrogs = total_leapfrogs / N_CHAINS
    achieved_tflops = flops_per_grad * batched_leapfrogs / draw_s / 1e12
    # NUTS bookkeeping outside the leapfrog gradient (tree shuffling,
    # u-turn checks) is NOT counted as useful FLOPs — this is a lower bound
    # on device utilization by design (useful-work accounting).

    # ---- 4. host/dispatch gap: one-program execution of the same work ----
    _, z1p, _ = driver.draws(jax.random.key(6), st, args.num_draws,
                             chunk_size=args.num_draws)  # prime
    float(jnp.sum(z1p))
    t0 = time.perf_counter()
    st3, z1, _ = driver.draws(jax.random.key(6), st, args.num_draws,
                              chunk_size=args.num_draws)
    float(jnp.sum(z1))
    one_prog_s = time.perf_counter() - t0

    hbm_bound_s = bytes_per_grad * batched_leapfrogs / (V5E_HBM_GBPS * 1e9)

    row = {
        "artifact": "perf_accounting_nuts_funnel64",
        "backend": jax.default_backend(),
        "n_chains": N_CHAINS,
        "dim": DIM,
        "max_depth": MAX_DEPTH,
        "num_draws": args.num_draws,
        "flops_per_leapfrog_grad_vmapped": flops_per_grad,
        "bytes_per_leapfrog_grad_vmapped": bytes_per_grad,
        "arithmetic_intensity_flops_per_byte": round(intensity, 3),
        "mean_leapfrogs_per_transition": round(mean_steps, 2),
        "total_leapfrogs": int(total_leapfrogs),
        "batched_leapfrogs": int(batched_leapfrogs),
        "draw_wall_s_chunked": round(draw_s, 3),
        "draw_wall_s_one_program": round(one_prog_s, 3),
        "host_dispatch_gap_frac": round(1.0 - one_prog_s / draw_s, 4),
        "achieved_tflops_useful": round(achieved_tflops, 4),
        "frac_of_v5e_bf16_peak": round(
            achieved_tflops / V5E_BF16_PEAK_TFLOPS, 5),
        "hbm_roofline_bound_s": round(hbm_bound_s, 3),
        "frac_of_hbm_roofline": round(hbm_bound_s / one_prog_s, 4),
        "chain_leapfrogs_per_s": round(total_leapfrogs / draw_s, 0),
        "batched_leapfrogs_per_s": round(batched_leapfrogs / draw_s, 1),
    }
    line = json.dumps(row)
    print(line)
    with open(args.out, "w") as f:
        f.write(line + "\n")


if __name__ == "__main__":
    main()
