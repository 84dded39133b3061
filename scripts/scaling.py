"""Weak-scaling harness (BASELINE.json:5: samples/s at 1 chip / 1 host /
N hosts; efficiency target >= 0.8 from 1 to 4 hosts).

Weak scaling: chains-per-device held fixed while the mesh grows, so ideal
scaling doubles samples/s per doubling. Run on a pod slice after
`init_distributed()`; on a single machine with virtual CPU devices
(XLA_FLAGS=--xla_force_host_platform_device_count=8) the numbers validate
the CODE PATH (collectives, sharding) but not true throughput — virtual
devices share physical cores.

Usage:
  python scripts/scaling.py [--devices 1,2,4,8] [--chains-per-device 32]
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

# persistent XLA cache: the priming call in measure() compiles; the timed
# call re-traces but hits this cache, so dt excludes compilation
jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.abspath(__file__)),
                               "..", ".jax_cache"))


def measure(n_devices: int, chains_per_device: int, dim: int,
            num_warmup: int, num_samples: int,
            chunk_size=None) -> dict:
    from tpuflows.dist import run_nuts_sharded, worker_mesh
    from tpuflows.mcmc import run_nuts
    from tpuflows.targets import NealsFunnel

    mesh = worker_mesh(n_devices)
    n_chains = chains_per_device * n_devices
    target = NealsFunnel(dim=dim)
    q0 = jax.random.normal(jax.random.key(0), (n_chains, dim)) * 0.5

    if n_devices == 1:
        # single device: no shard_map needed (a 1-device mesh's pmean is
        # the identity), and chunked execution keeps each device program
        # short — the axon TPU tunnel kills single programs running many
        # minutes (see mcmc/sample.py chunk_size)
        def go(key):
            return run_nuts(key, target.log_density, q0,
                            num_warmup=num_warmup, num_samples=num_samples,
                            chunk_size=chunk_size)
    else:
        def go(key):
            return run_nuts_sharded(key, target.log_density, q0, mesh,
                                    num_warmup=num_warmup,
                                    num_samples=num_samples)

    # prime: identical call compiles the program (persistent-cache hit for
    # the timed run below), so `dt` is execution only — without this the
    # 1-device row carries a larger fixed compile share and the computed
    # "efficiency" is compilation noise, not scaling
    res = go(jax.random.key(1))
    float(jnp.sum(res.samples))

    t0 = time.perf_counter()
    res = go(jax.random.key(1))
    float(jnp.sum(res.samples))  # host readback forces device completion
    dt = time.perf_counter() - t0
    # NOTE: dt still includes the timed call's host-side RE-TRACE (the
    # persistent cache removes compilation, not tracing) — a fixed ~1s-scale
    # per-row cost. Use num_samples large enough to amortize it; artifact
    # headers state the residual.
    sps = n_chains * num_samples / dt
    return {"n_devices": n_devices, "n_chains": n_chains,
            "wall_s": round(dt, 2), "samples_per_s": round(sps, 1)}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", default=None,
                    help="comma-separated device counts (default: 1..all)")
    ap.add_argument("--chains-per-device", type=int, default=32)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--num-warmup", type=int, default=100)
    ap.add_argument("--num-samples", type=int, default=200)
    ap.add_argument("--chunk", type=int, default=None,
                    help="chunk size for the 1-device row (required on the "
                         "axon TPU tunnel; e.g. 64)")
    ap.add_argument("--platform", default=None, choices=[None, "cpu", "tpu"],
                    help="force a backend (cpu + XLA_FLAGS="
                         "--xla_force_host_platform_device_count=8 gives the "
                         "virtual validation mesh)")
    args = ap.parse_args()
    if args.platform == "cpu":
        # sitecustomize pre-imports jax, so env vars are too late; the
        # config knob still works because backends initialize lazily.
        jax.config.update("jax_platforms", args.platform)
    elif args.platform == "tpu":
        # the TPU here is the DEFAULT backend but registers under the
        # experimental platform name "axon" — forcing jax_platforms="tpu"
        # would fail. Just verify the default resolves to TPU.
        if jax.default_backend() != "tpu":
            raise SystemExit(f"default backend is {jax.default_backend()!r},"
                             " not tpu")

    n_avail = len(jax.devices())
    if args.devices:
        counts = [int(c) for c in args.devices.split(",")]
    else:
        counts, c = [], 1
        while c <= n_avail:
            counts.append(c)
            c *= 2

    rows = []
    for n in counts:
        if n > n_avail:
            break
        row = measure(n, args.chains_per_device, args.dim,
                      args.num_warmup, args.num_samples,
                      chunk_size=args.chunk)
        rows.append(row)
        print(json.dumps(row), flush=True)

    if len(rows) > 1:
        base = rows[0]["samples_per_s"] / rows[0]["n_devices"]
        for row in rows[1:]:
            eff = row["samples_per_s"] / row["n_devices"] / base
            print(json.dumps({"n_devices": row["n_devices"],
                              "weak_scaling_efficiency": round(eff, 3)}),
                  flush=True)


if __name__ == "__main__":
    main()
