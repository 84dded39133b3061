"""RQS kernel microbenchmark: Pallas vs pure-jnp oracle (SURVEY.md §7 stage 5:
"measure speedup at d in {8, 64, 256}").

Times forward eval, inverse eval, and forward+VJP of the raw-param spline
transform at the bench's working sizes (batch 1024, K=8). Run on the real
TPU chip; prints one JSON line per (d, op).

Usage: python scripts/rqs_microbench.py [--batch 1024] [--iters 50]
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


def timeit(fn, *args, iters=50):
    out = fn(*args)  # compile
    # host readback forces completion (see bench.py NOTE on the axon tunnel)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))
    return (time.perf_counter() - t0) / iters


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=50)
    ap.add_argument("--knots", type=int, default=8)
    args = ap.parse_args()

    from tpuflows.flows import rqs_ref
    from tpuflows.kernels import rqs_pallas

    K = args.knots
    impls = {
        "jnp": (rqs_ref.rqs_forward_from_raw, rqs_ref.rqs_inverse_from_raw),
        "pallas": (rqs_pallas.rqs_forward_from_raw,
                   rqs_pallas.rqs_inverse_from_raw),
    }

    for d in (8, 64, 256):
        key = jax.random.key(d)
        x = 2.0 * jax.random.normal(key, (args.batch, d), jnp.float32)
        raw = 0.5 * jax.random.normal(jax.random.key(d + 1),
                                      (args.batch, d, 3 * K - 1), jnp.float32)
        row = {"d": d, "batch": args.batch}
        for name, (fwd, inv) in impls.items():
            jfwd = jax.jit(lambda x, r, f=fwd: f(x, r, rqs_ref.DEFAULT_RANGE))
            jinv = jax.jit(lambda x, r, f=inv: f(x, r, rqs_ref.DEFAULT_RANGE))

            def loss(x, r, f=fwd):
                y, ladj = f(x, r, rqs_ref.DEFAULT_RANGE)
                return jnp.sum(y) + jnp.sum(ladj)

            jgrad = jax.jit(jax.grad(loss, argnums=(0, 1)))
            row[f"{name}_fwd_ms"] = round(
                1e3 * timeit(jfwd, x, raw, iters=args.iters), 4)
            row[f"{name}_inv_ms"] = round(
                1e3 * timeit(jinv, x, raw, iters=args.iters), 4)
            row[f"{name}_grad_ms"] = round(
                1e3 * timeit(jgrad, x, raw, iters=args.iters), 4)
        row["fwd_speedup"] = round(row["jnp_fwd_ms"] / row["pallas_fwd_ms"], 2)
        row["inv_speedup"] = round(row["jnp_inv_ms"] / row["pallas_inv_ms"], 2)
        row["grad_speedup"] = round(
            row["jnp_grad_ms"] / row["pallas_grad_ms"], 2)
        print(json.dumps(row))


if __name__ == "__main__":
    main()
