"""RQS kernel microbenchmark: Pallas vs pure-jnp oracle (SURVEY.md §7 stage 5:
"measure speedup at d in {8, 64, 256}").

Times forward eval, inverse eval, and forward+VJP of the raw-param spline
transform at the bench's working sizes (batch 1024, K=8), two ways:

- `scan` (default, the honest device number): the op runs inside a jitted
  `lax.scan` over `--inner` data-dependent iterations, so per-iteration time
  is pure device compute — per-call dispatch latency (which through the axon
  TPU tunnel is ~1 ms, 10-100x the op itself at these sizes) is amortized
  away. The carry threads y back into x (and the VJP's param cotangent back
  into raw), so XLA cannot dead-code or batch-overlap the iterations.
- `dispatch`: one call per iteration, host readback at the end — what a
  user pays when the op is NOT inside a larger jit.

Run on the real TPU chip; prints one JSON line per d.

Usage: python scripts/rqs_microbench.py [--batch 1024] [--iters 30]
       [--inner 50] [--mode scan|dispatch|both]
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


def _sync(out):
    # host readback forces completion (see bench.py NOTE on the axon tunnel)
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def time_dispatch(fn, *args, iters):
    out = fn(*args)  # compile
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / iters


def time_scan(step, init, inner, repeats=3):
    """step: carry -> carry. Returns per-iteration seconds (min of repeats)."""

    @jax.jit
    def run(carry):
        return jax.lax.scan(lambda c, _: (step(c), None), carry,
                            None, length=inner)[0]

    carry = run(init)  # compile
    _sync(carry)
    best = float("inf")
    for _ in range(repeats):
        t0 = time.perf_counter()
        carry = run(init)
        _sync(carry)
        best = min(best, time.perf_counter() - t0)
    return best / inner


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--inner", type=int, default=50)
    ap.add_argument("--knots", type=int, default=8)
    ap.add_argument("--mode", default="scan",
                    choices=["scan", "dispatch", "both"])
    args = ap.parse_args()

    from tpuflows.flows import rqs_ref
    from tpuflows.kernels import rqs_pallas

    K = args.knots
    B = rqs_ref.DEFAULT_RANGE
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
        row = {"d": d, "batch": args.batch, "mode": args.mode}
        for name, (fwd, inv) in impls.items():

            def loss(x, r, f=fwd):
                y, ladj = f(x, r, B)
                return jnp.sum(y) + jnp.sum(ladj)

            grad = jax.grad(loss, argnums=(0, 1))

            if args.mode in ("scan", "both"):
                # data-dependent chains: y feeds the next x (kept in-range
                # by the 0.97 contraction), grads feed a tiny param update.
                row[f"{name}_fwd_ms"] = round(1e3 * time_scan(
                    lambda c, f=fwd: (0.97 * f(c[0], c[1], B)[0], c[1]),
                    (x, raw), args.inner), 4)
                row[f"{name}_inv_ms"] = round(1e3 * time_scan(
                    lambda c, f=inv: (0.97 * f(c[0], c[1], B)[0], c[1]),
                    (x, raw), args.inner), 4)

                def gstep(c, g=grad):
                    gx, gr = g(c[0], c[1])
                    return (c[0] + 1e-6 * gx, c[1] - 1e-6 * gr)

                row[f"{name}_grad_ms"] = round(
                    1e3 * time_scan(gstep, (x, raw), args.inner), 4)
            if args.mode in ("dispatch", "both"):
                jf, ji = jax.jit(lambda a, r, f=fwd: f(a, r, B)), \
                         jax.jit(lambda a, r, f=inv: f(a, r, B))
                jg = jax.jit(grad)
                row[f"{name}_fwd_dispatch_ms"] = round(
                    1e3 * time_dispatch(jf, x, raw, iters=args.iters), 4)
                row[f"{name}_inv_dispatch_ms"] = round(
                    1e3 * time_dispatch(ji, x, raw, iters=args.iters), 4)
                row[f"{name}_grad_dispatch_ms"] = round(
                    1e3 * time_dispatch(jg, x, raw, iters=args.iters), 4)

        for op in ("fwd", "inv", "grad"):
            if f"jnp_{op}_ms" in row:
                row[f"{op}_speedup"] = round(
                    row[f"jnp_{op}_ms"] / row[f"pallas_{op}_ms"], 2)
        print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
