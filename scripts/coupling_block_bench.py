"""Coupling-BLOCK benchmark: fused Pallas kernel vs XLA-fused jnp block vs
elementwise-Pallas block (VERDICT r2 item 4: "fuse bigger — conditioner
matmul + spline + masked ladj reduce in one kernel").

Block-level is the honest comparison for the training hot path (SURVEY.md
§3.2): each impl runs the SAME conditioner MLP + spline + masked ladj
reduce; what differs is where the (batch, d*(3K-1)) raw-parameter tensor
lives (HBM for XLA/elementwise, VMEM for the fused kernel) and whether the
VJP crosses a custom_vjp fusion boundary.

Timing = scan-amortized device time (see rqs_microbench.py): the op runs
inside a jitted lax.scan with data-dependent carries so per-iter time is
pure device compute, dispatch excluded.

Run on the real TPU chip; one JSON line per (d, hidden).

Usage: python scripts/coupling_block_bench.py [--batch 1024] [--inner 200]
"""
import argparse
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp


def _sync(out):
    return float(jnp.sum(jax.tree_util.tree_leaves(out)[0]))


def time_scan(step, init, inner, repeats=3):
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
    ap.add_argument("--inner", type=int, default=200)
    ap.add_argument("--knots", type=int, default=8)
    ap.add_argument("--hidden", default="128,128")
    ap.add_argument("--out", default=None)
    ap.add_argument("--dims", default="8,64,256",
                    help="comma-separated dims to bench")
    args = ap.parse_args()
    hidden = tuple(int(h) for h in args.hidden.split(","))

    from tpuflows.flows import RQSCouplingBlock
    from tpuflows.util.shapes import alternating_mask

    lines = []
    for d in (int(s) for s in args.dims.split(",")):
        base = RQSCouplingBlock.init(
            jax.random.key(d), alternating_mask(d, 0), knots=args.knots,
            hidden=hidden)
        # non-identity conditioner so the spline does real work
        ws = list(base.net.weights)
        ws[-1] = 0.05 * jax.random.normal(jax.random.key(d + 1),
                                          ws[-1].shape)
        base = dataclasses.replace(
            base, net=dataclasses.replace(base.net, weights=tuple(ws)))
        impls = {
            # explicit False: the init default is now "auto", which would
            # silently resolve to the fused kernel at aligned d on TPU —
            # the baseline must stay the XLA path
            "jnp": dataclasses.replace(base, use_pallas=False),
            "pallas_elem": dataclasses.replace(base, use_pallas=True),
            "pallas_fused": dataclasses.replace(base, use_pallas="fused"),
        }
        x0 = jax.random.normal(jax.random.key(2 * d), (args.batch, d),
                               jnp.float32)
        row = {"d": d, "batch": args.batch, "hidden": list(hidden),
               "knots": args.knots, "inner": args.inner}
        for name, blk in impls.items():
            # fwd: y feeds next x (contraction keeps it in range)
            row[f"{name}_fwd_ms"] = round(1e3 * time_scan(
                lambda c, b=blk: 0.97 * b.forward_and_ladj(c)[0],
                x0, args.inner), 4)
            row[f"{name}_inv_ms"] = round(1e3 * time_scan(
                lambda c, b=blk: 0.97 * b.inverse_and_ladj(c)[0],
                x0, args.inner), 4)

            # train-style VJP: grad wrt net params + x, params updated
            def gstep(c, b=blk):
                x, net = c

                def loss(net, x):
                    z, l = dataclasses.replace(b, net=net).forward_and_ladj(x)
                    return jnp.sum(z * z) + jnp.sum(l)

                gn, gx = jax.grad(loss, argnums=(0, 1))(net, x)
                net = jax.tree_util.tree_map(
                    lambda w, g: w - 1e-6 * g, net, gn)
                return (x + 1e-6 * gx, net)

            row[f"{name}_grad_ms"] = round(1e3 * time_scan(
                gstep, (x0, blk.net), args.inner), 4)
        for op in ("fwd", "inv", "grad"):
            row[f"{op}_speedup_fused_vs_jnp"] = round(
                row[f"jnp_{op}_ms"] / row[f"pallas_fused_{op}_ms"], 2)
            row[f"{op}_speedup_elem_vs_jnp"] = round(
                row[f"jnp_{op}_ms"] / row[f"pallas_elem_{op}_ms"], 2)
        line = json.dumps(row)
        print(line, flush=True)
        lines.append(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(lines) + "\n")


if __name__ == "__main__":
    main()
