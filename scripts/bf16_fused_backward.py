"""bf16 fused coupling-block BACKWARD, settled (VERDICT r4 next #7).

Round 4 withdrew the "bf16 wins at larger conditioners" prediction when
the bf16 train-VJP failed to compile at d=256 / TILE_B=128: the operand
casts pushed the trace-time-vjp backward kernel to 17.15 MB of scoped
VMEM vs the 16 MB compiler default — without trying tile 64. Round 5
adds a per-kernel scoped-vmem limit (coupling_pallas.VMEM_LIMIT_MB,
v5e has 128 MB physical), so this measures the backward at BOTH tiles,
f32 vs bf16, same protocol as the original artifact (scan-amortized
block train-VJP: value_and_grad of a sum-loss through
fused_coupling_forward wrt the conditioner params; d=256, hidden
128x128, K=8, batch 4096).

Usage (on the TPU host): python scripts/bf16_fused_backward.py
Artifact: appends rows to docs/artifacts/bf16_fused_d256.json
"""
import dataclasses
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "artifacts", "bf16_fused_d256.json")
D, BATCH, INNER = 256, 4096, 50


def _sync(x):
    return float(jnp.sum(jax.tree_util.tree_leaves(x)[0]))


def measure(tile_b, compute_dtype):
    from tpuflows.kernels import coupling_pallas
    from tpuflows.flows.coupling import RQSCouplingBlock
    from tpuflows.kernels.coupling_pallas import fused_coupling_forward

    coupling_pallas.TILE_B = tile_b
    blk = RQSCouplingBlock.init(jax.random.key(0),
                                tuple([1, 0] * (D // 2)), knots=8,
                                hidden=(128, 128), use_pallas="fused")
    net = dataclasses.replace(blk.net, compute_dtype=compute_dtype)
    x = jax.random.normal(jax.random.key(1), (BATCH, D), jnp.float32)

    def loss(net, x):
        z, ladj = fused_coupling_forward(x, net, blk.mask, blk.knots,
                                         blk.range_limit)
        return jnp.sum(z * z) - jnp.sum(ladj)

    @jax.jit
    def run(net, x):
        def body(c, _):
            l, g = jax.value_and_grad(loss)(net, c)
            # data-dependent carry chains the iterations
            return c + 1e-6 * g.weights[0][0, 0], l

        return jax.lax.scan(body, x, None, length=INNER)

    try:
        out = run(net, x)
        _sync(out)
    except Exception as e:  # noqa: BLE001 — report compile failure
        return {"tile_b": tile_b, "dtype": compute_dtype, "ok": False,
                "error": str(e)[:300]}
    best = float("inf")
    for _ in range(3):
        t0 = time.perf_counter()
        _sync(run(net, x))
        best = min(best, time.perf_counter() - t0)
    return {"tile_b": tile_b, "dtype": compute_dtype, "ok": True,
            "train_vjp_us": round(1e6 * best / INNER, 1)}


def main():
    rows = []
    for tile in (128, 64):
        for dt in ("f32", "bf16"):
            r = measure(tile, dt)
            rows.append(r)
            print(json.dumps(r))
    with open(OUT, "a") as f:
        f.write("# round-5 re-measurement with VMEM_LIMIT_MB=64 "
                "(scoped-vmem ceiling raised; both tiles):\n")
        for r in rows:
            f.write(json.dumps(r) + "\n")


if __name__ == "__main__":
    main()
