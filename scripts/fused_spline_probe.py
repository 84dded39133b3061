"""Round-5 probe: does the STREAMED per-block backward let the fused
NUTS transition run arqs (spline) flows at chain tile 128 on the real
chip — and how fast is one transition vs the XLA path?

Compiles ONE program (the bare fused transition at the bench shape:
64-d funnel, 6-coupling-block arqs flow, max_depth 6) instead of the
full bench's train/warmup/draw programs, so a tile-size iteration costs
one remote compile, not four. Prints a JSON line per tile tried.

Usage: python scripts/fused_spline_probe.py [tile ...]   (default 128 64)
"""
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

DIM = 64
N_CHAINS = 1024
MAX_DEPTH = 6


def main():
    from tpuflows.flows import build_flow
    from tpuflows.kernels.nuts_pallas import fused_nuts_for_flow
    from tpuflows.targets import NealsFunnel

    tiles = [int(a) for a in sys.argv[1:]] or [128, 64]
    target = NealsFunnel(dim=DIM)
    init = jax.random.normal(jax.random.key(1), (1024, DIM), jnp.float32)
    flow = build_flow(init, jax.random.key(2), kind="arqs", n_blocks=3,
                      knots=8, hidden=(128, 128), mask_scheme="mixed",
                      clamp=8.0, use_pallas=False)
    q = jax.random.normal(jax.random.key(3), (N_CHAINS, DIM), jnp.float32)
    eps = jnp.asarray(0.25, jnp.float32)
    im = jnp.ones((DIM,), jnp.float32)

    for tile in tiles:
        trans = fused_nuts_for_flow(target.log_density, flow,
                                    max_depth=MAX_DEPTH, tile_b=tile)

        @jax.jit
        def steps(key, q, n=8):
            def body(carry, k):
                qq, tot = carry
                qq, info = trans(jax.random.split(k, N_CHAINS), qq, eps, im)
                return (qq, tot + jnp.sum(info.num_steps)), None

            ks = jax.random.split(key, n)
            (qq, tot), _ = jax.lax.scan(body, (q, jnp.asarray(0.0)), ks)
            return qq, tot

        t0 = time.perf_counter()
        try:
            q1, tot = steps(jax.random.key(5), q)
            float(jnp.sum(q1))
        except Exception as e:  # noqa: BLE001 — report OOM/lowering failure
            print(json.dumps({"tile": tile, "ok": False,
                              "error": str(e)[:400]}))
            continue
        compile_s = time.perf_counter() - t0
        # timed: dependency-chained scan of 8 transitions, second call
        t0 = time.perf_counter()
        q1, tot = steps(jax.random.key(6), q1)
        n_leap = float(tot)
        float(jnp.sum(q1))
        wall = time.perf_counter() - t0
        t0 = time.perf_counter()
        q1, tot2 = steps(jax.random.key(7), q1)
        float(jnp.sum(q1))
        wall2 = time.perf_counter() - t0
        per_batched_leapfrog_us = 1e6 * min(wall, wall2) / (
            (n_leap if wall <= wall2 else float(tot2)) / N_CHAINS)
        print(json.dumps({
            "tile": tile, "ok": True,
            "compile_s": round(compile_s, 1),
            "wall_8_transitions_s": round(min(wall, wall2), 4),
            "mean_leapfrogs_per_transition": round(
                n_leap / (8 * N_CHAINS), 2),
            "us_per_batched_leapfrog": round(per_batched_leapfrog_us, 1),
        }))


if __name__ == "__main__":
    main()
