"""Where does the weak-scaling loss at 8 virtual devices go? (VERDICT r2
weak 1: virtual-8 efficiency 0.775 < 0.8, uninvestigated.)

Decomposition, all from measured quantities:

1. LOCKSTEP STRAGGLERS (algorithmic, hardware-independent): within a
   shard, vmapped NUTS chains execute the tree-doubling while_loop until
   every lane terminates, so a shard's per-transition cost ~ its slowest
   chain's leapfrog count; the full-batch program is bounded by the
   slowest shard. From the run's own `info.num_steps` we compute
       straggler_ratio(n_shards) =
           mean_t[max over shards of (max over shard's chains steps)]
         / mean_t[max over ALL chains steps]          (1-device reference)
   i.e. how much per-transition work the sharded layout adds relative to
   one big vmapped batch. NOTE with multinomial NUTS all chains usually
   run to full depth, so this is often ~1.0 — measured, not assumed.

2. PER-PHASE SCALING: warmup has one cross-shard pmean per transition
   (pooled accept) + one at the metric switch; draws have NO collectives.
   Comparing per-phase efficiency separates collective overhead (warmup
   degrades) from plain core-sharing on the virtual mesh (both degrade).

Run on the 8-virtual-device CPU mesh:
  XLA_FLAGS=--xla_force_host_platform_device_count=8 \
  python scripts/scaling_attribution.py
(The printed JSON feeds docs/scaling.md.)
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax

# force CPU BEFORE any backend initializes — probing jax.default_backend()
# here would itself initialize the (axon TPU) default backend and make the
# switch a no-op; this script must never touch the real chip
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np


def measure_phases(n_devices, chains_per_device, dim, num_warmup,
                   num_samples):
    from tpuflows.dist import worker_mesh
    from tpuflows.dist.mesh import WORKERS, row_sharded
    from tpuflows.mcmc import NUTSDriver
    from tpuflows.targets import NealsFunnel
    from jax.sharding import PartitionSpec as P
    from jax import shard_map

    mesh = worker_mesh(n_devices)
    n_chains = chains_per_device * n_devices
    target = NealsFunnel(dim=dim)
    q0 = 0.5 * jax.random.normal(jax.random.key(0), (n_chains, dim))

    # phase-split run via run_nuts (one jitted program per phase) under
    # shard_map, so warmup and draw walls are separable
    from tpuflows.mcmc.sample import run_nuts

    def warm_only(key, q):
        res = run_nuts(key, target.log_density, q, num_warmup=num_warmup,
                       num_samples=1, axis_name=WORKERS, jit=False)
        return res.samples[-1], res.step_size, res.inv_mass

    warm = jax.jit(shard_map(
        warm_only, mesh=mesh, in_specs=(P(), P(WORKERS)),
        out_specs=(P(WORKERS), P(), P()), check_vma=False))

    def draw_fn(key, q, eps, inv_mass):
        def local(key, q, eps, inv_mass):
            from tpuflows.mcmc.nuts import make_nuts_kernel

            kernel = make_nuts_kernel(target.log_density, max_depth=8)
            vkernel = jax.vmap(kernel, in_axes=(0, 0, None, None))

            def body(carry, step_key):
                q = carry
                keys = jax.random.split(step_key, q.shape[0])
                q, info = vkernel(keys, q, eps, inv_mass)
                return q, (q, info)

            key = jax.random.fold_in(key, jax.lax.axis_index(WORKERS))
            _, (samples, info) = jax.lax.scan(
                body, q, jax.random.split(key, num_samples))
            return samples, info

        return jax.jit(shard_map(
            local, mesh=mesh,
            in_specs=(P(), P(WORKERS), P(), P()),
            out_specs=(P(None, WORKERS), P(None, WORKERS)),
            check_vma=False))(key, q, eps, inv_mass)

    # prime (compile both phases)
    q1, eps, inv_mass = warm(jax.random.key(1), q0)
    float(jnp.sum(q1))
    s, info = draw_fn(jax.random.key(2), q1, eps, inv_mass)
    float(jnp.sum(s))

    t0 = time.perf_counter()
    q1, eps, inv_mass = warm(jax.random.key(1), q0)
    float(jnp.sum(q1))
    warm_s = time.perf_counter() - t0

    t0 = time.perf_counter()
    s, info = draw_fn(jax.random.key(2), q1, eps, inv_mass)
    float(jnp.sum(s))
    draw_s = time.perf_counter() - t0

    # lockstep straggler accounting from num_steps (num_samples, n_chains)
    steps = np.asarray(info.num_steps)
    per_shard = steps.reshape(num_samples, n_devices, chains_per_device)
    shard_max = per_shard.max(axis=2)  # slowest lane per shard per step
    global_max = steps.max(axis=1)  # one big batch: slowest lane overall
    straggler_ratio = float(shard_max.max(axis=1).mean() / global_max.mean())

    return {
        "n_devices": n_devices,
        "n_chains": n_chains,
        "warm_s": round(warm_s, 3),
        "draw_s": round(draw_s, 3),
        "warm_chain_steps_per_s": round(n_chains * num_warmup / warm_s, 1),
        "draw_chain_steps_per_s": round(n_chains * num_samples / draw_s, 1),
        "straggler_ratio": round(straggler_ratio, 4),
        "mean_leapfrogs_per_transition": round(float(steps.mean()), 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--chains-per-device", type=int, default=32)
    ap.add_argument("--dim", type=int, default=16)
    ap.add_argument("--num-warmup", type=int, default=100)
    ap.add_argument("--num-samples", type=int, default=200)
    ap.add_argument("--devices", default="1,8")
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    rows = [measure_phases(int(n), args.chains_per_device, args.dim,
                           args.num_warmup, args.num_samples)
            for n in args.devices.split(",")]
    for r in rows:
        print(json.dumps(r), flush=True)
    if len(rows) == 2:
        base, big = rows
        ratio = big["n_devices"] / base["n_devices"]
        summary = {
            # per-device weak-scaling efficiency, per phase
            "warm_efficiency": round(
                big["warm_chain_steps_per_s"]
                / (base["warm_chain_steps_per_s"] * ratio), 3),
            "draw_efficiency": round(
                big["draw_chain_steps_per_s"]
                / (base["draw_chain_steps_per_s"] * ratio), 3),
            "straggler_ratio_8dev": big["straggler_ratio"],
        }
        print(json.dumps(summary), flush=True)
        rows.append(summary)
    if args.out:
        with open(args.out, "w") as f:
            f.write("\n".join(json.dumps(r) for r in rows) + "\n")


if __name__ == "__main__":
    main()
