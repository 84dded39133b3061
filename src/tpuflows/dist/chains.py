"""Sharded-chain NUTS over the worker mesh.

Reference parity (SURVEY.md §2c, §3.4): BAT.jl's parallel chains on
Distributed.jl workers, rebuilt as: chain axis row-sharded over the mesh,
per-chip vmap over the local block (BASELINE.json:10), dual-averaging and
Welford statistics pooled across shards with `pmean` (SURVEY.md §7 hard
part 5 — pooling never changes the algorithm, only throughput), per-shard
keys decorrelated by folding in the worker index (mcmc/sample.py).
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpuflows.dist.mesh import WORKERS, row_sharded
from tpuflows.mcmc.sample import MCMCResult, run_nuts


def run_nuts_sharded(
    key: jax.Array,
    log_density: Callable,
    init_positions: jax.Array,  # (n_chains, d), n_chains % n_devices == 0
    mesh: Mesh,
    **nuts_kwargs,
) -> MCMCResult:
    """run_nuts with the chain axis sharded over `mesh`.

    Returns the same MCMCResult with `samples` (num_samples, n_chains, d)
    row-sharded on axis 1. Warmup adaptation (step size, mass matrix) is
    pooled across ALL chains on ALL shards, so results are independent of
    the shard count up to RNG stream assignment.
    """
    n_chains = init_positions.shape[0]
    n_dev = len(mesh.devices.flat)
    if n_chains % n_dev != 0:
        raise ValueError(f"{n_chains} chains not divisible by {n_dev} devices")

    init_positions = jax.device_put(init_positions, row_sharded(mesh))

    def local(key, q0):
        return run_nuts(
            key, log_density, q0,
            axis_name=WORKERS, jit=False, **nuts_kwargs,
        )

    sharded = jax.jit(
        shard_map(
            local,
            mesh=mesh,
            in_specs=(P(), P(WORKERS)),
            out_specs=MCMCResult(
                samples=P(None, WORKERS),
                info=P(None, WORKERS),
                step_size=P(),
                inv_mass=P(),
            ),
            check_vma=False,
        )
    )
    return sharded(key, init_positions)
