"""Device mesh and runtime initialization.

Reference parity (SURVEY.md §2b row 12, §2c): HeterogeneousComputing.jl's
compute-unit selection + BAT.jl's Distributed.jl worker pools, rebuilt the
TPU way — ONE 1-D mesh axis `workers` spanning every chip on every host
(chains/particles/sample-shards are data-parallel along it; TP/PP/EP/SP
are documented non-goals for this domain), XLA collectives over ICI/DCN
under `shard_map`.

Multi-host: call `init_distributed()` once per process before any jax use
(wraps `jax.distributed.initialize`; no-op when single-process). The mesh
then spans `jax.devices()` globally.
"""
from __future__ import annotations

import os
from typing import Optional

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

WORKERS = "workers"


def init_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize the multi-host runtime (no-op if single-process).

    On TPU pods the three arguments are auto-detected from the environment;
    pass them explicitly for CPU/GPU clusters.
    """
    explicit = coordinator_address is not None
    auto = bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))
    if explicit or auto:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )


def worker_mesh(n_devices: Optional[int] = None) -> Mesh:
    """1-D mesh over the first n (default: all) global devices."""
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(devs, (WORKERS,))


def row_sharded(mesh: Mesh) -> NamedSharding:
    """Leading axis split across workers (chains/particles/samples)."""
    return NamedSharding(mesh, P(WORKERS))


def replicated(mesh: Mesh) -> NamedSharding:
    """Fully replicated (flow params, optimizer state, scalars)."""
    return NamedSharding(mesh, P())
