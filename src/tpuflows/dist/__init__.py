from tpuflows.dist.mesh import (
    WORKERS,
    init_distributed,
    replicated,
    row_sharded,
    worker_mesh,
)
from tpuflows.dist.resample import resample_sharded
from tpuflows.dist.train import optimize_flow_dp
from tpuflows.dist.chains import run_nuts_sharded

__all__ = [
    "WORKERS",
    "init_distributed",
    "replicated",
    "row_sharded",
    "worker_mesh",
    "resample_sharded",
    "optimize_flow_dp",
    "run_nuts_sharded",
]
