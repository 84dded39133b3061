from tpuflows.dist.mesh import (
    WORKERS,
    init_distributed,
    replicated,
    row_sharded,
    worker_mesh,
)
from tpuflows.dist.failures import (
    CollectiveTimeout,
    FailurePolicy,
    heartbeat,
    run_with_timeout,
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
    "CollectiveTimeout",
    "FailurePolicy",
    "heartbeat",
    "run_with_timeout",
    "resample_sharded",
    "optimize_flow_dp",
    "run_nuts_sharded",
]
