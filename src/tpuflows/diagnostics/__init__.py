from tpuflows.diagnostics.ess import (
    effective_sample_size,
    importance_weight_ess,
)
from tpuflows.diagnostics.rhat import split_rhat
from tpuflows.diagnostics.moments import MomentCheck, moment_gate

__all__ = [
    "effective_sample_size",
    "importance_weight_ess",
    "split_rhat",
    "MomentCheck",
    "moment_gate",
]
