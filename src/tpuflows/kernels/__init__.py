from tpuflows.kernels.rqs_pallas import (
    rqs_forward_from_raw,
    rqs_inverse_from_raw,
)

__all__ = ["rqs_forward_from_raw", "rqs_inverse_from_raw"]
