from tpuflows.util.pytree import pytree_dataclass, static_field
from tpuflows.util import shapes

__all__ = ["pytree_dataclass", "static_field", "shapes"]
