from tpuflows.util.pytree import pytree_dataclass, static_field
from tpuflows.util import prng, shapes

__all__ = ["pytree_dataclass", "static_field", "prng", "shapes"]
