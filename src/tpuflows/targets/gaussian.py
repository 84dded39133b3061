"""Standard / diagonal Gaussian targets (config 1, BASELINE.json:7)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.targets.base import Target
from tpuflows.util.pytree import pytree_dataclass, static_field


@pytree_dataclass
class StandardNormal(Target):
    dim: int = static_field()

    def log_density(self, x):
        return -0.5 * jnp.sum(x * x, axis=-1) - 0.5 * self.dim * jnp.log(
            2.0 * jnp.pi
        )

    def sample(self, key, n):
        return jax.random.normal(key, (n, self.dim), jnp.float32)

    def mean(self):
        return jnp.zeros((self.dim,), jnp.float32)

    def cov(self):
        return jnp.eye(self.dim, dtype=jnp.float32)


@pytree_dataclass
class DiagNormal(Target):
    loc: jax.Array  # (d,)
    scale: jax.Array  # (d,)

    @property
    def dim(self):
        return self.loc.shape[-1]

    def log_density(self, x):
        z = (x - self.loc) / self.scale
        return (
            -0.5 * jnp.sum(z * z, axis=-1)
            - jnp.sum(jnp.log(self.scale))
            - 0.5 * self.loc.shape[-1] * jnp.log(2.0 * jnp.pi)
        )

    def sample(self, key, n):
        eps = jax.random.normal(key, (n, self.dim), jnp.float32)
        return self.loc + self.scale * eps

    def mean(self):
        return self.loc

    def cov(self):
        return jnp.diag(self.scale**2)
