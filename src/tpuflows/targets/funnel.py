"""Neal's funnel (config 4: 64-d, the north-star target, BASELINE.json:10).

v = x[0] ~ N(0, sigma_v^2);  x[1:] | v ~ N(0, exp(v) I).
The pathological curvature (scale of x[1:] varies by exp(v/2)) is exactly
what the trained flow must absorb as a NUTS preconditioner (SURVEY.md §7
hard part 4).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.targets.base import Target
from tpuflows.util.pytree import pytree_dataclass, static_field


@pytree_dataclass
class NealsFunnel(Target):
    dim: int = static_field(default=64)
    sigma_v: float = static_field(default=3.0)

    def log_density(self, x):
        v = x[..., 0]
        rest = x[..., 1:]
        k = self.dim - 1
        lp_v = -0.5 * (v / self.sigma_v) ** 2 - jnp.log(self.sigma_v) - 0.5 * jnp.log(
            2.0 * jnp.pi
        )
        # x_i | v ~ N(0, exp(v)) => var = exp(v), log std = v/2
        lp_rest = (
            -0.5 * jnp.sum(rest * rest, axis=-1) * jnp.exp(-v)
            - 0.5 * k * v
            - 0.5 * k * jnp.log(2.0 * jnp.pi)
        )
        return lp_v + lp_rest

    def sample(self, key, n):
        kv, kr = jax.random.split(key)
        v = self.sigma_v * jax.random.normal(kv, (n,), jnp.float32)
        rest = jnp.exp(v / 2.0)[:, None] * jax.random.normal(
            kr, (n, self.dim - 1), jnp.float32
        )
        return jnp.concatenate([v[:, None], rest], axis=-1)

    def mean(self):
        return jnp.zeros((self.dim,), jnp.float32)

    def cov(self):
        # Var(v) = sigma_v^2; Var(x_i) = E[exp(v)] = exp(sigma_v^2 / 2)
        var = jnp.full((self.dim,), jnp.exp(self.sigma_v**2 / 2.0), jnp.float32)
        var = var.at[0].set(self.sigma_v**2)
        return jnp.diag(var)
