"""Banana (Haario twisted Gaussian) and Rosenbrock test targets.

Reference parity (SURVEY.md §2b row 13): the BAT ecosystem's standard
non-Gaussian test shapes (BATTestCases-style curved/banana densities used
throughout the adaptive-MCMC literature the reference builds on).

Banana: start from z ~ N(0, diag(sigma1^2, 1, ..., 1)) and twist
x0 = z0, x1 = z1 + b (z0^2 - sigma1^2), rest identity. The map is
volume-preserving (unit Jacobian), so the density is exact, sampling is
exact, and all moments are analytic — ideal for 3-MC-sigma gates
(BASELINE.json:5) on a curved target.

Rosenbrock: log p = -sum_i [ (x_{2i} - mu)^2 / (2 s1^2)
                           + (x_{2i+1} - x_{2i}^2)^2 / (2 s2^2) ]
over consecutive pairs — exact sampling by construction (x_even ~ normal,
x_odd | x_even ~ normal around x_even^2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.targets.base import Target
from tpuflows.util.pytree import pytree_dataclass, static_field


@pytree_dataclass
class Banana(Target):
    dim: int = static_field(default=2)
    b: float = static_field(default=0.5)
    sigma1: float = static_field(default=2.0)

    def _untwist(self, x):
        z1 = x[..., 1] - self.b * (x[..., 0] ** 2 - self.sigma1**2)
        return jnp.concatenate(
            [x[..., :1], z1[..., None], x[..., 2:]], axis=-1
        )

    def log_density(self, x):
        z = self._untwist(x)  # unit Jacobian
        d = self.dim
        quad = (z[..., 0] / self.sigma1) ** 2 + jnp.sum(
            z[..., 1:] ** 2, axis=-1
        )
        return (
            -0.5 * quad
            - jnp.log(self.sigma1)
            - 0.5 * d * jnp.log(2.0 * jnp.pi)
        )

    def sample(self, key, n):
        z = jax.random.normal(key, (n, self.dim), jnp.float32)
        z = z.at[:, 0].mul(self.sigma1)
        x1 = z[:, 1] + self.b * (z[:, 0] ** 2 - self.sigma1**2)
        return jnp.concatenate([z[:, :1], x1[:, None], z[:, 2:]], axis=-1)

    def mean(self):
        # E[x1] = E[z1] + b (E[z0^2] - sigma1^2) = 0
        return jnp.zeros((self.dim,), jnp.float32)

    def cov(self):
        # Var(x0) = sigma1^2; Var(x1) = 1 + b^2 Var(z0^2) = 1 + 2 b^2 sigma1^4
        var = jnp.ones((self.dim,), jnp.float32)
        var = var.at[0].set(self.sigma1**2)
        var = var.at[1].set(1.0 + 2.0 * self.b**2 * self.sigma1**4)
        return jnp.diag(var)


@pytree_dataclass
class Rosenbrock(Target):
    dim: int = static_field(default=2)  # must be even
    mu: float = static_field(default=1.0)
    s1: float = static_field(default=1.0)
    s2: float = static_field(default=0.1)

    def log_density(self, x):
        xe = x[..., 0::2]
        xo = x[..., 1::2]
        quad = jnp.sum(((xe - self.mu) / self.s1) ** 2, axis=-1) + jnp.sum(
            ((xo - xe**2) / self.s2) ** 2, axis=-1
        )
        npairs = self.dim // 2
        return (
            -0.5 * quad
            - npairs * (jnp.log(self.s1) + jnp.log(self.s2))
            - 0.5 * self.dim * jnp.log(2.0 * jnp.pi)
        )

    def sample(self, key, n):
        ke, ko = jax.random.split(key)
        npairs = self.dim // 2
        xe = self.mu + self.s1 * jax.random.normal(ke, (n, npairs), jnp.float32)
        xo = xe**2 + self.s2 * jax.random.normal(ko, (n, npairs), jnp.float32)
        x = jnp.stack([xe, xo], axis=-1).reshape(n, self.dim)
        return x

    def mean(self):
        m = jnp.zeros((self.dim,), jnp.float32)
        m = m.at[0::2].set(self.mu)
        # E[x_odd] = E[x_even^2] = mu^2 + s1^2
        m = m.at[1::2].set(self.mu**2 + self.s1**2)
        return m
