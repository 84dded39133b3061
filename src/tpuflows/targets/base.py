"""Target-density protocol.

Reference parity (SURVEY.md §2b row 13): DensityInterface.jl's
`logdensityof(target, x)` protocol plus the BAT ecosystem's test targets.
Each target exposes `log_density` on `(..., d)` batches (vmap-free — pure
jnp broadcasting so XLA fuses it into leapfrog), and, where available,
exact sampling + analytic moments for the 3-MC-sigma acceptance gate
(BASELINE.json:5).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


class Target:
    """Protocol: dim, log_density; optional sample/mean/cov."""

    dim: int

    def log_density(self, x: jax.Array) -> jax.Array:
        """x: (..., d) -> (...) unnormalized log density."""
        raise NotImplementedError

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.log_density(x)

    # Optional ground-truth interface (for tests / MC-sigma gates) --------
    def sample(self, key: jax.Array, n: int) -> jax.Array:
        raise NotImplementedError(f"{type(self).__name__} has no exact sampler")

    def mean(self) -> jax.Array:
        raise NotImplementedError

    def cov(self) -> jax.Array:
        raise NotImplementedError


def logdensityof(target: Target, x: jax.Array) -> jax.Array:
    """DensityInterface.jl-style free function."""
    return target.log_density(x)


def std_normal_logpdf(x: jax.Array) -> jax.Array:
    """log N(x; 0, I) summed over the trailing feature axis."""
    d = x.shape[-1]
    return -0.5 * jnp.sum(x * x, axis=-1) - 0.5 * d * jnp.log(2.0 * jnp.pi)
