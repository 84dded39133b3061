"""Multimodal Cauchy target (BATTestCases.jl parity).

Reference parity (SURVEY.md §2b row 13): BATTestCases.jl ships a
`MultimodalCauchy` — symmetric Cauchy peaks at +-mu in the first two
dims, independent zero-centered Cauchy in the rest. Heavy tails (no
moments!) + multimodality make it the standard stress test for samplers
and for flow tails; tests must gate on QUANTILES, not moments.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.targets.base import Target
from tpuflows.util.pytree import pytree_dataclass, static_field


def _log_cauchy(x, loc, scale):
    z = (x - loc) / scale
    return -jnp.log1p(z * z) - jnp.log(jnp.pi * scale)


@pytree_dataclass
class MultimodalCauchy(Target):
    dim: int = static_field(default=4)
    mu: float = static_field(default=1.0)
    sigma: float = static_field(default=0.2)

    def log_density(self, x):
        # dims 0,1: 1/2 Cauchy(-mu, sigma) + 1/2 Cauchy(+mu, sigma)
        bimodal = jnp.logaddexp(
            _log_cauchy(x[..., :2], -self.mu, self.sigma),
            _log_cauchy(x[..., :2], self.mu, self.sigma),
        ) - jnp.log(2.0)
        rest = _log_cauchy(x[..., 2:], 0.0, self.sigma)
        return jnp.sum(bimodal, axis=-1) + jnp.sum(rest, axis=-1)

    def sample(self, key, n):
        k_c, k_s = jax.random.split(key)
        c = self.sigma * jax.random.cauchy(k_c, (n, self.dim), jnp.float32)
        signs = jnp.where(
            jax.random.bernoulli(k_s, 0.5, (n, 2)), self.mu, -self.mu
        )
        locs = jnp.concatenate(
            [signs, jnp.zeros((n, self.dim - 2), jnp.float32)], axis=-1
        )
        return c + locs

    def quantiles(self, qs):
        """Analytic per-dim quantiles (dims >= 2): loc + scale tan(pi(q-1/2));
        dims 0,1 are symmetric mixtures — the median is 0 by symmetry."""
        qs = jnp.asarray(qs, jnp.float32)
        return self.sigma * jnp.tan(jnp.pi * (qs - 0.5))
