"""Gaussian-mixture targets (config 3: 16-d bimodal, BASELINE.json:9).

Reference analog: multimodal test cases in BATTestCases.jl (SURVEY.md §2b
row 13).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.targets.base import Target
from tpuflows.util.pytree import pytree_dataclass


@pytree_dataclass
class GaussianMixture(Target):
    """Sum_k w_k N(mu_k, diag(sigma_k^2)); log density via logsumexp."""

    means: jax.Array  # (K, d)
    scales: jax.Array  # (K, d)
    log_weights: jax.Array  # (K,), normalized

    @property
    def dim(self):
        return self.means.shape[-1]

    def log_density(self, x):
        d = self.means.shape[-1]
        z = (x[..., None, :] - self.means) / self.scales  # (..., K, d)
        comp = (
            -0.5 * jnp.sum(z * z, axis=-1)
            - jnp.sum(jnp.log(self.scales), axis=-1)
            - 0.5 * d * jnp.log(2.0 * jnp.pi)
        )  # (..., K)
        return jax.scipy.special.logsumexp(comp + self.log_weights, axis=-1)

    def sample(self, key, n):
        k_comp, k_eps = jax.random.split(key)
        comp = jax.random.categorical(k_comp, self.log_weights, shape=(n,))
        eps = jax.random.normal(k_eps, (n, self.dim), jnp.float32)
        return self.means[comp] + self.scales[comp] * eps

    def mean(self):
        w = jnp.exp(self.log_weights)[:, None]
        return jnp.sum(w * self.means, axis=0)

    def cov(self):
        w = jnp.exp(self.log_weights)
        mu = self.mean()
        within = jnp.einsum("k,kd->d", w, self.scales**2)
        centered = self.means - mu
        between = jnp.einsum("k,kd,ke->de", w, centered, centered)
        return jnp.diag(within) + between

    @staticmethod
    def bimodal(dim: int, separation: float = 4.0, scale: float = 1.0):
        """Two equal-weight modes at +/- separation/2 along every axis's
        first coordinate direction (config 3's 16-d bimodal target)."""
        mu = jnp.zeros((2, dim), jnp.float32)
        mu = mu.at[0, 0].set(-separation / 2.0)
        mu = mu.at[1, 0].set(+separation / 2.0)
        scales = jnp.full((2, dim), scale, jnp.float32)
        logw = jnp.log(jnp.array([0.5, 0.5], jnp.float32))
        return GaussianMixture(means=mu, scales=scales, log_weights=logw)
