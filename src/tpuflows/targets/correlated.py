"""Correlated multivariate Gaussian target (config 2, BASELINE.json:8)."""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.targets.base import Target
from tpuflows.util.pytree import pytree_dataclass


@pytree_dataclass
class CorrelatedGaussian(Target):
    """N(loc, Sigma); stores the Cholesky factor for O(d^2) log-density."""

    loc: jax.Array  # (d,)
    chol: jax.Array  # (d, d) lower triangular, Sigma = chol @ chol.T

    @property
    def dim(self):
        return self.loc.shape[-1]

    def log_density(self, x):
        d = self.loc.shape[-1]
        batch_shape = x.shape[:-1]
        diff = (x - self.loc).reshape(-1, d)
        # one triangular solve over the whole batch: L Y = diff^T
        y = jax.scipy.linalg.solve_triangular(self.chol, diff.T, lower=True)
        quad = jnp.sum(y * y, axis=0).reshape(batch_shape)
        logdet = jnp.sum(jnp.log(jnp.diagonal(self.chol)))
        return -0.5 * quad - logdet - 0.5 * d * jnp.log(2.0 * jnp.pi)

    def sample(self, key, n):
        eps = jax.random.normal(key, (n, self.dim), jnp.float32)
        return self.loc + eps @ self.chol.T

    def mean(self):
        return self.loc

    def cov(self):
        return self.chol @ self.chol.T

    @staticmethod
    def ar1(dim: int, rho: float = 0.7, scale: float = 1.0) -> "CorrelatedGaussian":
        """AR(1)-correlated Gaussian: Sigma_ij = scale^2 * rho^|i-j|.

        The standard strongly-correlated test target (config 2's 8-d case).
        """
        import numpy as np

        idx = np.arange(dim)
        cov = (scale**2) * (rho ** np.abs(idx[:, None] - idx[None, :]))
        chol = np.linalg.cholesky(cov.astype(np.float64))
        return CorrelatedGaussian(
            loc=jnp.zeros((dim,), jnp.float32),
            chol=jnp.asarray(chol, jnp.float32),
        )
