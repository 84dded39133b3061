"""Input standardization and affine coupling.

Reference parity (SURVEY.md §2a row 4): AdaptiveFlows.jl's scale-shift
("whitening") module fitted from sample mean/std, analytic ladj = sum
log|scale|; plus the full affine coupling layer required by the north star
(BASELINE.json:5) and exercised end-to-end by config 1 (BASELINE.json:7).

TPU design note: couplings use the dense-mask formulation — the conditioner
sees `x * mask` (full width d) and emits per-dim params for all d dims, with
the transform applied through a select. No gathers/scatters, fully static
shapes, and the conditioner matmul is one dense (batch, d) x (d, h) MXU op.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.flows.core import Bijector
from tpuflows.flows.nets import MLP
from tpuflows.util.pytree import pytree_dataclass, static_field
from tpuflows.util.shapes import mask_array


@pytree_dataclass
class Standardize(Bijector):
    """z = (x - loc) / scale with scale = exp(log_scale); fitted whitening.

    forward ladj = -sum(log_scale) (analytic, constant in x).
    """

    loc: jax.Array  # (d,)
    log_scale: jax.Array  # (d,)

    def forward_and_ladj(self, x):
        z = (x - self.loc) * jnp.exp(-self.log_scale)
        ladj = jnp.broadcast_to(-jnp.sum(self.log_scale), x.shape[:-1])
        return z, ladj.astype(x.dtype)

    def inverse_and_ladj(self, z):
        x = z * jnp.exp(self.log_scale) + self.loc
        ladj = jnp.broadcast_to(jnp.sum(self.log_scale), z.shape[:-1])
        return x, ladj.astype(z.dtype)

    @staticmethod
    def from_samples(samples: jax.Array, eps: float = 1e-6) -> "Standardize":
        """Fit from an (N, d) sample matrix (reference: fit from mean/std)."""
        loc = jnp.mean(samples, axis=0)
        std = jnp.std(samples, axis=0)
        return Standardize(loc=loc, log_scale=jnp.log(std + eps))

    @staticmethod
    def identity(dim: int) -> "Standardize":
        return Standardize(
            loc=jnp.zeros((dim,), jnp.float32),
            log_scale=jnp.zeros((dim,), jnp.float32),
        )


@pytree_dataclass
class Whiten(Bijector):
    """Full-covariance whitening: z = L^-1 (x - loc), Sigma = L L^T.

    The reference's standardization is diagonal; BAT-style whitening of
    correlated posteriors (SURVEY.md §2a row 4 "scale-shift/whitening")
    needs the full Cholesky so downstream splines see an isotropic cloud.
    ladj is constant in x: forward ladj = -sum(log diag L).

    TPU note: triangular solves don't tile onto the MXU; we store L^-1
    explicitly (computed once at fit time, d <= 256 engine-wide) so both
    directions are dense (batch, d) x (d, d) matmuls.
    """

    loc: jax.Array  # (d,)
    inv_chol: jax.Array  # (d, d) lower triangular L^-1
    chol: jax.Array  # (d, d) lower triangular L

    def forward_and_ladj(self, x):
        z = (x - self.loc) @ self.inv_chol.T
        ladj = jnp.sum(jnp.log(jnp.diagonal(self.inv_chol)))
        return z, jnp.broadcast_to(ladj, x.shape[:-1]).astype(x.dtype)

    def inverse_and_ladj(self, z):
        x = z @ self.chol.T + self.loc
        ladj = jnp.sum(jnp.log(jnp.diagonal(self.chol)))
        return x, jnp.broadcast_to(ladj, z.shape[:-1]).astype(z.dtype)

    @staticmethod
    def from_samples(samples: jax.Array, jitter: float = 1e-5) -> "Whiten":
        """Fit from an (N, d) sample matrix via regularized covariance."""
        loc = jnp.mean(samples, axis=0)
        xc = samples - loc
        cov = xc.T @ xc / samples.shape[0]
        cov = cov + jitter * jnp.eye(cov.shape[0], dtype=cov.dtype)
        chol = jnp.linalg.cholesky(cov)
        inv_chol = jax.scipy.linalg.solve_triangular(
            chol, jnp.eye(chol.shape[0], dtype=chol.dtype), lower=True
        )
        return Whiten(loc=loc, inv_chol=inv_chol, chol=chol)


@pytree_dataclass
class AffineCoupling(Bijector):
    """RealNVP-style affine coupling block.

    mask[i] == 1: pass-through dim (conditioner input); 0: transformed dim.
    Conditioner maps x*mask -> (shift, raw_log_scale) each of width d;
    log-scale is soft-clamped to (-clamp, clamp) via tanh for stability.

    forward (data->base):  z_t = x_t * exp(s) + t  on transformed dims.
    """

    mask: tuple = static_field()
    net: MLP = None
    clamp: float = static_field(default=4.0)

    def _params(self, masked_input):
        h = self.net(masked_input)
        shift, raw = jnp.split(h, 2, axis=-1)
        s = self.clamp * jnp.tanh(raw / self.clamp)
        return shift, s

    def forward_and_ladj(self, x):
        b = mask_array(self.mask, x.dtype)
        shift, s = self._params(x * b)
        z = b * x + (1.0 - b) * (x * jnp.exp(s) + shift)
        ladj = jnp.sum((1.0 - b) * s, axis=-1)
        return z, ladj

    def inverse_and_ladj(self, z):
        b = mask_array(self.mask, z.dtype)
        shift, s = self._params(z * b)  # pass dims are unchanged: z*b == x*b
        x = b * z + (1.0 - b) * ((z - shift) * jnp.exp(-s))
        ladj = -jnp.sum((1.0 - b) * s, axis=-1)
        return x, ladj

    @staticmethod
    def init(
        key: jax.Array,
        mask: tuple,
        hidden: tuple = (64, 64),
        activation: str = "silu",
        clamp: float = 4.0,
    ) -> "AffineCoupling":
        d = len(mask)
        net = MLP.init(key, (d, *hidden, 2 * d), activation=activation)
        return AffineCoupling(mask=tuple(mask), net=net, clamp=clamp)
