"""Hierarchical Gaussian posterior (config 5: 256-d, BASELINE.json:11).

Model (centered parameterization — deliberately funnel-like geometry):
    mu      ~ N(0, prior_mu_scale^2)
    log_tau ~ N(0, 1)
    theta_i ~ N(mu, tau^2)            i = 1..J,  tau = exp(log_tau)
    y_i     ~ N(theta_i, noise^2)     y fixed synthetic data

Parameter vector x = [mu, log_tau, theta_1..theta_J], dim = J + 2.

Ground truth: conditional on tau the model is jointly Gaussian, so exact
posterior moments follow from 1-D quadrature over log_tau (computed once in
float64 numpy at construction). This gives the 3-MC-sigma acceptance gate
(BASELINE.json:5) an *exact* reference even in 256-d.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from tpuflows.targets.base import Target
from tpuflows.util.pytree import pytree_dataclass, static_field

_LOG2PI = float(np.log(2.0 * np.pi))


def _make_data(J: int, seed: int, noise: float, true_tau: float, true_mu: float):
    rng = np.random.RandomState(seed)
    theta = true_mu + true_tau * rng.randn(J)
    y = theta + noise * rng.randn(J)
    return y.astype(np.float64)


def _exact_moments(y, noise, prior_mu_scale, n_grid=801, lo=-6.0, hi=4.0):
    """Posterior mean/cov of [mu, log_tau, theta] by quadrature over log_tau."""
    J = y.shape[0]
    s2 = noise**2
    pm2 = prior_mu_scale**2
    lts = np.linspace(lo, hi, n_grid)
    logw = np.empty(n_grid)
    means = np.empty((n_grid, J + 2))
    # per-grid-point covariance blocks (exchangeable structure):
    v_mu_g = np.empty(n_grid)
    a_g = np.empty(n_grid)
    c_g = np.empty(n_grid)
    for k, lt in enumerate(lts):
        t2 = np.exp(2.0 * lt)
        w2 = t2 + s2  # marginal var of y_i | mu
        # mu | y, tau
        v_mu = 1.0 / (1.0 / pm2 + J / w2)
        m_mu = v_mu * np.sum(y) / w2
        # theta_i | mu, y_i:  c = (1/t2 + 1/s2)^-1, theta = a*mu + b*y_i + eps
        c = 1.0 / (1.0 / t2 + 1.0 / s2)
        a = c / t2
        b = c / s2
        # evidence log p(y | tau): y ~ N(0, w2 I + pm2 11^T) via Sherman-Morrison
        quad = (np.sum(y**2) - pm2 * np.sum(y) ** 2 / (w2 + pm2 * J)) / w2
        logdet = J * np.log(w2) + np.log(1.0 + pm2 * J / w2)
        logw[k] = -0.5 * (quad + logdet + J * _LOG2PI) - 0.5 * lt**2
        means[k, 0] = m_mu
        means[k, 1] = lt
        means[k, 2:] = a * m_mu + b * y
        v_mu_g[k], a_g[k], c_g[k] = v_mu, a, c
    # quadrature log-evidence BEFORE the max-shift below destroys the
    # absolute scale: log p(y) = log ∫ exp(logw(lt)) dlt − ½log(2π) —
    # logw(lt) = log N(y; 0, w2·I + pm²·11ᵀ) + (−½lt²), i.e. mu and theta
    # are marginalized analytically (Sherman-Morrison) and the log_tau
    # prior's −½log(2π) constant is added back here. Trapezoid on the
    # uniform grid; the integrand decays as exp(−lt²/2)·p(y|lt) at both
    # ends, so truncation error is negligible relative to the grid
    # discretization (validated against 2-D brute-force quadrature in
    # tests/test_targets.py).
    lw_max = logw.max()
    trap = np.exp(logw - lw_max)
    trap[0] *= 0.5
    trap[-1] *= 0.5
    log_evidence = (lw_max + np.log(trap.sum() * (lts[1] - lts[0]))
                    - 0.5 * _LOG2PI)

    logw -= logw.max()
    w = np.exp(logw)
    w /= w.sum()

    mean = w @ means
    d = J + 2
    cov = np.zeros((d, d))
    for k in range(n_grid):
        ck = np.zeros((d, d))
        ck[0, 0] = v_mu_g[k]
        ck[0, 2:] = a_g[k] * v_mu_g[k]
        ck[2:, 0] = a_g[k] * v_mu_g[k]
        ck[2:, 2:] = (a_g[k] ** 2) * v_mu_g[k]
        ck[2:, 2:] += np.eye(J) * c_g[k]
        dm = means[k] - mean
        cov += w[k] * (ck + np.outer(dm, dm))
    return mean, cov, log_evidence, (lts, w, v_mu_g, a_g, c_g, means)


@pytree_dataclass
class HierarchicalGaussian(Target):
    y: jax.Array  # (J,) observed data
    noise: float = static_field(default=2.0)
    prior_mu_scale: float = static_field(default=5.0)

    @property
    def dim(self):
        return self.y.shape[-1] + 2

    def log_density(self, x):
        mu = x[..., 0]
        lt = x[..., 1]
        theta = x[..., 2:]
        J = self.y.shape[-1]
        inv_t2 = jnp.exp(-2.0 * lt)  # 1 / tau^2
        lp_mu = -0.5 * (mu / self.prior_mu_scale) ** 2 - jnp.log(
            self.prior_mu_scale
        ) - 0.5 * _LOG2PI
        lp_lt = -0.5 * lt * lt - 0.5 * _LOG2PI
        dtheta = theta - mu[..., None]
        lp_theta = (
            -0.5 * jnp.sum(dtheta * dtheta, axis=-1) * inv_t2
            - J * lt
            - 0.5 * J * _LOG2PI
        )
        dy = self.y - theta
        lp_y = (
            -0.5 * jnp.sum(dy * dy, axis=-1) / (self.noise**2)
            - J * jnp.log(self.noise)
            - 0.5 * J * _LOG2PI
        )
        return lp_mu + lp_lt + lp_theta + lp_y

    @staticmethod
    def standard(
        dim: int = 256,
        seed: int = 7,
        noise: float = 2.0,
        prior_mu_scale: float = 5.0,
        true_tau: float = 1.5,
        true_mu: float = 1.0,
    ) -> "HierarchicalGaussian":
        J = dim - 2
        y = _make_data(J, seed, noise, true_tau, true_mu)
        return HierarchicalGaussian(
            y=jnp.asarray(y, jnp.float32),
            noise=noise,
            prior_mu_scale=prior_mu_scale,
        )

    # -- exact ground truth (float64 numpy, computed lazily & cached) ------
    def _truth(self):
        if not hasattr(self, "_truth_cache"):
            y = np.asarray(self.y, np.float64)
            mean, cov, log_ev, aux = _exact_moments(
                y, self.noise, self.prior_mu_scale)
            object.__setattr__(self, "_truth_cache", (mean, cov, log_ev, aux))
        return self._truth_cache

    def mean(self):
        return jnp.asarray(self._truth()[0], jnp.float32)

    def cov(self):
        return jnp.asarray(self._truth()[1], jnp.float32)

    def log_evidence(self) -> float:
        """Quadrature-exact log p(y) = log ∫ exp(log_density(x)) dx — the
        ground truth for SMC/bridge logZ estimates (log_density includes
        every normalizing constant, so its integral IS the evidence).
        Float64, same 1-D log_tau grid as the exact moments."""
        return float(self._truth()[2])

    def sample_prior(self, key, n):
        """Draws from the model PRIOR p(mu, log_tau, theta) — no data, no
        posterior oracle. Used to pretrain SMC bridge flows (the validated
        config-5 recipe): the prior shares the posterior's funnel-like
        tau-theta geometry, so a leading-mask affine flow fitted to it is a
        good mutation preconditioner from stage 0."""
        k1, k2, k3 = jax.random.split(key, 3)
        J = self.y.shape[-1]
        mu = self.prior_mu_scale * jax.random.normal(k1, (n, 1))
        lt = jax.random.normal(k2, (n, 1))
        theta = mu + jnp.exp(lt) * jax.random.normal(k3, (n, J))
        return jnp.concatenate([mu, lt, theta], axis=-1)

    def sample(self, key, n):
        """Exact posterior sampling: grid-categorical over log_tau, then the
        conditional Gaussian (used only for tests / flow pre-training)."""
        mean, cov, _, (lts, w, v_mu_g, a_g, c_g, means) = self._truth()
        kk, km, kt, ke = jax.random.split(key, 4)
        idx = jax.random.categorical(
            kk, jnp.log(jnp.asarray(w, jnp.float32) + 1e-30), shape=(n,)
        )
        lts_j = jnp.asarray(lts, jnp.float32)[idx]
        v_mu = jnp.asarray(v_mu_g, jnp.float32)[idx]
        a = jnp.asarray(a_g, jnp.float32)[idx]
        c = jnp.asarray(c_g, jnp.float32)[idx]
        m = jnp.asarray(means, jnp.float32)[idx]  # (n, d)
        mu = m[:, 0] + jnp.sqrt(v_mu) * jax.random.normal(km, (n,))
        J = self.y.shape[-1]
        eps = jax.random.normal(ke, (n, J))
        theta = m[:, 2:] + a[:, None] * (mu - m[:, 0])[:, None] + jnp.sqrt(c)[
            :, None
        ] * eps
        return jnp.concatenate([mu[:, None], lts_j[:, None], theta], axis=-1)
