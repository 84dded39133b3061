"""Posterior = likelihood ⊗ prior, with constrained→unconstrained transforms.

Reference parity (SURVEY.md §1 "Target densities" layer, §2b row 13): the
BAT ecosystem builds posteriors as `PosteriorMeasure(likelihood, prior)` and
samples them after a `DistributionTransform` to unbounded space (BAT's
`bat_transform(PriorToGaussian, ...)`); priors are `Distributions.jl`
product distributions over named, possibly bounded parameters.

TPU-first design: a prior over d scalar marginals is encoded as three
static per-dim arrays (integer `kind` code + two parameter lanes `a`, `b`).
Every operation — constrain, unconstrain, log-Jacobian, prior log-pdf,
prior sampling — is a branchless elementwise `jnp.where` select over the
kind code on `(..., d)` blocks, so it fuses into the surrounding leapfrog /
flow kernels and never breaks XLA tiling (no per-dim Python loops, no
ragged control flow).

Unconstrained parameterization (Stan-style):
  kind NORMAL      θ = u                   (support ℝ;  θ ~ N(a, b))
  kind LOGNORMAL   θ = exp(u)              (support ℝ+; log θ ~ N(a, b))
  kind EXPONENTIAL θ = exp(u)              (support ℝ+; rate a)
  kind HALFNORMAL  θ = exp(u)              (support ℝ+; scale a)
  kind UNIFORM     θ = a + (b−a) σ(u)      (support (a,b))
  kind BETA        θ = σ(u)                (support (0,1); Beta(a, b))
with the exact log|dθ/du| accumulated into the unconstrained log density.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from .base import Target

_LOG2PI = float(np.log(2.0 * np.pi))

NORMAL, LOGNORMAL, EXPONENTIAL, HALFNORMAL, UNIFORM, BETA = range(6)
_POSITIVE = (LOGNORMAL, EXPONENTIAL, HALFNORMAL)
_INTERVAL = (UNIFORM, BETA)


class Marginal(NamedTuple):
    """One scalar prior marginal: integer kind code + two parameter lanes."""
    kind: int
    a: float
    b: float = 0.0


def Normal(mu: float = 0.0, sigma: float = 1.0) -> Marginal:
    return Marginal(NORMAL, float(mu), float(sigma))


def LogNormal(mu: float = 0.0, sigma: float = 1.0) -> Marginal:
    return Marginal(LOGNORMAL, float(mu), float(sigma))


def Exponential(rate: float = 1.0) -> Marginal:
    return Marginal(EXPONENTIAL, float(rate))


def HalfNormal(sigma: float = 1.0) -> Marginal:
    return Marginal(HALFNORMAL, float(sigma))


def Uniform(lo: float = 0.0, hi: float = 1.0) -> Marginal:
    if not hi > lo:
        raise ValueError(f"Uniform needs hi > lo, got ({lo}, {hi})")
    return Marginal(UNIFORM, float(lo), float(hi))


def Beta(alpha: float, beta: float) -> Marginal:
    return Marginal(BETA, float(alpha), float(beta))


def _log_sigmoid(u):
    # numerically stable log σ(u); log(1-σ(u)) = _log_sigmoid(-u)
    return -jnp.logaddexp(0.0, -u)


class IndependentPrior:
    """Product prior over d scalar marginals (branchless vectorized form)."""

    def __init__(self, marginals: Sequence[Marginal]):
        self.marginals = tuple(marginals)
        self.dim = len(self.marginals)
        self._kind = jnp.asarray([m.kind for m in self.marginals], jnp.int32)
        self._a = jnp.asarray([m.a for m in self.marginals], jnp.float32)
        self._b = jnp.asarray([m.b for m in self.marginals], jnp.float32)

    # ---- constrained <-> unconstrained ----------------------------------
    def constrain(self, u: jax.Array) -> jax.Array:
        """u (..., d) unconstrained -> θ (..., d) in the prior's support."""
        k, a, b = self._kind, self._a, self._b
        pos = jnp.exp(u)
        s = jax.nn.sigmoid(u)
        theta = u
        theta = jnp.where(jnp.isin(k, jnp.asarray(_POSITIVE)), pos, theta)
        theta = jnp.where(k == UNIFORM, a + (b - a) * s, theta)
        theta = jnp.where(k == BETA, s, theta)
        return theta

    def unconstrain(self, theta: jax.Array) -> jax.Array:
        """θ (..., d) -> u (..., d); inverse of `constrain`."""
        k, a, b = self._kind, self._a, self._b
        # safe args so every branch is finite before the select
        safe_pos = jnp.where(jnp.isin(k, jnp.asarray(_POSITIVE)),
                             jnp.maximum(theta, 1e-30), 1.0)
        t01_u = jnp.clip((theta - a) / jnp.where(k == UNIFORM, b - a, 1.0),
                         1e-7, 1 - 1e-7)
        t01_b = jnp.clip(theta, 1e-7, 1 - 1e-7)
        u = theta
        u = jnp.where(jnp.isin(k, jnp.asarray(_POSITIVE)),
                      jnp.log(safe_pos), u)
        u = jnp.where(k == UNIFORM, jnp.log(t01_u) - jnp.log1p(-t01_u), u)
        u = jnp.where(k == BETA, jnp.log(t01_b) - jnp.log1p(-t01_b), u)
        return u

    def constrain_ladj(self, u: jax.Array) -> jax.Array:
        """log|dθ/du| summed over dims, shape (...)."""
        k = self._kind
        ladj = jnp.zeros_like(u)
        ladj = jnp.where(jnp.isin(k, jnp.asarray(_POSITIVE)), u, ladj)
        sig_ladj = _log_sigmoid(u) + _log_sigmoid(-u)
        ladj = jnp.where(k == UNIFORM,
                         jnp.log(jnp.maximum(self._b - self._a, 1e-30))
                         + sig_ladj, ladj)
        ladj = jnp.where(k == BETA, sig_ladj, ladj)
        return jnp.sum(ladj, axis=-1)

    # ---- prior log-pdf (constrained space) -------------------------------
    def log_pdf(self, theta: jax.Array) -> jax.Array:
        """Σ_d log p_d(θ_d), shape (...). θ must lie in the support."""
        k, a, b = self._kind, self._a, self._b
        positive = jnp.isin(k, jnp.asarray(_POSITIVE))
        interval = jnp.isin(k, jnp.asarray(_INTERVAL))
        # Every branch below is evaluated for EVERY dim before the select,
        # so each must stay finite with finite gradients even where its
        # parameters are meaningless (a=0 scale lanes of other kinds) —
        # otherwise 0*inf = NaN leaks through the `where` VJP. Sanitize the
        # per-branch inputs, never just the selected output.
        safe_pos = jnp.where(positive, jnp.maximum(theta, 1e-30), 1.0)
        logt = jnp.log(safe_pos)
        t01 = jnp.where(interval, jnp.clip(theta, 1e-7, 1 - 1e-7), 0.5)
        sb = jnp.where((k == NORMAL) | (k == LOGNORMAL),
                       jnp.maximum(b, 1e-30), 1.0)
        rate = jnp.where(k == EXPONENTIAL, jnp.maximum(a, 1e-30), 1.0)
        hscale = jnp.where(k == HALFNORMAL, jnp.maximum(a, 1e-30), 1.0)
        th_n = jnp.where(k == NORMAL, theta, 0.0)
        th_h = jnp.where(k == HALFNORMAL, theta, 0.0)

        lp_normal = (-0.5 * ((th_n - a) / sb) ** 2 - jnp.log(sb)
                     - 0.5 * _LOG2PI)
        lp_lognorm = (-0.5 * ((logt - a) / sb) ** 2 - jnp.log(sb)
                      - 0.5 * _LOG2PI - logt)
        lp_expon = jnp.log(rate) - rate * safe_pos
        lp_halfn = (jnp.log(2.0) - 0.5 * (th_h / hscale) ** 2
                    - jnp.log(hscale) - 0.5 * _LOG2PI)
        lp_unif = -jnp.log(jnp.maximum(b - a, 1e-30))
        from jax.scipy.special import betaln
        lp_beta = ((a - 1) * jnp.log(t01) + (b - 1) * jnp.log1p(-t01)
                   - betaln(jnp.maximum(a, 1e-6), jnp.maximum(b, 1e-6)))

        lp = jnp.where(k == NORMAL, lp_normal, 0.0)
        lp = jnp.where(k == LOGNORMAL, lp_lognorm, lp)
        lp = jnp.where(k == EXPONENTIAL, lp_expon, lp)
        lp = jnp.where(k == HALFNORMAL, lp_halfn, lp)
        lp = jnp.where(k == UNIFORM, lp_unif, lp)
        lp = jnp.where(k == BETA, lp_beta, lp)

        in_support = jnp.where(positive, theta > 0, True)
        in_support = jnp.where(k == UNIFORM,
                               (theta > a) & (theta < b), in_support)
        in_support = jnp.where(k == BETA,
                               (theta > 0) & (theta < 1), in_support)
        lp = jnp.where(in_support, lp, -jnp.inf)
        return jnp.sum(lp, axis=-1)

    # ---- exact prior sampling (constrained space) ------------------------
    def sample(self, key: jax.Array, n: int) -> jax.Array:
        k, a, b = self._kind, self._a, self._b
        kn, ku = jax.random.split(key)
        z = jax.random.normal(kn, (n, self.dim), jnp.float32)
        v = jax.random.uniform(ku, (n, self.dim), jnp.float32,
                               minval=1e-7, maxval=1 - 1e-7)
        th = a + b * z                                   # NORMAL
        th = jnp.where(k == LOGNORMAL, jnp.exp(a + b * z), th)
        th = jnp.where(k == EXPONENTIAL,
                       -jnp.log1p(-v) / jnp.maximum(a, 1e-30), th)
        th = jnp.where(k == HALFNORMAL, jnp.abs(a * z), th)
        th = jnp.where(k == UNIFORM, a + (b - a) * v, th)
        if any(m.kind == BETA for m in self.marginals):
            g1 = jax.random.gamma(kn, jnp.maximum(a, 1e-6), (n, self.dim))
            g2 = jax.random.gamma(ku, jnp.maximum(b, 1e-6), (n, self.dim))
            th = jnp.where(k == BETA, g1 / (g1 + g2), th)
        return th


class Posterior(Target):
    """Unnormalized posterior over UNCONSTRAINED variates.

    `log_density(u) = loglik(constrain(u)) + logprior(constrain(u)) + ladj(u)`
    — the standard change of variables, so every sampler/flow in the engine
    (which assume support = ℝ^d) applies unchanged; map draws back with
    `constrain`. Reference analog: BAT `PosteriorMeasure` sampled through
    `DistributionTransform` (SURVEY.md §1 row "Target densities").
    """

    def __init__(self, log_likelihood: Callable[[jax.Array], jax.Array],
                 prior: IndependentPrior):
        self.prior = prior
        self.log_likelihood = log_likelihood
        self.dim = prior.dim

    def log_density(self, u: jax.Array) -> jax.Array:
        theta = self.prior.constrain(u)
        return (self.log_likelihood(theta) + self.prior.log_pdf(theta)
                + self.prior.constrain_ladj(u))

    def constrain(self, u: jax.Array) -> jax.Array:
        return self.prior.constrain(u)

    def unconstrain(self, theta: jax.Array) -> jax.Array:
        return self.prior.unconstrain(theta)

    def sample_prior(self, key: jax.Array, n: int) -> jax.Array:
        """Exact prior draws in UNCONSTRAINED space (sampler init)."""
        return self.prior.unconstrain(self.prior.sample(key, n))


class ModeResult(NamedTuple):
    mode: jax.Array        # (d,) constrained-space mode (MAP)
    mode_u: jax.Array      # (d,) unconstrained-space argmax
    log_density: jax.Array # scalar unconstrained-space log density at mode_u
    trace: jax.Array       # (nsteps,) objective history


def find_mode(target, x0: jax.Array, nsteps: int = 500,
              learning_rate: float = 0.05, n_starts: int = 8,
              key: jax.Array | None = None) -> ModeResult:
    """MAP / mode finding (reference analog: BAT `bat_findmode`).

    Multi-start Adam ascent on `target.log_density`, all starts batched in
    one `(n_starts, d)` block (vmap-free — broadcasting keeps the per-step
    work a single fused XLA computation), `lax.scan` over steps; returns the
    best start. For a `Posterior`, the mode is reported in both spaces.
    """
    import optax

    logp = target.log_density if hasattr(target, "log_density") else target
    x0 = jnp.atleast_1d(jnp.asarray(x0, jnp.float32))
    if key is None:
        key = jax.random.key(0)
    starts = x0[None, :] + 0.5 * jax.random.normal(
        key, (n_starts, x0.shape[-1]), jnp.float32)
    starts = starts.at[0].set(x0)

    opt = optax.adam(learning_rate)

    def neg(x):
        return -jnp.sum(logp(x))

    @jax.jit
    def run(x):
        state = opt.init(x)

        def body(carry, _):
            x, state = carry
            g = jax.grad(neg)(x)
            updates, state = opt.update(g, state, x)
            x = optax.apply_updates(x, updates)
            return (x, state), -neg(x) / x.shape[0]

        (x, _), hist = jax.lax.scan(body, (x, state), None, length=nsteps)
        return x, hist

    x, hist = run(starts)
    lps = logp(x)
    best = jnp.argmax(lps)
    mode_u = x[best]
    mode = (target.constrain(mode_u)
            if hasattr(target, "constrain") else mode_u)
    return ModeResult(mode=mode, mode_u=mode_u, log_density=lps[best],
                      trace=hist)
