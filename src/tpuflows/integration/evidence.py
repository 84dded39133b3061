"""Evidence (marginal likelihood) estimators.

Reference parity: BAT.jl's headline integration capability —
`bat_integrate` with AHMI (Adaptive Harmonic Mean Integration) and
BridgeSampling.jl backends (SURVEY.md §2b: BAT-ecosystem capabilities the
north star pulls in; SMC already provides a third, thermodynamic route via
`smc.sampler.run_smc(...).log_z`).

TPU-native design: a trained flow replaces AHMI's harmonic-mean machinery
outright — the flow IS a normalized density with cheap exact log-prob, so

  1. `log_evidence_is`: importance sampling with the flow as proposal:
     log Z = logsumexp(log p(x_i) - log q(x_i)) - log n,  x_i ~ q.
     Unbiased in Z, variance -> 0 as q -> p (the adaptive loop drives
     exactly that). Returns the weight-ESS diagnostic.
  2. `log_evidence_bridge`: Meng & Wong (1996) optimal-bridge iteration
     between q and p using both flow draws and posterior (MCMC) draws —
     robust when q only roughly matches p. This is the BridgeSampling.jl
     algorithm, reformulated as a fixed-iteration `lax.scan` (no
     data-dependent convergence loop, TPU/jit-friendly).
  3. `log_evidence_harmonic`: the classic (reciprocal) harmonic-mean
     estimator on posterior draws, with the flow as the AHMI-style
     auxiliary density h: 1/Z = E_p[h(x)/p*(x)]. Included for parity;
     prefer (1)/(2).

All estimators work in log space (logsumexp) in f32.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tpuflows.diagnostics.ess import importance_weight_ess
from tpuflows.flows.core import Bijector
from tpuflows.targets.base import std_normal_logpdf


class EvidenceResult(NamedTuple):
    log_z: jax.Array
    ess: jax.Array  # importance-weight ESS (diagnostic; n for perfect q)
    n: int


def _flow_log_q(flow: Bijector, x: jax.Array) -> jax.Array:
    z, ladj = flow.forward_and_ladj(x)
    return std_normal_logpdf(z) + ladj


def log_evidence_is(
    key: jax.Array,
    log_density: Callable,
    flow: Bijector,
    dim: int,
    n: int = 8192,
) -> EvidenceResult:
    """Flow-importance-sampling evidence: x ~ q = flow.inverse # N(0, I)."""
    z = jax.random.normal(key, (n, dim), jnp.float32)
    x, ladj = flow.inverse_and_ladj(z)
    log_q = std_normal_logpdf(z) - ladj  # ladj_fwd(x) = -ladj_inv(z)
    log_w = log_density(x) - log_q
    log_z = jax.scipy.special.logsumexp(log_w) - jnp.log(float(n))
    return EvidenceResult(log_z=log_z, ess=importance_weight_ess(log_w), n=n)


def log_evidence_harmonic(
    log_density: Callable,
    flow: Bijector,
    posterior_samples: jax.Array,
) -> jax.Array:
    """AHMI-style harmonic mean with the flow as auxiliary density h:
    1/Z = E_{x~p}[ h(x) / p*(x) ]  (p* unnormalized). Finite-variance when
    h has lighter tails than p — the flow fitted to the posterior
    approximately satisfies this, playing the role of AHMI's adaptive
    hyper-rectangle density."""
    x = posterior_samples
    log_h = _flow_log_q(flow, x)
    log_inv_z = (
        jax.scipy.special.logsumexp(log_h - log_density(x))
        - jnp.log(float(x.shape[0]))
    )
    return -log_inv_z


def log_evidence_bridge(
    key: jax.Array,
    log_density: Callable,
    flow: Bijector,
    posterior_samples: jax.Array,
    n_proposal: int = 8192,
    n_iter: int = 32,
) -> EvidenceResult:
    """Meng-Wong optimal bridge sampling between the flow q and target p.

    Iteration (in log space, r = log Z estimate):
      given draws x1..xN1 ~ p (MCMC) and y1..yN2 ~ q (flow),
      l1_i = log p*(x_i) - log q(x_i),  l2_j = log p*(y_j) - log q(y_j)
      r <- logmeanexp_j[ l2_j - softplus-mix ] ... the standard fixed-point
      r_{t+1} = log( mean_j w(y_j) ) - log( mean_i 1/w'(x_i) ) with the
      optimal bridge h propto p*q / (s1 p* + s2 q e^r).
    Runs a fixed n_iter `lax.scan` (converges in a handful of steps)."""
    n1 = posterior_samples.shape[0]
    n2 = n_proposal
    dim = posterior_samples.shape[-1]
    s1 = n1 / (n1 + n2)
    s2 = n2 / (n1 + n2)

    z = jax.random.normal(key, (n2, dim), jnp.float32)
    x_q, ladj = flow.inverse_and_ladj(z)
    # l = log p*(x) - log q(x) at both sample sets
    l1 = log_density(posterior_samples) - _flow_log_q(flow, posterior_samples)
    l2 = log_density(x_q) - (std_normal_logpdf(z) - ladj)

    def body(r, _):
        # numerator: E_q[ p* / (s1 p* + s2 q Z) ] in log space
        num = jax.scipy.special.logsumexp(
            l2 - jnp.logaddexp(jnp.log(s1) + l2, jnp.log(s2) + r)
        ) - jnp.log(float(n2))
        den = jax.scipy.special.logsumexp(
            -jnp.logaddexp(jnp.log(s1) + l1, jnp.log(s2) + r)
        ) - jnp.log(float(n1))
        return num - den, None

    r0 = jax.scipy.special.logsumexp(l2) - jnp.log(float(n2))  # IS warm start
    log_z, _ = jax.lax.scan(body, r0, None, length=n_iter)
    # ESS of the q-side weights as the quality diagnostic
    return EvidenceResult(log_z=log_z, ess=importance_weight_ess(l2), n=n2)
