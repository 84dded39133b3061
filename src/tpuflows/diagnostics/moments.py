"""Streaming moments and the Monte-Carlo-sigma acceptance gate.

Reference parity: the posterior-moment acceptance criterion of the north
star — "posterior moments ... must match within 3 MC-sigma"
(BASELINE.json:5); streaming mean/cov mirrors BAT.jl's sample statistics.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from tpuflows.diagnostics.ess import effective_sample_size


class MomentCheck(NamedTuple):
    passed: bool
    max_sigma_mean: float  # worst |mean error| / MC s.e.
    max_sigma_var: float  # worst |var error| / MC s.e. of the variance
    ess_min: float
    threshold: float = 3.0  # the threshold `passed` was judged against


def family_threshold(n_sigma: float, n_comparisons: int) -> float:
    """Threshold t* such that a CORRECT sampler fails the max-over-m test
    at the same rate a single comparison fails the n_sigma test:
    m * P(|Z| > t*) = P(|Z| > n_sigma) (Bonferroni). Without this, 'max
    z-score < 3' over 2*256 moments rejects a perfect sampler ~half the
    time — the max of 512 standard normals concentrates near 3."""
    from statistics import NormalDist

    nd = NormalDist()
    p_single = 2.0 * (1.0 - nd.cdf(n_sigma))
    return float(nd.inv_cdf(1.0 - p_single / n_comparisons / 2.0))


def moment_gate(
    samples,  # (n_draws, n_chains, d) or (n, d)
    true_mean,
    true_var,
    n_sigma: float = 3.0,
    ess: float | None = None,
    family_correction: bool = False,
) -> MomentCheck:
    """The 3-MC-sigma gate: standard errors use the ESS, not the raw draw
    count, so autocorrelated MCMC output is judged honestly.

    `family_correction=True` judges the max z-score against
    `family_threshold(n_sigma, 2*d)` instead of `n_sigma` — the
    family-wise reading of the BASELINE.json:5 acceptance test, required
    once d is large enough that the max of 2*d null z-scores itself
    approaches n_sigma (used by the 256-d config-5 artifact)."""
    s = jnp.asarray(samples)
    if s.ndim == 2:
        s = s[:, None, :]
    n, m, d = s.shape
    flat = s.reshape(n * m, d)
    if ess is None:
        ess_d = np.asarray(effective_sample_size(s))
        # variance errors are governed by the autocorrelation of x^2, and
        # super-efficient (antithetic) kernels can push ESS above n*m where
        # the Gaussian s.e. formula no longer applies — cap for the gate.
        ess_v = np.asarray(effective_sample_size(s * s))
    else:
        ess_d = np.full((d,), float(ess))
        ess_v = ess_d
    ess_d = np.clip(ess_d, 2.0, n * m)
    ess_v = np.clip(ess_v, 2.0, n * m)

    mean = np.asarray(jnp.mean(flat, axis=0))
    var = np.asarray(jnp.var(flat, axis=0))
    tm = np.asarray(true_mean)
    tv = np.asarray(true_var)

    se_mean = np.sqrt(tv / ess_d)
    # s.e. of the sample variance from the empirical 4th moment:
    # Var(s^2) ~= (m4 - var^2) / n_eff  (reduces to 2 var^2/n for Gaussians,
    # but stays honest for heavy-tailed targets like the funnel)
    centered = np.asarray(flat) - mean
    m4 = np.mean(centered**4, axis=0)
    se_var = np.sqrt(np.maximum(m4 - var**2, 2.0 * tv**2) / ess_v)
    sig_mean = np.abs(mean - tm) / np.maximum(se_mean, 1e-12)
    sig_var = np.abs(var - tv) / np.maximum(se_var, 1e-12)
    thr = family_threshold(n_sigma, 2 * d) if family_correction else n_sigma
    return MomentCheck(
        passed=bool((sig_mean < thr).all() and (sig_var < thr).all()),
        max_sigma_mean=float(sig_mean.max()),
        max_sigma_var=float(sig_var.max()),
        ess_min=float(ess_d.min()),
        threshold=float(thr),
    )
