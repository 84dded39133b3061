"""Effective sample size.

Reference parity (SURVEY.md §2b row 18): BAT.jl's `bat_eff_sample_size` —
autocorrelation-based ESS (Geyer initial monotone sequence, cross-chain
pooled as in Vehtari et al. 2021 / Stan) and importance-weight ESS for
SMC/IS (used by the annealing schedule and the adaptive loop's stopping
criterion, BASELINE.json:9).

TPU design: autocorrelations via real FFT over the draw axis — one batched
O(n log n) kernel for all (chain, dim) series at once; the Geyer truncation
is branchless (masked cumulative scans), so the whole estimator jits.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def _autocovariance(x: jax.Array) -> jax.Array:
    """Biased autocovariance per series. x: (n, ...) -> (n, ...)."""
    n = x.shape[0]
    xc = x - jnp.mean(x, axis=0, keepdims=True)
    nfft = 1 << (2 * n - 1).bit_length()
    f = jnp.fft.rfft(xc, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:n]
    return acov / n


def effective_sample_size(samples: jax.Array) -> jax.Array:
    """Cross-chain ESS (Stan-style). samples: (n_draws, n_chains, d) -> (d,).

    Uses the multi-chain variance decomposition (W, B) and Geyer's initial
    monotone positive sequence on the pooled autocorrelation.
    """
    n, m, d = samples.shape
    acov = _autocovariance(samples)  # (n, m, d)
    chain_var = acov[0] * n / (n - 1.0)  # (m, d) per-chain variances
    w = jnp.mean(chain_var, axis=0)  # within-chain variance (d,)
    mean_per_chain = jnp.mean(samples, axis=0)  # (m, d)
    if m > 1:
        b_over_n = jnp.var(mean_per_chain, axis=0, ddof=1)  # B/n
    else:
        b_over_n = jnp.zeros_like(w)
    var_plus = w * (n - 1.0) / n + b_over_n  # marginal posterior var est

    rho = 1.0 - (w - jnp.mean(acov, axis=1)) / var_plus  # (n, d)

    # Geyer: sums of adjacent pairs rho[2k] + rho[2k+1], truncate at first
    # negative pair, enforce monotone non-increase — all branchless.
    n_pairs = n // 2
    pair = rho[0 : 2 * n_pairs : 2] + rho[1 : 2 * n_pairs : 2]  # (n_pairs, d)
    pos = pair > 0.0
    all_pos_so_far = jnp.cumprod(pos.astype(jnp.float32), axis=0)
    pair = pair * all_pos_so_far
    # initial monotone sequence: running minimum
    pair = jax.lax.associative_scan(jnp.minimum, pair, axis=0)
    pair = jnp.maximum(pair, 0.0)
    # tau = -1 + 2 * sum of positive monotone pairs ( = 2*sum - rho_0 - ... )
    tau = -1.0 + 2.0 * jnp.sum(pair, axis=0)
    tau = jnp.maximum(tau, 1.0 / jnp.log10(jnp.asarray(n * m, jnp.float32) + 10.0))
    return (n * m) / tau


def importance_weight_ess(log_weights: jax.Array, axis=None) -> jax.Array:
    """Kish ESS of (log) importance weights: (sum w)^2 / sum w^2."""
    lw = log_weights - jnp.max(log_weights, axis=axis, keepdims=axis is not None)
    w = jnp.exp(lw)
    s1 = jnp.sum(w, axis=axis)
    s2 = jnp.sum(w * w, axis=axis)
    return s1 * s1 / s2
