"""Particle resampling schemes.

Reference parity (SURVEY.md §2b row 16): BAT.jl's bridge/partition
machinery uses resampling inside its SMC-style samplers; the concrete
scheme here is systematic resampling (lowest-variance O(n) standard), plus
multinomial for testing.

TPU design: branchless and gather-based — the systematic positions are a
shifted arange; ancestor indices come from `searchsorted` on the weight
cumsum (XLA lowers this to a vectorized binary search); the particle
gather is one `jnp.take` along the particle axis. Deterministic under a
fixed key. The distributed (sharded-particle) version composes this with
psum/all_gather/ppermute in tpuflows.dist.resample (SURVEY.md §7 hard
part 2).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize_log_weights(log_w: jax.Array, axis=-1) -> jax.Array:
    return log_w - jax.scipy.special.logsumexp(log_w, axis=axis, keepdims=True)


def systematic_indices(key: jax.Array, log_w: jax.Array,
                       n_out: int | None = None) -> jax.Array:
    """Systematic resampling ancestor indices. log_w: (n,) -> (n_out,)
    int32 (n_out defaults to n; n_out != n draws a population of a
    different size from the same weighted measure — used by the
    cross-fitted bridge path switch, which resamples n particles from
    the held-out half)."""
    n = log_w.shape[0]
    m = n if n_out is None else n_out
    w = jnp.exp(normalize_log_weights(log_w))
    cdf = jnp.cumsum(w)
    cdf = cdf / cdf[-1]  # exact 1.0 endpoint despite roundoff
    u0 = jax.random.uniform(key, ())
    positions = (u0 + jnp.arange(m, dtype=jnp.float32)) / m
    idx = jnp.searchsorted(cdf, positions, side="left")
    return jnp.clip(idx, 0, n - 1).astype(jnp.int32)


def multinomial_indices(key: jax.Array, log_w: jax.Array) -> jax.Array:
    """IID categorical ancestors (higher variance; test baseline)."""
    n = log_w.shape[0]
    return jax.random.categorical(key, log_w, shape=(n,)).astype(jnp.int32)


def resample(key: jax.Array, particles: jax.Array, log_w: jax.Array,
             scheme: str = "systematic"):
    """Resample (n, d) particles to equal weights. Returns (particles, idx)."""
    if scheme == "systematic":
        idx = systematic_indices(key, log_w)
    elif scheme == "multinomial":
        idx = multinomial_indices(key, log_w)
    else:
        raise ValueError(f"unknown resampling scheme: {scheme!r}")
    return jnp.take(particles, idx, axis=0), idx
