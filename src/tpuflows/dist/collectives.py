"""Axis-optional collective helpers.

One implementation serves single-device and sharded execution: every
helper takes `axis_name=None` (local math) or a mesh axis (inside
shard_map, XLA collectives over ICI/DCN — the BASELINE.json:5 psum /
all-gather requirement). Used by smc/sampler.py, flows/train.py and
mcmc/sample.py so the ALGORITHM is identical at any shard count
(SURVEY.md §7 hard part 5).
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp


def psum(x, axis_name: Optional[str]):
    return x if axis_name is None else jax.lax.psum(x, axis_name)


def pmean(x, axis_name: Optional[str]):
    return x if axis_name is None else jax.lax.pmean(x, axis_name)


def pmax(x, axis_name: Optional[str]):
    return x if axis_name is None else jax.lax.pmax(x, axis_name)


def axis_size(axis_name: Optional[str]) -> int:
    return 1 if axis_name is None else jax.lax.axis_size(axis_name)


def fold_in_axis_index(key: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Decorrelate per-shard RNG streams (same key enters every shard)."""
    if axis_name is None:
        return key
    return jax.random.fold_in(key, jax.lax.axis_index(axis_name))


def logsumexp_g(v: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Global logsumexp of a (locally (n_local,)) sharded vector."""
    m = pmax(jnp.max(v), axis_name)
    return m + jnp.log(psum(jnp.sum(jnp.exp(v - m)), axis_name))


def kish_ess_g(log_w: jax.Array, axis_name: Optional[str]) -> jax.Array:
    """Global Kish ESS (sum w)^2 / sum w^2 of sharded log weights."""
    m = pmax(jnp.max(log_w), axis_name)
    w = jnp.exp(log_w - m)
    s1 = psum(jnp.sum(w), axis_name)
    s2 = psum(jnp.sum(w * w), axis_name)
    return s1 * s1 / s2
