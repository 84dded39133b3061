"""PRNG helpers.

Reference analog: RNG/seeding helpers in AdaptiveFlows.jl src/utils.jl
(SURVEY.md §2a row 6). JAX keys are explicit and splittable, which is what
makes the whole engine deterministic under a fixed seed across any sharding
(SURVEY.md §5 determinism guarantee).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp


def key(seed: int) -> jax.Array:
    return jax.random.key(seed)


def split(k: jax.Array, n: int = 2):
    return jax.random.split(k, n)


def fold(k: jax.Array, data: int | jax.Array) -> jax.Array:
    return jax.random.fold_in(k, data)


def key_tree(k: jax.Array, tree):
    """One fresh key per leaf of `tree` (for per-parameter init)."""
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    keys = jax.random.split(k, len(leaves))
    return jax.tree_util.tree_unflatten(treedef, list(keys))


def normal_like(k: jax.Array, x: jax.Array) -> jax.Array:
    return jax.random.normal(k, x.shape, x.dtype)


def uniform_batch(k: jax.Array, shape, lo=0.0, hi=1.0, dtype=jnp.float32):
    return jax.random.uniform(k, shape, dtype, lo, hi)
