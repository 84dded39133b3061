"""Sample-matrix and mask helpers.

Reference analog: AdaptiveFlows.jl src/utils.jl — ArraysOfArrays
flatview/nestedview between vector-of-vectors and d x N matrices, plus
dim-partition helpers for coupling masks (SURVEY.md §2a row 6).

TPU layout convention used engine-wide: batch leading, features trailing
(`(..., d)`) so the feature axis maps onto VPU lanes and batched matmuls hit
the MXU with the batch on sublanes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def flatview(samples) -> jnp.ndarray:
    """List/stack of d-vectors -> (N, d) matrix (reference: flatview)."""
    arr = jnp.asarray(samples)
    if arr.ndim == 1:
        arr = arr[:, None]
    return arr.reshape(-1, arr.shape[-1])


def nestedview(matrix: jnp.ndarray):
    """(N, d) matrix -> list of d-vectors (reference: nestedview)."""
    return list(matrix)


def alternating_mask(dim: int, parity: int) -> tuple[int, ...]:
    """Checkerboard coupling mask: 1 = pass-through dim, 0 = transformed dim.

    Returned as a hashable tuple so it is static under jit (part of the
    compiled-program cache key, never traced).
    """
    return tuple(1 if (i + parity) % 2 == 0 else 0 for i in range(dim))


def block_mask(dim: int, parity: int) -> tuple[int, ...]:
    """First-half/second-half split mask."""
    half = dim // 2
    if parity % 2 == 0:
        return tuple(1 if i < half else 0 for i in range(dim))
    return tuple(0 if i < half else 1 for i in range(dim))


def mask_array(mask: tuple[int, ...], dtype=jnp.float32) -> jnp.ndarray:
    return jnp.asarray(np.array(mask, dtype=np.float32), dtype=dtype)


def num_batches_split(n: int, nbatches: int) -> int:
    """Largest per-batch size using all batches (drop remainder, static)."""
    if nbatches <= 0:
        raise ValueError("nbatches must be positive")
    bs = n // nbatches
    if bs == 0:
        raise ValueError(f"cannot split {n} samples into {nbatches} batches")
    return bs


class VariateShape:
    """Shaped <-> flat variate transform (reference: ValueShapes.jl,
    SURVEY.md §2b row 13 "shaped<->flat variate transforms").

    Built from an example pytree of arrays (a named parameter space, e.g.
    `{"mu": (), "sigma": (3,), "W": (2, 2)}` as concrete arrays); converts
    between that tree and flat `(..., d)` vectors with arbitrary leading
    batch axes — so samplers/flows always see dense lane-aligned matrices
    while user densities see named parameters.

    All metadata is static (python ints/treedefs), so `flatten`/`unflatten`
    trace cleanly under jit/vmap and cost only reshapes + one concat/split.
    """

    def __init__(self, example):
        leaves, treedef = jax.tree_util.tree_flatten(example)
        self._treedef = treedef
        self._shapes = tuple(tuple(jnp.shape(l)) for l in leaves)
        self._sizes = tuple(
            int(np.prod(s)) if s else 1 for s in self._shapes
        )
        self.dim = int(sum(self._sizes))

    def flatten(self, tree) -> jnp.ndarray:
        """Pytree with leaves of shape (*batch, *leaf_shape) -> (*batch, d)."""
        leaves = jax.tree_util.tree_leaves(tree)
        parts = []
        for leaf, shape, size in zip(leaves, self._shapes, self._sizes):
            leaf = jnp.asarray(leaf)
            batch = leaf.shape[: leaf.ndim - len(shape)]
            parts.append(leaf.reshape(*batch, size))
        return jnp.concatenate(parts, axis=-1) if len(parts) > 1 else parts[0]

    def unflatten(self, vec: jnp.ndarray):
        """(*batch, d) -> pytree with leaves (*batch, *leaf_shape)."""
        vec = jnp.asarray(vec)
        batch = vec.shape[:-1]
        leaves = []
        off = 0
        for shape, size in zip(self._shapes, self._sizes):
            leaves.append(vec[..., off : off + size].reshape(*batch, *shape))
            off += size
        return jax.tree_util.tree_unflatten(self._treedef, leaves)

    def flat_log_density(self, shaped_log_density):
        """Wrap a density over named parameters into one over flat vectors
        (what every sampler/flow in the engine consumes)."""

        def logp(x):
            return shaped_log_density(self.unflatten(x))

        return logp
