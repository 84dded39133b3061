"""Sample-matrix and mask helpers.

Reference analog: AdaptiveFlows.jl src/utils.jl — ArraysOfArrays
flatview/nestedview between vector-of-vectors and d x N matrices, plus
dim-partition helpers for coupling masks (SURVEY.md §2a row 6).

TPU layout convention used engine-wide: batch leading, features trailing
(`(..., d)`) so the feature axis maps onto VPU lanes and batched matmuls hit
the MXU with the batch on sublanes.
"""
from __future__ import annotations

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
