"""Rational-quadratic spline transforms — pure-jnp reference implementation.

Reference parity (SURVEY.md §2b row 9): MonotonicSplines.jl (RQSpline /
InvRQSpline, parameter normalization, forward+inverse eval with exact
log-det-Jacobian), implementing Neural Spline Flows (Durkan et al. 2019,
PAPERS.md:5 — https://arxiv.org/abs/1906.04032, eqs. 4 & 5-8 for the
forward/derivative and 25-29 for the analytic inverse).

This module is the correctness ORACLE for the Pallas TPU kernel
(tpuflows.kernels.rqs_pallas); both must agree to near machine precision.

TPU-first design decisions (shared with the kernel):
  - Branchless bin search: the bin index is a sum of K-1 comparisons, and
    per-bin parameters are selected by a one-hot sum — no gathers, no
    data-dependent control flow, so XLA/Mosaic vectorize everything on the
    VPU with static shapes.
  - Linear tails: outside [-B, B] the transform is the identity (ladj 0),
    selected with jnp.where; inputs are clamped into range first so the
    not-taken branch never produces NaN/Inf (which would poison reverse-mode
    AD through `where`).

Shapes: x is (..., d); raw params are (..., d, 3K-1) = K widths, K heights,
K-1 interior derivatives. Returned ladj is elementwise (..., d); callers
(coupling blocks) mask and sum it.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

DEFAULT_RANGE = 4.0  # B: spline acts on [-B, B]
DEFAULT_MIN_BIN = 1e-3
DEFAULT_MIN_DERIV = 1e-3
_SOFTPLUS_UNIT = 0.5413248546129181  # softplus(x)=1 at x = log(e - 1)


class SplineKnots(NamedTuple):
    """Normalized spline: knot positions and derivatives.

    xk, yk: (..., d, K+1) monotone knot coordinates spanning [-B, B].
    dk:     (..., d, K+1) positive derivatives; dk[..., 0] = dk[..., -1] = 1
            (matches the identity linear tails).
    """

    xk: jax.Array
    yk: jax.Array
    dk: jax.Array


def _cumsum_small(x: jax.Array) -> jax.Array:
    """Sequential prefix sum over the SMALL static knot axis, unrolled.
    Same left-to-right association as a sequential cumsum, but with a
    Pallas TPU lowering (jnp.cumsum has none — this math also runs inside
    the fused transition kernel, kernels/nuts_pallas.py)."""
    acc = x[..., :1]
    parts = [acc]
    for i in range(1, x.shape[-1]):
        acc = acc + x[..., i:i + 1]
        parts.append(acc)
    return jnp.concatenate(parts, axis=-1)


def normalize_params(
    raw: jax.Array,
    range_limit: float = DEFAULT_RANGE,
    min_bin: float = DEFAULT_MIN_BIN,
    min_derivative: float = DEFAULT_MIN_DERIV,
) -> SplineKnots:
    """raw (..., d, 3K-1) -> monotone knots (softmax widths/heights, softplus
    derivatives) — MonotonicSplines.jl's parameter normalization."""
    K = (raw.shape[-1] + 1) // 3
    w_raw = raw[..., :K]
    h_raw = raw[..., K : 2 * K]
    d_raw = raw[..., 2 * K :]

    B = range_limit
    widths = jax.nn.softmax(w_raw, axis=-1)
    widths = min_bin + (1.0 - min_bin * K) * widths
    heights = jax.nn.softmax(h_raw, axis=-1)
    heights = min_bin + (1.0 - min_bin * K) * heights

    zero = jnp.zeros_like(w_raw[..., :1])
    xk = -B + 2.0 * B * _cumsum_small(
        jnp.concatenate([zero, widths], axis=-1)
    )
    yk = -B + 2.0 * B * _cumsum_small(
        jnp.concatenate([zero, heights], axis=-1)
    )
    # pin the endpoints exactly to +/-B (cumsum roundoff). Concatenation
    # instead of .at[...].set: identical values, and static-index scatter
    # has no Pallas TPU lowering (kernels/nuts_pallas.py runs this math
    # in-kernel).
    endp = jnp.full_like(xk[..., :1], B)
    xk = jnp.concatenate([xk[..., :-1], endp], axis=-1)
    yk = jnp.concatenate([yk[..., :-1], endp], axis=-1)

    d_int = min_derivative + jax.nn.softplus(d_raw + _SOFTPLUS_UNIT)
    one = jnp.ones_like(d_raw[..., :1])
    dk = jnp.concatenate([one, d_int, one], axis=-1)
    return SplineKnots(xk=xk, yk=yk, dk=dk)


def _select_bin(t: jax.Array, knots: jax.Array):
    """Branchless bin search. t: (..., d); knots: (..., d, K+1).

    Returns one-hot (..., d, K) over bins (clamped to the edge bins), with
    t assumed already clamped into [-B, B]."""
    K = knots.shape[-1] - 1
    # bin index = #{interior knots <= t}; one-hot via two comparisons
    ge_lo = t[..., None] >= knots[..., :-1]  # (..., d, K)
    lt_hi = t[..., None] < knots[..., 1:]
    onehot = jnp.logical_and(ge_lo, lt_hi)
    # t == B falls in no half-open bin: assign to the last bin
    none_hot = ~jnp.any(onehot, axis=-1, keepdims=True)
    last = jnp.arange(K) == K - 1
    onehot = jnp.logical_or(onehot, jnp.logical_and(none_hot, last))
    return onehot.astype(t.dtype)


def _gather(onehot: jax.Array, v: jax.Array) -> jax.Array:
    """Per-element parameter select: sum_k onehot_k * v_k (no gather op)."""
    return jnp.sum(onehot * v, axis=-1)


def rqs_forward(x: jax.Array, knots: SplineKnots):
    """Forward spline. Returns (y, elementwise log|dy/dx|)."""
    xk, yk, dk = knots
    # static slice + squeeze, not int indexing: jnp's arr[..., -1] lowers
    # to dynamic_slice, which has no Pallas TPU lowering
    B = jnp.squeeze(xk[..., -1:], -1)
    inside = jnp.abs(x) <= B
    xc = jnp.clip(x, -B, B)

    onehot = _select_bin(xc, xk)
    x0 = _gather(onehot, xk[..., :-1])
    w = _gather(onehot, xk[..., 1:] - xk[..., :-1])
    y0 = _gather(onehot, yk[..., :-1])
    h = _gather(onehot, yk[..., 1:] - yk[..., :-1])
    d0 = _gather(onehot, dk[..., :-1])
    d1 = _gather(onehot, dk[..., 1:])

    s = h / w  # bin slope
    xi = (xc - x0) / w
    xi1m = 1.0 - xi
    q = xi * xi1m
    denom = s + (d1 + d0 - 2.0 * s) * q
    y = y0 + h * (s * xi * xi + d0 * q) / denom
    # dy/dx = s^2 (d1 xi^2 + 2 s q + d0 (1-xi)^2) / denom^2
    deriv_num = s * s * (d1 * xi * xi + 2.0 * s * q + d0 * xi1m * xi1m)
    ladj = jnp.log(deriv_num) - 2.0 * jnp.log(denom)

    y = jnp.where(inside, y, x)
    ladj = jnp.where(inside, ladj, 0.0)
    return y, ladj


def rqs_inverse(y: jax.Array, knots: SplineKnots):
    """Analytic inverse spline. Returns (x, elementwise log|dx/dy|)."""
    xk, yk, dk = knots
    B = jnp.squeeze(yk[..., -1:], -1)  # static slice (see rqs_forward)
    inside = jnp.abs(y) <= B
    yc = jnp.clip(y, -B, B)

    onehot = _select_bin(yc, yk)
    x0 = _gather(onehot, xk[..., :-1])
    w = _gather(onehot, xk[..., 1:] - xk[..., :-1])
    y0 = _gather(onehot, yk[..., :-1])
    h = _gather(onehot, yk[..., 1:] - yk[..., :-1])
    d0 = _gather(onehot, dk[..., :-1])
    d1 = _gather(onehot, dk[..., 1:])

    s = h / w
    dy = yc - y0
    t = d1 + d0 - 2.0 * s
    # Durkan et al. eqs. 25-29: solve a xi^2 + b xi + c = 0 (stable root)
    a = h * (s - d0) + dy * t
    b = h * d0 - dy * t
    c = -s * dy
    disc = b * b - 4.0 * a * c
    disc = jnp.maximum(disc, 0.0)  # roundoff guard at bin edges
    xi = 2.0 * c / (-b - jnp.sqrt(disc))
    xi = jnp.clip(xi, 0.0, 1.0)
    x = x0 + w * xi

    xi1m = 1.0 - xi
    q = xi * xi1m
    denom = s + t * q
    deriv_num = s * s * (d1 * xi * xi + 2.0 * s * q + d0 * xi1m * xi1m)
    ladj = 2.0 * jnp.log(denom) - jnp.log(deriv_num)  # log|dx/dy|

    x = jnp.where(inside, x, y)
    ladj = jnp.where(inside, ladj, 0.0)
    return x, ladj


def rqs_forward_from_raw(x, raw, range_limit: float = DEFAULT_RANGE):
    with jax.named_scope("rqs_forward"):
        return rqs_forward(x, normalize_params(raw, range_limit))


def rqs_inverse_from_raw(y, raw, range_limit: float = DEFAULT_RANGE):
    with jax.named_scope("rqs_inverse"):
        return rqs_inverse(y, normalize_params(raw, range_limit))
