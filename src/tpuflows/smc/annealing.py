"""Adaptive annealing schedule for SMC.

Reference parity (SURVEY.md §2b row 16; PAPERS.md:9, Buchholz et al.
1808.07730 pattern: adapt within SMC): the inverse-temperature path
beta: 0 -> 1 is chosen on the fly so each stage's incremental importance
weights keep a target relative ESS — the standard ESS-bisection rule.

TPU design: the bisection is a fixed-iteration `lax.fori_loop` on scalars
(60 halvings of [beta, 1] reach f32 resolution), so `next_beta` jits and
can sit inside a host-side temperature loop without retracing.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.diagnostics import importance_weight_ess


def relative_ess(log_w_inc: jax.Array) -> jax.Array:
    """Kish ESS / n of incremental log weights."""
    n = log_w_inc.shape[0]
    return importance_weight_ess(log_w_inc) / n


def next_beta(
    beta: jax.Array,
    log_ratio: jax.Array,
    target_rel_ess: float = 0.5,
    n_bisect: int = 60,
    axis_name=None,
    n_global=None,
) -> jax.Array:
    """Largest beta' in (beta, 1] with rel-ESS((beta'-beta)*log_ratio) >=
    target, found by bisection; returns 1.0 if even beta'=1 clears it.

    `log_ratio` is log p_1(x_i) - log p_0(x_i) per particle: the tempered
    incremental weight at beta' is (beta' - beta) * log_ratio. With
    `axis_name` set (inside shard_map) the ESS is the GLOBAL one over all
    shards (`n_global` = total particle count), so the realized ladder is
    independent of the shard count.
    """
    from tpuflows.dist.collectives import kish_ess_g

    beta = jnp.asarray(beta, jnp.float32)
    n = log_ratio.shape[0] if n_global is None else n_global

    def ess_at(b):
        return kish_ess_g((b - beta) * log_ratio, axis_name) / n

    def body(_, lohi):
        lo, hi = lohi
        mid = 0.5 * (lo + hi)
        ok = ess_at(mid) >= target_rel_ess
        return jnp.where(ok, mid, lo), jnp.where(ok, hi, mid)

    full = ess_at(jnp.asarray(1.0)) >= target_rel_ess
    lo, hi = jax.lax.fori_loop(
        0, n_bisect, body, (beta, jnp.asarray(1.0, jnp.float32))
    )
    return jnp.where(full, 1.0, lo)
