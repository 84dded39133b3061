"""Step-size and mass-matrix adaptation.

Reference parity (SURVEY.md §2b row 14): AdvancedHMC.jl's Nesterov
dual-averaging step-size adaptation (Stan defaults: gamma=0.05, t0=10,
kappa=0.75, target accept delta) and diagonal mass-matrix (Welford)
estimation, required explicitly by config 4 (BASELINE.json:10).

All states are pytrees of scalars/vectors so the whole warmup runs inside
one lax.scan; adaptation statistics are pooled across vmapped chains (and
across hosts via psum — SURVEY.md §7 hard part 5) by the drivers.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class DualAveragingState(NamedTuple):
    log_eps: jax.Array
    log_eps_bar: jax.Array
    h_bar: jax.Array
    mu: jax.Array
    t: jax.Array


def da_init(eps0: float | jax.Array) -> DualAveragingState:
    """`eps0` may be a scalar (one pooled iterate) or an (n_chains,) vector
    (one independent iterate per chain — every leaf is created at full lane
    shape so the state is lax.scan-carry shape-stable)."""
    log_eps = jnp.log(jnp.asarray(eps0, jnp.float32))
    zeros = jnp.zeros_like(log_eps)
    return DualAveragingState(
        log_eps=log_eps,
        log_eps_bar=zeros,
        h_bar=zeros,
        mu=jnp.log(10.0) + log_eps,
        t=zeros,
    )


def da_update(
    state: DualAveragingState,
    accept_stat: jax.Array,
    target_accept: float = 0.8,
    gamma: float = 0.05,
    t0: float = 10.0,
    kappa: float = 0.75,
) -> DualAveragingState:
    t = state.t + 1.0
    w = 1.0 / (t + t0)
    h_bar = (1.0 - w) * state.h_bar + w * (target_accept - accept_stat)
    log_eps = state.mu - jnp.sqrt(t) / gamma * h_bar
    eta = t ** (-kappa)
    log_eps_bar = eta * log_eps + (1.0 - eta) * state.log_eps_bar
    return DualAveragingState(
        log_eps=log_eps, log_eps_bar=log_eps_bar, h_bar=h_bar, mu=state.mu, t=t
    )


def da_step_size(state: DualAveragingState, averaged: bool = False):
    return jnp.exp(state.log_eps_bar if averaged else state.log_eps)


class WelfordState(NamedTuple):
    """Streaming mean/variance over pooled (chain x step) draws."""

    count: jax.Array  # scalar
    mean: jax.Array  # (d,)
    m2: jax.Array  # (d,)


def welford_init(dim: int) -> WelfordState:
    return WelfordState(
        count=jnp.asarray(0.0, jnp.float32),
        mean=jnp.zeros((dim,), jnp.float32),
        m2=jnp.zeros((dim,), jnp.float32),
    )


def welford_update_batch(state: WelfordState, x: jax.Array) -> WelfordState:
    """Chan parallel update with a batch x: (n, d) (a step's chain block)."""
    n = jnp.asarray(x.shape[0], jnp.float32)
    bmean = jnp.mean(x, axis=0)
    bm2 = jnp.sum((x - bmean) ** 2, axis=0)
    delta = bmean - state.mean
    tot = state.count + n
    mean = state.mean + delta * n / jnp.maximum(tot, 1.0)
    m2 = state.m2 + bm2 + delta * delta * state.count * n / jnp.maximum(tot, 1.0)
    return WelfordState(count=tot, mean=mean, m2=m2)


def welford_merge(a: WelfordState, b: WelfordState) -> WelfordState:
    """Merge two streams (cross-host psum-able reduction)."""
    tot = a.count + b.count
    delta = b.mean - a.mean
    mean = a.mean + delta * b.count / jnp.maximum(tot, 1.0)
    m2 = a.m2 + b.m2 + delta * delta * a.count * b.count / jnp.maximum(tot, 1.0)
    return WelfordState(count=tot, mean=mean, m2=m2)


def welford_variance(state: WelfordState, regularize: bool = True) -> jax.Array:
    var = state.m2 / jnp.maximum(state.count - 1.0, 1.0)
    if regularize:
        # Stan's shrinkage toward unit metric for small counts
        n = state.count
        var = (n / (n + 5.0)) * var + 1e-3 * (5.0 / (n + 5.0))
    return var
