"""Metropolis-Hastings kernels: adaptive random-walk + flow independence.

Reference parity (SURVEY.md §2b row 14): BAT.jl's default sampler is
`MetropolisHastings()` with `AdaptiveMHTuning` — a Gaussian random-walk
proposal whose covariance is rescaled between burn-in cycles toward a
target acceptance band, with the proposal shape taken from the empirical
sample covariance. BAT's flow-adaptive transformed MCMC additionally uses
the trained flow as an *independence* proposal (propose from the flow,
accept by importance ratio).

TPU design: both kernels are single-chain pure functions `(key, state) ->
state` vmapped over the chain axis; adaptation statistics (acceptance rate,
Welford variance) are pooled across chains by plain means and across hosts
via `lax.pmean` when `axis_name` is given, so the algorithm is identical at
any host count (SURVEY.md §7 hard part 5). Warmup + sampling each run as
one `lax.scan` — zero host round-trips.

Adaptation (warmup only, Robbins-Monro / Haario-style):
  - per-dim proposal shape  sigma_d  <- pooled Welford variance (like Stan's
    diagonal metric; BAT tunes a full covariance, diagonal is the TPU-cheap
    equivalent that keeps the proposal O(d));
  - global scale `lambda` <- log-space Robbins-Monro step toward
    `target_accept` (0.234, the classic RWMH optimum).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpuflows.flows.core import Bijector
from tpuflows.mcmc.dual_averaging import (
    welford_init,
    welford_update_batch,
    welford_variance,
)
from tpuflows.targets.base import std_normal_logpdf


class MHInfo(NamedTuple):
    accept_prob: jax.Array
    accepted: jax.Array
    logp: jax.Array


class MHResult(NamedTuple):
    samples: jax.Array  # (num_samples, n_chains, d)
    info: MHInfo  # stacked per-draw info
    scale: jax.Array  # final global proposal scale
    sigma: jax.Array  # final per-dim proposal std (d,)


def make_rwmh_kernel(log_density: Callable):
    """Gaussian random-walk MH transition on a (d,) chain state.

    `scale` is the global step multiplier, `sigma` the (d,) per-dim shape.
    Carries logp so the target is evaluated once per step.
    """

    def transition(key, q, logp, scale, sigma):
        k_prop, k_acc = jax.random.split(key)
        q_new = q + scale * sigma * jax.random.normal(k_prop, q.shape, q.dtype)
        logp_new = log_density(q_new)
        log_ratio = logp_new - logp
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_ratio, 0.0)))
        accepted = jnp.log(jax.random.uniform(k_acc)) < log_ratio
        q = jnp.where(accepted, q_new, q)
        logp = jnp.where(accepted, logp_new, logp)
        return q, logp, MHInfo(accept_prob=accept_prob, accepted=accepted,
                               logp=logp)

    return transition


def _pmean_if(axis_name, x):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def run_rwmh(
    key: jax.Array,
    log_density: Callable,
    init_positions: jax.Array,  # (n_chains, d)
    num_warmup: int = 1000,
    num_samples: int = 1000,
    initial_scale: float = 0.5,
    target_accept: float = 0.234,
    adapt_shape: bool = True,
    axis_name: Optional[str] = None,
    jit: bool = True,
) -> MHResult:
    """Vmapped adaptive random-walk Metropolis (BAT `MetropolisHastings`).

    Warmup: Robbins-Monro on log(scale) toward `target_accept`; per-dim
    proposal std from pooled Welford variance over the last 85% of warmup
    (installed continuously — RWMH has no step-size/metric coupling that
    would need Stan's windowing).
    """
    n_chains, d = init_positions.shape
    kernel = make_rwmh_kernel(log_density)
    vkernel = jax.vmap(kernel, in_axes=(0, 0, 0, None, None))
    welford_start = int(0.15 * num_warmup)

    def warmup_body(carry, inp):
        step_idx, step_key = inp
        q, logp, log_scale, wf, sigma = carry
        keys = jax.random.split(step_key, n_chains)
        q, logp, info = vkernel(keys, q, logp, jnp.exp(log_scale), sigma)
        accept = _pmean_if(axis_name, jnp.mean(info.accept_prob))
        # Robbins-Monro: eta_t = t^-0.6 (standard adaptive-MCMC schedule)
        eta = (step_idx + 1.0) ** -0.6
        log_scale = log_scale + eta * (accept - target_accept)
        if adapt_shape:
            in_window = step_idx >= welford_start
            wf_new = welford_update_batch(wf, q)
            wf = jax.tree_util.tree_map(
                lambda new, old: jnp.where(in_window, new, old), wf_new, wf
            )
            var = _pmean_if(axis_name, welford_variance(wf))
            sigma = jnp.where(wf.count > 10.0, jnp.sqrt(var), sigma)
        return (q, logp, log_scale, wf, sigma), None

    def sample_body(carry, step_key):
        q, logp, scale, sigma = carry
        keys = jax.random.split(step_key, n_chains)
        q, logp, info = vkernel(keys, q, logp, scale, sigma)
        return (q, logp, scale, sigma), (q, info)

    def run(key, q0):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_warm, k_sample = jax.random.split(key)
        logp0 = jax.vmap(log_density)(q0)
        # 2.38/sqrt(d): optimal-scaling initial step (Roberts et al.)
        log_scale = jnp.log(
            jnp.asarray(initial_scale * 2.38 / jnp.sqrt(d), jnp.float32)
        )
        sigma = jnp.ones((d,), jnp.float32)
        carry = (q0, logp0, log_scale, welford_init(d), sigma)
        if num_warmup > 0:
            warm_keys = jax.random.split(k_warm, num_warmup)
            steps = jnp.arange(num_warmup, dtype=jnp.float32)
            carry, _ = jax.lax.scan(warmup_body, carry, (steps, warm_keys))
        q0, logp0, log_scale, _, sigma = carry
        scale = jnp.exp(log_scale)
        sample_keys = jax.random.split(k_sample, num_samples)
        _, (samples, info) = jax.lax.scan(
            sample_body, (q0, logp0, scale, sigma), sample_keys
        )
        return MHResult(samples=samples, info=info, scale=scale, sigma=sigma)

    runner = jax.jit(run) if jit else run
    return runner(key, init_positions)


def make_flow_imh_kernel(log_density: Callable, flow: Bijector, dim: int):
    """Flow independence-MH transition (BAT transformed-MCMC proposal).

    Proposal: z ~ N(0, I), x' = f^-1(z);  log q(x') = logN(f(x')) + ladj_f(x').
    Accept with min(1, p(x') q(x) / (p(x) q(x'))). Carries logp and logq.
    """

    def log_q(x):
        z, ladj = flow.forward_and_ladj(x)
        return std_normal_logpdf(z) + ladj

    def transition(key, q, logp, logq):
        k_prop, k_acc = jax.random.split(key)
        z = jax.random.normal(k_prop, (dim,), q.dtype)
        x_new, inv_ladj = flow.inverse_and_ladj(z)
        logq_new = std_normal_logpdf(z) - inv_ladj
        logp_new = log_density(x_new)
        log_ratio = (logp_new - logp) - (logq_new - logq)
        accept_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_ratio, 0.0)))
        accepted = jnp.log(jax.random.uniform(k_acc)) < log_ratio
        q = jnp.where(accepted, x_new, q)
        logp = jnp.where(accepted, logp_new, logp)
        logq = jnp.where(accepted, logq_new, logq)
        return q, logp, logq, MHInfo(accept_prob=accept_prob,
                                     accepted=accepted, logp=logp)

    return transition, log_q


def run_flow_imh(
    key: jax.Array,
    log_density: Callable,
    flow: Bijector,
    init_positions: jax.Array,  # (n_chains, d)
    num_samples: int = 1000,
    axis_name: Optional[str] = None,
    jit: bool = True,
) -> MHResult:
    """Vmapped flow-independence MH. No adaptation phase — the proposal IS
    the trained flow; quality is governed by the adaptive loop that retrains
    it (adaptive/loop.py)."""
    n_chains, d = init_positions.shape
    kernel, log_q = make_flow_imh_kernel(log_density, flow, d)
    vkernel = jax.vmap(kernel, in_axes=(0, 0, 0, 0))

    def sample_body(carry, step_key):
        q, logp, logq = carry
        keys = jax.random.split(step_key, n_chains)
        q, logp, logq, info = vkernel(keys, q, logp, logq)
        return (q, logp, logq), (q, info)

    def run(key, q0):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        logp0 = jax.vmap(log_density)(q0)
        logq0 = jax.vmap(log_q)(q0)
        sample_keys = jax.random.split(key, num_samples)
        _, (samples, info) = jax.lax.scan(
            sample_body, (q0, logp0, logq0), sample_keys
        )
        return MHResult(samples=samples, info=info,
                        scale=jnp.asarray(1.0, jnp.float32),
                        sigma=jnp.ones((d,), jnp.float32))

    runner = jax.jit(run) if jit else run
    return runner(key, init_positions)
