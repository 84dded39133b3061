"""Parallel tempering (replica exchange) over a fixed beta ladder.

Reference parity (SURVEY.md §2a row 8 / §2b row 15): BAT.jl's tempered
ensemble sampling — chains run on a ladder of tempered posteriors and
exchange states so mass crosses energy barriers that trap beta=1 chains
(the 16-d bimodal mixture of config 3, BASELINE.json:9, is the canonical
failure case this fixes).

Tempered path (same convention as smc/sampler.py):

    log pi_beta(x) = (1 - beta) * log_ref(x) + beta * log_density(x)

with `log_ref` a standard normal by default, or the trained flow's log-q
(`vi_log_q`) for a flow-bridged ladder.

TPU design: the replica lattice is one (n_temps, n_chains, d) array; the
within-temperature move is a vmapped random-walk MH sweep over BOTH axes,
and the exchange phase is a branchless even/odd neighbor swap implemented
as a gather along the temperature axis — no per-pair control flow, so the
whole sampler is one `lax.scan`. Per-temperature proposal scales adapt by
Robbins-Monro toward 0.234 during warmup (pooled across chains and, via
`lax.pmean`, across hosts when `axis_name` is set — chains sharded over
workers, the temperature axis replicated).
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp

from tpuflows.targets.base import std_normal_logpdf


class PTInfo(NamedTuple):
    accept_prob: jax.Array  # (n_temps,) mean within-temperature accept
    swap_accept: jax.Array  # (n_temps-1,) neighbor swap acceptance
    logp: jax.Array  # (n_chains,) beta=1 target log density


class PTResult(NamedTuple):
    samples: jax.Array  # (num_samples, n_chains, d) beta=1 replica draws
    info: PTInfo  # stacked per-draw info
    scales: jax.Array  # (n_temps,) final proposal scales
    betas: jax.Array  # (n_temps,)


def geometric_betas(n_temps: int, beta_min: float = 1e-2) -> jax.Array:
    """Geometric ladder beta_min -> 1 (the standard PT default)."""
    if n_temps < 2:
        return jnp.ones((1,), jnp.float32)
    return jnp.asarray(
        beta_min ** (1.0 - jnp.arange(n_temps) / (n_temps - 1)), jnp.float32
    )


def _pmean_if(axis_name, x):
    if axis_name is None:
        return x
    return jax.lax.pmean(x, axis_name)


def run_parallel_tempering(
    key: jax.Array,
    log_density: Callable,
    init_positions: jax.Array,  # (n_chains, d) — tiled across the ladder
    betas: jax.Array,  # (n_temps,) ascending, betas[-1] == 1
    num_warmup: int = 1000,
    num_samples: int = 1000,
    initial_scale: float = 0.5,
    target_accept: float = 0.234,
    log_ref: Optional[Callable] = None,
    axis_name: Optional[str] = None,
    jit: bool = True,
) -> PTResult:
    """Replica-exchange MH. Returns the beta=1 replica's draws.

    Within-temperature move: one Gaussian RWMH step per replica per scan
    step; exchange move: alternating even/odd neighbor-pair swaps with the
    exact Metropolis ratio exp(dbeta * d(logl - logr)).
    """
    if log_ref is None:
        log_ref = std_normal_logpdf
    betas = jnp.asarray(betas, jnp.float32)
    n_temps = betas.shape[0]
    n_chains, d = init_positions.shape

    v_logl = jax.vmap(jax.vmap(log_density))  # over (temps, chains)
    v_logr = jax.vmap(jax.vmap(log_ref))

    def tempered(logr, logl):
        # (n_temps, n_chains) given per-replica cached component values
        return (1.0 - betas)[:, None] * logr + betas[:, None] * logl

    def move(key, x, logr, logl, scales):
        """One RWMH sweep on every replica (branchless, both axes vmapped
        through plain broadcasting)."""
        k_prop, k_acc = jax.random.split(key)
        step = scales[:, None, None] * jax.random.normal(
            k_prop, x.shape, x.dtype
        )
        x_new = x + step
        logr_new = v_logr(x_new)
        logl_new = v_logl(x_new)
        log_ratio = tempered(logr_new, logl_new) - tempered(logr, logl)
        u = jax.random.uniform(k_acc, log_ratio.shape)
        accepted = jnp.log(u) < log_ratio
        acc3 = accepted[:, :, None]
        x = jnp.where(acc3, x_new, x)
        logr = jnp.where(accepted, logr_new, logr)
        logl = jnp.where(accepted, logl_new, logl)
        acc_prob = jnp.minimum(1.0, jnp.exp(jnp.minimum(log_ratio, 0.0)))
        return x, logr, logl, jnp.mean(acc_prob, axis=1)

    def swap(key, x, logr, logl, parity):
        """Even/odd neighbor exchange as a gather along the temp axis.

        Pair (i, i+1) forms when (i - parity) % 2 == 0; the pair's accept
        ratio uses one shared uniform (drawn at the pair's lower index)."""
        idx = jnp.arange(n_temps)
        lower = ((idx - parity) % 2) == 0
        partner = jnp.where(lower, idx + 1, idx - 1)
        valid = (partner >= 0) & (partner < n_temps)
        partner_c = jnp.clip(partner, 0, n_temps - 1)

        # Metropolis log-ratio for exchanging replicas i <-> partner:
        # dbeta * d(logl - logr), identical from both sides
        e = logl - logr  # (n_temps, n_chains)
        e_p = e[partner_c]
        db = betas[partner_c] - betas
        log_ratio = db[:, None] * (e - e_p)

        u = jax.random.uniform(key, (n_temps, n_chains))
        # the pair shares the lower member's uniform
        u_pair = jnp.where(lower[:, None], u, u[partner_c])
        do_swap = (jnp.log(u_pair) < log_ratio) & valid[:, None]

        sw3 = do_swap[:, :, None]
        x = jnp.where(sw3, x[partner_c], x)
        logr = jnp.where(do_swap, logr[partner_c], logr)
        logl = jnp.where(do_swap, logl[partner_c], logl)
        # per-interface acceptance: read off the lower pair members
        rate = jnp.mean(do_swap.astype(jnp.float32), axis=1)
        swap_rate = jnp.where(lower[:-1], rate[:-1], rate[1:])
        return x, logr, logl, swap_rate

    def step_fn(carry, inp):
        step_idx, step_key = inp
        x, logr, logl, log_scales = carry
        k_move, k_swap = jax.random.split(step_key)
        x, logr, logl, acc = move(k_move, x, logr, logl,
                                  jnp.exp(log_scales))
        acc = _pmean_if(axis_name, acc)
        x, logr, logl, swap_rate = swap(
            k_swap, x, logr, logl, (step_idx % 2).astype(jnp.int32)
        )
        return (x, logr, logl, log_scales), (x, logr, logl, acc, swap_rate)

    def warmup_body(carry, inp):
        step_idx, step_key = inp
        (x, logr, logl, log_scales), (_, _, _, acc, _) = step_fn(
            carry, (step_idx, step_key)
        )
        eta = (step_idx.astype(jnp.float32) + 1.0) ** -0.6
        log_scales = log_scales + eta * (acc - target_accept)
        return (x, logr, logl, log_scales), None

    def sample_body(carry, inp):
        carry, (x, logr, logl, acc, swap_rate) = step_fn(carry, inp)
        info = PTInfo(accept_prob=acc, swap_accept=swap_rate, logp=logl[-1])
        return carry, (x[-1], info)

    def run(key, q0):
        if axis_name is not None:
            key = jax.random.fold_in(key, jax.lax.axis_index(axis_name))
        k_warm, k_sample = jax.random.split(key)
        x = jnp.broadcast_to(q0[None], (n_temps, n_chains, d))
        logr = v_logr(x)
        logl = v_logl(x)
        log_scales = jnp.full(
            (n_temps,),
            jnp.log(initial_scale * 2.38 / jnp.sqrt(d)),
            jnp.float32,
        )
        carry = (x, logr, logl, log_scales)
        if num_warmup > 0:
            warm_keys = jax.random.split(k_warm, num_warmup)
            carry, _ = jax.lax.scan(
                warmup_body, carry, (jnp.arange(num_warmup), warm_keys)
            )
        sample_keys = jax.random.split(k_sample, num_samples)
        carry, (samples, info) = jax.lax.scan(
            sample_body, carry, (jnp.arange(num_samples), sample_keys)
        )
        return PTResult(samples=samples, info=info,
                        scales=jnp.exp(carry[3]), betas=betas)

    runner = jax.jit(run) if jit else run
    return runner(key, init_positions)
