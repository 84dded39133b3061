"""Variational inference with the flow as variational family.

Reference parity (SURVEY.md §2b row 17): the reverse-KL flow fit IS VI —
maximize ELBO = E_{z~N(0,I)}[ log p(f^-1(z)) + ladj_{f^-1}(z) ] + H(N(0,I)).
The training loop is `optimize_flow_reverse_kl` (flows/train.py) verbatim;
this module adds the ELBO estimator, the variational density q(x), and
posterior sampling from the fitted family.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional

import jax
import jax.numpy as jnp
import optax

from tpuflows.flows.core import Bijector
from tpuflows.flows.train import optimize_flow_reverse_kl
from tpuflows.targets.base import std_normal_logpdf


class VIResult(NamedTuple):
    flow: Bijector
    elbo_hist: jax.Array  # (nsteps,) running ELBO estimates
    final_elbo: jax.Array


def _base_entropy(dim: int) -> float:
    return 0.5 * dim * (1.0 + jnp.log(2.0 * jnp.pi))


def elbo(
    key: jax.Array,
    flow: Bijector,
    log_density: Callable,
    dim: int,
    n: int = 4096,
) -> jax.Array:
    """Monte-Carlo ELBO of the flow family against `log_density`."""
    z = jax.random.normal(key, (n, dim), jnp.float32)
    x, ladj = flow.inverse_and_ladj(z)
    return jnp.mean(log_density(x) + ladj) + _base_entropy(dim)


def vi_sample(key: jax.Array, flow: Bijector, dim: int, n: int) -> jax.Array:
    """Draw n samples from the variational posterior q = f^-1 # N(0, I)."""
    z = jax.random.normal(key, (n, dim), jnp.float32)
    return flow.inverse(z)


def vi_log_q(flow: Bijector, x: jax.Array) -> jax.Array:
    """log q(x) of the flow family: log N(f(x); 0, I) + log|det df/dx|."""
    z, ladj = flow.forward_and_ladj(x)
    return std_normal_logpdf(z) + ladj


def fit_vi(
    key: jax.Array,
    log_density: Callable,
    flow: Bijector,
    dim: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    batch_size: int = 512,
    nsteps: int = 1000,
    anneal_steps: int = 0,
    stl: bool = False,
    chunk_size: Optional[int] = None,
) -> VIResult:
    """Fit the flow as a VI family by maximizing the ELBO (reverse KL).
    `anneal_steps` ramps the target temperature (see
    optimize_flow_reverse_kl) — use ~nsteps/2 for funnel-like targets;
    `stl` uses the sticking-the-landing gradient estimator; `chunk_size`
    bounds single-device-program length (see optimize_flow_reverse_kl)."""
    k_train, k_eval = jax.random.split(key)
    res = optimize_flow_reverse_kl(
        k_train,
        log_density,
        flow,
        dim,
        optimizer=optimizer,
        batch_size=batch_size,
        nsteps=nsteps,
        anneal_steps=anneal_steps,
        stl=stl,
        chunk_size=chunk_size,
    )
    if stl:
        # STL loss = -(E[log p - log q]) = -ELBO estimate directly.
        hist = -res.loss_hist
    else:
        # loss = -(E[log p + ladj]); ELBO = -loss + H(base)
        hist = -res.loss_hist + _base_entropy(dim)
    return VIResult(
        flow=res.result,
        elbo_hist=hist,
        final_elbo=elbo(k_eval, res.result, log_density, dim),
    )
