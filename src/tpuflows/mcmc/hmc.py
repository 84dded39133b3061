"""Hamiltonian Monte Carlo: leapfrog integrator + fixed-length HMC kernel.

Reference parity (SURVEY.md §2b row 14): AdvancedHMC.jl's leapfrog and
HamiltonianMC as wrapped by BAT.jl. Used directly as the SMC mutation move
(SURVEY.md §3.5) and as the building block of NUTS (mcmc/nuts.py).

All kernels are single-chain pure functions on (d,) vectors; callers vmap
over the chain/particle axis (SURVEY.md §2c: per-chip vmap over the local
chain block). The mass matrix is diagonal, parameterized by `inv_mass`
(Stan convention: inv_mass approximates the posterior covariance diagonal).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class PhasePoint(NamedTuple):
    q: jax.Array  # position (d,)
    p: jax.Array  # momentum (d,)
    logp: jax.Array  # log density at q, scalar
    grad: jax.Array  # d logp / dq, (d,)


def kinetic(p: jax.Array, inv_mass: jax.Array) -> jax.Array:
    return 0.5 * jnp.sum(p * p * inv_mass, axis=-1)


def energy(z: PhasePoint, inv_mass: jax.Array) -> jax.Array:
    return -z.logp + kinetic(z.p, inv_mass)


def leapfrog(
    logp_and_grad: Callable,
    z: PhasePoint,
    eps: jax.Array,
    inv_mass: jax.Array,
) -> PhasePoint:
    """One leapfrog step (velocity Verlet). eps may be signed (direction)."""
    with jax.named_scope("leapfrog"):
        p_half = z.p + 0.5 * eps * z.grad
        q_new = z.q + eps * p_half * inv_mass
        logp_new, grad_new = logp_and_grad(q_new)
        p_new = p_half + 0.5 * eps * grad_new
        return PhasePoint(q=q_new, p=p_new, logp=logp_new, grad=grad_new)


class HMCInfo(NamedTuple):
    accept_prob: jax.Array
    accepted: jax.Array
    logp: jax.Array
    energy: jax.Array


def make_hmc_kernel(
    log_density: Callable,
    num_leapfrog: int = 10,
    logp_and_grad: Callable | None = None,
):
    """Fixed-trajectory-length HMC with an MH correction.

    Returns transition(key, q, eps, inv_mass) -> (q_new, HMCInfo) on a
    single chain; vmap for many chains. The leapfrog loop is a lax.scan, so
    the compiled program size is O(1) in num_leapfrog.

    `logp_and_grad` overrides jax.value_and_grad(log_density) — see
    kernels/fused_logp.py (fused Pallas gradient).
    """
    if logp_and_grad is None:
        logp_and_grad = jax.value_and_grad(log_density)

    def transition(key, q, eps, inv_mass):
        k_mom, k_acc = jax.random.split(key)
        logp0, grad0 = logp_and_grad(q)
        # p ~ N(0, M) with M = 1/inv_mass
        p0 = jax.random.normal(k_mom, q.shape, q.dtype) / jnp.sqrt(inv_mass)
        z0 = PhasePoint(q=q, p=p0, logp=logp0, grad=grad0)
        h0 = energy(z0, inv_mass)

        def body(z, _):
            return leapfrog(logp_and_grad, z, eps, inv_mass), None

        z1, _ = jax.lax.scan(body, z0, None, length=num_leapfrog)
        h1 = energy(z1, inv_mass)
        dh = h1 - h0
        dh = jnp.where(jnp.isfinite(dh), dh, jnp.inf)
        accept_prob = jnp.minimum(1.0, jnp.exp(-dh))
        accepted = jax.random.uniform(k_acc) < accept_prob
        q_new = jnp.where(accepted, z1.q, z0.q)
        logp_new = jnp.where(accepted, z1.logp, z0.logp)
        return q_new, HMCInfo(
            accept_prob=accept_prob,
            accepted=accepted,
            logp=logp_new,
            energy=jnp.where(accepted, h1, h0),
        )

    return transition
