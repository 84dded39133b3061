"""Affine-invariant ensemble sampler (Goodman & Weare stretch move).

Reference parity (SURVEY.md §2b row 14/15): BAT.jl's ensemble-sampling
support (`bat_sample` with ensemble/partitioned sampling; the Julia
ecosystem's AffineInvariantMCMC / emcee-style samplers BAT interoperates
with). Ensembles are the natural companion to the tempered-ensemble
adaptive-flow work the reference targets: many coupled walkers explore a
target without gradients, and the walker cloud is exactly the sample matrix
`optimize_flow` trains on.

TPU design: the classic red-black scheme — walkers split into two fixed
halves, each half moves in lockstep against the other half — makes the
whole ensemble update two dense vectorized blocks per step (no sequential
walker loop, no gathers with dynamic shapes). Everything runs inside one
`lax.scan`; a (steps x walkers) batch of stretch draws and partner indices
is generated inside the scan from per-step keys, so memory stays O(walkers).

Stretch move (Goodman & Weare 2010): partner x_j from the other half,
proposal y = x_j + z (x_k - x_j) with z ~ g(z) propto 1/sqrt(z) on
[1/a, a] (sampled as z = ((a-1) u + 1)^2 / a), accepted with probability
min(1, z^(d-1) p(y)/p(x_k)).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp


class EnsembleResult(NamedTuple):
    samples: jax.Array  # (num_samples, n_walkers, d) post-warmup states
    accept_rate: jax.Array  # scalar mean acceptance over sampling phase
    final_walkers: jax.Array  # (n_walkers, d)


def _half_step(key, movers, others, log_density, logp_movers, a):
    """Stretch-move update of `movers` (m, d) against `others` (m2, d)."""
    m = movers.shape[0]
    d = movers.shape[-1]
    k_z, k_j, k_u = jax.random.split(key, 3)
    u = jax.random.uniform(k_z, (m,))
    z = ((a - 1.0) * u + 1.0) ** 2 / a
    j = jax.random.randint(k_j, (m,), 0, others.shape[0])
    partners = others[j]
    prop = partners + z[:, None] * (movers - partners)
    logp_prop = log_density(prop)
    log_accept = (d - 1.0) * jnp.log(z) + logp_prop - logp_movers
    accepted = jnp.log(jax.random.uniform(k_u, (m,))) < log_accept
    movers = jnp.where(accepted[:, None], prop, movers)
    logp_movers = jnp.where(accepted, logp_prop, logp_movers)
    return movers, logp_movers, accepted


def run_ensemble(
    key: jax.Array,
    log_density: Callable,
    walkers0: jax.Array,
    num_warmup: int = 200,
    num_samples: int = 500,
    a: float = 2.0,
) -> EnsembleResult:
    """Run the affine-invariant ensemble on (n_walkers, d) initial states.

    n_walkers must be even (red-black halves) and should be >= 2*d for
    healthy mixing. Gradient-free: works on non-differentiable targets,
    the one regime where NUTS/HMC (mcmc.sample) cannot.
    """
    n_walkers, d = walkers0.shape
    if n_walkers % 2 != 0:
        raise ValueError("n_walkers must be even")
    half = n_walkers // 2

    def step(carry, k):
        w, logp = carry
        k1, k2 = jax.random.split(k)
        w_a, w_b = w[:half], w[half:]
        lp_a, lp_b = logp[:half], logp[half:]
        w_a, lp_a, acc_a = _half_step(k1, w_a, w_b, log_density, lp_a, a)
        w_b, lp_b, acc_b = _half_step(k2, w_b, w_a, log_density, lp_b, a)
        w = jnp.concatenate([w_a, w_b], axis=0)
        logp = jnp.concatenate([lp_a, lp_b], axis=0)
        acc = jnp.mean(jnp.concatenate([acc_a, acc_b]).astype(jnp.float32))
        return (w, logp), (w, acc)

    @jax.jit
    def run(key, w0):
        logp0 = log_density(w0)
        keys = jax.random.split(key, num_warmup + num_samples)
        (wf, _), (traj, acc) = jax.lax.scan(step, (w0, logp0), keys)
        return traj[num_warmup:], jnp.mean(acc[num_warmup:]), wf

    samples, accept_rate, final_walkers = run(key, walkers0)
    return EnsembleResult(samples=samples, accept_rate=accept_rate,
                          final_walkers=final_walkers)
