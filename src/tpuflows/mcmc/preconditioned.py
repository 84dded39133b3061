"""Flow-preconditioned targets: run MCMC in the flow's latent space.

Reference parity (SURVEY.md §2b row 14, §3.4): BAT.jl's flow-adaptive
transformed MCMC — the target is reparameterized through the trained flow,
so NUTS explores an approximately standard-normal geometry:

    logp~(z) = logp(f^-1(z)) + log|det d f^-1 / dz|

where `forward` of the flow maps data -> base (x -> z). The leapfrog
gradient therefore fuses flow-inverse + Jacobian + target log-density in
one XLA program (the north star's "vmapped log-prob + leapfrog +
flow-Jacobian kernels", BASELINE.json:5).
"""
from __future__ import annotations

from typing import Callable

import jax

from tpuflows.flows.core import Bijector


def flow_reparameterized(log_density: Callable, flow: Bijector) -> Callable:
    """Latent-space log density logp~(z); z may be (d,) or batched (..., d)."""

    def logp_tilde(z):
        x, ladj = flow.inverse_and_ladj(z)
        return log_density(x) + ladj

    return logp_tilde


def to_data_space(flow: Bijector, z_samples: jax.Array) -> jax.Array:
    """Map latent draws back to data space: x = f^-1(z)."""
    return flow.inverse(z_samples)


def to_latent_space(flow: Bijector, x_samples: jax.Array) -> jax.Array:
    return flow.forward(x_samples)
