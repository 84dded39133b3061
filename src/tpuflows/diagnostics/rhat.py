"""Split Gelman-Rubin R-hat.

Reference parity (SURVEY.md §2b row 18): BAT.jl's Gelman-Rubin convergence
diagnostic, used by the burn-in cycles and reported by the bench harness.
"""
from __future__ import annotations

import jax.numpy as jnp


def split_rhat(samples: jnp.ndarray) -> jnp.ndarray:
    """samples: (n_draws, n_chains, d) -> (d,) split-R-hat."""
    n, m, d = samples.shape
    half = n // 2
    # split each chain in two -> 2m chains of length half
    x = jnp.concatenate(
        [samples[:half], samples[half : 2 * half]], axis=1
    )  # (half, 2m, d)
    nn = half
    chain_mean = jnp.mean(x, axis=0)  # (2m, d)
    chain_var = jnp.var(x, axis=0, ddof=1)  # (2m, d)
    w = jnp.mean(chain_var, axis=0)
    b = nn * jnp.var(chain_mean, axis=0, ddof=1)
    var_plus = (nn - 1.0) / nn * w + b / nn
    return jnp.sqrt(var_plus / w)
