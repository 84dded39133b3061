"""`build_flow` — default flow construction from samples.

Reference parity (SURVEY.md §2a row 2, §3.1): AdaptiveFlows.jl
`build_flow(samples; modules)` with the default module list
[input standardization, RQS coupling module].
"""
from __future__ import annotations

import jax

from tpuflows.flows.affine import AffineCoupling, Standardize
from tpuflows.flows.core import Chain
from tpuflows.flows.coupling import rqs_coupling_module
from tpuflows.util.shapes import alternating_mask


def build_flow(
    samples: jax.Array,
    key: jax.Array,
    kind: str = "rqs",
    n_blocks: int = 4,
    knots: int = 8,
    hidden: tuple = (64, 64),
    activation: str = "silu",
    use_pallas: bool = False,
) -> Chain:
    """Construct standardization + coupling-module flow fitted-to-start on an
    (N, d) sample matrix (forward maps data -> standard-normal base)."""
    dim = samples.shape[-1]
    std = Standardize.from_samples(samples)
    if kind == "rqs":
        module = rqs_coupling_module(
            key, dim, n_blocks=n_blocks, knots=knots, hidden=hidden,
            activation=activation, use_pallas=use_pallas,
        )
        blocks = module.transforms
    elif kind == "affine":
        keys = jax.random.split(key, n_blocks)
        blocks = tuple(
            AffineCoupling.init(
                keys[i], alternating_mask(dim, i % 2), hidden=hidden,
                activation=activation,
            )
            for i in range(n_blocks)
        )
    else:
        raise ValueError(f"unknown flow kind: {kind!r}")
    return Chain(transforms=(std, *blocks))
