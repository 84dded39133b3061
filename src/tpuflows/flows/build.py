"""`build_flow` — default flow construction from samples.

Reference parity (SURVEY.md §2a row 2, §3.1): AdaptiveFlows.jl
`build_flow(samples; modules)` with the default module list
[input standardization, RQS coupling module].
"""
from __future__ import annotations

import jax

from tpuflows.flows.affine import AffineCoupling, Standardize
from tpuflows.flows.core import Chain
from tpuflows.flows.coupling import RQSCouplingBlock
from tpuflows.util.shapes import alternating_mask, block_mask


def build_flow(
    samples: jax.Array,
    key: jax.Array,
    kind: str = "rqs",
    n_blocks: int = 4,
    knots: int = 8,
    hidden: tuple = (64, 64),
    activation: str = "silu",
    use_pallas: object = "auto",
    mask_scheme: str = "alternating",
    clamp: float = 4.0,
    n_leading: int = 1,
    modules=None,
) -> Chain:
    """Construct standardization + coupling-module flow fitted-to-start on an
    (N, d) sample matrix (forward maps data -> standard-normal base).

    `modules`: the reference's user-supplied module list
    (`build_flow(samples; modules=[...])`, SURVEY.md §2a row 2). Each item
    is either a ready Bijector (used as-is) or a callable
    `(samples, key) -> Bijector` (fitted/initialized from the samples, e.g.
    `Standardize.from_samples` wrapped, or a partial of
    `RQSCouplingBlock.init`). When given, `kind`/`n_blocks`/masks are
    ignored and the chain is exactly the listed modules.

    mask_scheme: "alternating" = checkerboard only; "mixed" cycles
    checkerboard-even/odd and first/second-half block masks — block masks
    let a conditioner see leading dims whole, which is what hierarchical /
    funnel-style targets (global scale in dim 0) need for an exact fit;
    "leading" passes the first `n_leading` dims through and transforms the
    rest, conditioned on them — with kind="affine" and a wide `clamp` this
    family contains hierarchical scale targets (e.g. Neal's funnel: the
    exact transport is x_rest = exp(v/2) z_rest, i.e. ONE leading-mask
    affine coupling; bench.py uses exactly this).

    clamp: log-scale soft-clamp for affine couplings. The default +-4 covers
    e^{+-4}=55x dynamic range; funnel-style targets need the clamp to cover
    the scale range at the v-prior's tails (bench: +-8)."""
    dim = samples.shape[-1]

    if modules is not None:
        keys = jax.random.split(key, max(len(modules), 1))
        built = tuple(
            m if hasattr(m, "forward_and_ladj") else m(samples, keys[i])
            for i, m in enumerate(modules)
        )
        return Chain(transforms=built)

    std = Standardize.from_samples(samples)

    def mask_for(i: int):
        if mask_scheme == "alternating":
            return alternating_mask(dim, i % 2)
        if mask_scheme == "mixed":
            kind = i % 4
            if kind < 2:
                return alternating_mask(dim, kind)
            return block_mask(dim, kind - 2)
        if mask_scheme == "leading":
            # pass the global/scale dims, transform the rest; alternate with
            # the complement so stacked blocks also transform the leaders
            lead = tuple(1 if j < n_leading else 0 for j in range(dim))
            if i % 2 == 0:
                return lead
            return tuple(1 - m for m in lead)
        raise ValueError(f"unknown mask_scheme: {mask_scheme!r}")
    if kind == "rqs":
        keys = jax.random.split(key, n_blocks)
        blocks = tuple(
            RQSCouplingBlock.init(
                keys[i], mask_for(i), knots=knots, hidden=hidden,
                activation=activation, use_pallas=use_pallas,
            )
            for i in range(n_blocks)
        )
    elif kind == "arqs":
        # Affine+RQS hybrid: each layer pairs an affine coupling (unbounded
        # scale — carries heavy tails / funnel-style dynamic range that a
        # bounded spline's identity tails cannot express) with an RQS block
        # (flexible shape inside the spline window), same mask so the pair
        # acts on the same dims before the mask alternates.
        keys = jax.random.split(key, 2 * n_blocks)
        blocks = []
        for i in range(n_blocks):
            mask = mask_for(i)
            blocks.append(
                AffineCoupling.init(keys[2 * i], mask, hidden=hidden,
                                    activation=activation, clamp=clamp)
            )
            blocks.append(
                RQSCouplingBlock.init(
                    keys[2 * i + 1], mask, knots=knots, hidden=hidden,
                    activation=activation, use_pallas=use_pallas,
                )
            )
        blocks = tuple(blocks)
    elif kind == "affine":
        keys = jax.random.split(key, n_blocks)
        blocks = tuple(
            AffineCoupling.init(
                keys[i], mask_for(i), hidden=hidden,
                activation=activation, clamp=clamp,
            )
            for i in range(n_blocks)
        )
    else:
        raise ValueError(f"unknown flow kind: {kind!r}")
    return Chain(transforms=(std, *blocks))
