"""Bijector protocol and flow composition.

Reference parity (SURVEY.md §2a row 2, §2b rows 10-11; the /root/reference
mount is empty — see SURVEY.md §0 — so citations are to the recalled public
repo structure documented there):
  - InverseFunctions.jl / ChangesOfVariables.jl `inverse(f)` /
    `with_logabsdet_jacobian(f, x)` -> the 4-method `Bijector` protocol here.
  - AdaptiveFlows.jl src/adaptive_flows.jl `AbstractFlow`, `CompositeFlow`,
    `build_flow` -> `Bijector`, `Chain`, `tpuflows.flows.build.build_flow`.
  - FunctionChains.jl `fchain` -> `Chain` (ladj accumulates through the
    composition).

Conventions (engine-wide):
  - `forward` maps DATA -> BASE (x -> z); training pushes samples to a
    standard normal base (forward KL). `inverse` maps BASE -> DATA.
  - Arrays are `(..., d)`: batch leading, features trailing (TPU lanes).
  - `ladj` is log|det dz/dx| summed over the feature axis; shape = batch
    shape. `inverse_and_ladj` returns log|det dx/dz| (so the two are exact
    negatives along a round trip).
  - A flow is a frozen pytree dataclass: array leaves are trainable params,
    static fields (masks, sizes) are jit-cache metadata.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from tpuflows.util.pytree import pytree_dataclass


class Bijector:
    """Protocol: implement `forward_and_ladj` and `inverse_and_ladj`."""

    def forward_and_ladj(self, x: jax.Array) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def inverse_and_ladj(self, z: jax.Array) -> Tuple[jax.Array, jax.Array]:
        raise NotImplementedError

    def forward(self, x: jax.Array) -> jax.Array:
        return self.forward_and_ladj(x)[0]

    def inverse(self, z: jax.Array) -> jax.Array:
        return self.inverse_and_ladj(z)[0]

    def __call__(self, x: jax.Array) -> jax.Array:
        return self.forward(x)


@pytree_dataclass
class Identity(Bijector):
    def forward_and_ladj(self, x):
        return x, jnp.zeros(x.shape[:-1], x.dtype)

    def inverse_and_ladj(self, z):
        return z, jnp.zeros(z.shape[:-1], z.dtype)


@pytree_dataclass
class Inverted(Bijector):
    """`inverse(f)` as a first-class object (InverseFunctions.jl parity)."""

    inner: Bijector

    def forward_and_ladj(self, x):
        return self.inner.inverse_and_ladj(x)

    def inverse_and_ladj(self, z):
        return self.inner.forward_and_ladj(z)


def inverse(b: Bijector) -> Bijector:
    if isinstance(b, Inverted):
        return b.inner
    return Inverted(inner=b)


def with_logabsdet_jacobian(b: Bijector, x: jax.Array):
    """ChangesOfVariables.jl-style free function."""
    return b.forward_and_ladj(x)


@pytree_dataclass
class Chain(Bijector):
    """Composition of bijectors; ladj accumulates (FunctionChains.fchain).

    Heterogeneous modules (standardize + alternating-mask couplings) make
    this a python-unrolled composition; block counts are small (<=16) so the
    unroll is cheap to trace and lets XLA fuse across blocks. Homogeneous
    stacks that want scan-based compilation use `ScannedRepeat` below.
    """

    transforms: tuple

    def forward_and_ladj(self, x):
        ladj = jnp.zeros(x.shape[:-1], x.dtype)
        for t in self.transforms:
            x, l = t.forward_and_ladj(x)
            ladj = ladj + l
        return x, ladj

    def inverse_and_ladj(self, z):
        ladj = jnp.zeros(z.shape[:-1], z.dtype)
        for t in reversed(self.transforms):
            z, l = t.inverse_and_ladj(z)
            ladj = ladj + l
        return z, ladj

    def append(self, *ts) -> "Chain":
        """Adaptive growth: append modules (reference append-module helper)."""
        return Chain(transforms=self.transforms + tuple(ts))

    def prepend(self, *ts) -> "Chain":
        return Chain(transforms=tuple(ts) + self.transforms)

    def __len__(self):
        return len(self.transforms)


@pytree_dataclass
class ScannedRepeat(Bijector):
    """N structurally-identical blocks applied via `lax.scan`.

    Stacked-leaf pytree (leading axis = block index) => one compiled block
    body regardless of depth: compile-time win for deep homogeneous stacks
    (SURVEY.md §2b row 11, "scan over homogeneous stacks").
    """

    stacked: Bijector  # every array leaf has leading axis n_blocks

    def _num_blocks(self):
        return jax.tree_util.tree_leaves(self.stacked)[0].shape[0]

    def forward_and_ladj(self, x):
        def body(carry, block):
            y, ladj = carry
            y, l = block.forward_and_ladj(y)
            return (y, ladj + l), None

        init = (x, jnp.zeros(x.shape[:-1], x.dtype))
        (y, ladj), _ = jax.lax.scan(body, init, self.stacked)
        return y, ladj

    def inverse_and_ladj(self, z):
        def body(carry, block):
            y, ladj = carry
            y, l = block.inverse_and_ladj(y)
            return (y, ladj + l), None

        init = (z, jnp.zeros(z.shape[:-1], z.dtype))
        (y, ladj), _ = jax.lax.scan(body, init, self.stacked, reverse=True)
        return y, ladj
