"""Dense conditioner networks as pure pytrees.

Reference analog: Flux-style dense chains used as spline-parameter
conditioners inside RQSplineCouplingBlock (SURVEY.md §2a row 3). Built
nn-framework-free: an MLP is a tuple of (W, b) leaves, so the whole flow
stays one flat differentiable pytree and XLA fuses the conditioner matmuls
(MXU) with the surrounding coupling math.
"""
from __future__ import annotations

from typing import Sequence

import jax
import jax.numpy as jnp

from tpuflows.util.pytree import pytree_dataclass, static_field

_ACTIVATIONS = {
    "silu": jax.nn.silu,
    "tanh": jnp.tanh,
    "relu": jax.nn.relu,
    "gelu": jax.nn.gelu,
}


@pytree_dataclass
class MLP:
    """weights[i]: (d_in, d_out); biases[i]: (d_out,). Last layer linear."""

    weights: tuple
    biases: tuple
    activation: str = static_field(default="silu")

    def __call__(self, x: jax.Array) -> jax.Array:
        act = _ACTIVATIONS[self.activation]
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            # preferred_element_type pins MXU accumulation to f32 even if
            # activations are later cast to bf16.
            x = (
                jax.lax.dot_general(
                    x, w,
                    dimension_numbers=(((x.ndim - 1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                + b
            )
            if i + 1 < n:
                x = act(x)
        return x

    @staticmethod
    def init(
        key: jax.Array,
        sizes: Sequence[int],
        activation: str = "silu",
        final_zero: bool = True,
    ) -> "MLP":
        """He-init hidden layers; optionally zero-init the final layer so a
        fresh coupling block starts at (approximately) the identity map —
        the standard stable-start trick for flows."""
        ws, bs = [], []
        keys = jax.random.split(key, len(sizes) - 1)
        for i, (d_in, d_out) in enumerate(zip(sizes[:-1], sizes[1:])):
            last = i == len(sizes) - 2
            if last and final_zero:
                w = jnp.zeros((d_in, d_out), jnp.float32)
            else:
                scale = jnp.sqrt(2.0 / d_in)
                w = scale * jax.random.normal(keys[i], (d_in, d_out), jnp.float32)
            ws.append(w)
            bs.append(jnp.zeros((d_out,), jnp.float32))
        return MLP(weights=tuple(ws), biases=tuple(bs), activation=activation)
