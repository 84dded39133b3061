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
    """weights[i]: (d_in, d_out); biases[i]: (d_out,). Last layer linear.

    compute_dtype="bf16" (opt-in) casts matmul OPERANDS to bfloat16 —
    halving their HBM traffic and unlocking the full-rate MXU path —
    while `preferred_element_type` keeps ACCUMULATION in f32 and
    activations/bias adds stay f32. Params remain f32 (the optimizer
    state and spline math never see bf16). The conditioner only shapes
    spline parameters, whose normalization (softmax/softplus) compresses
    small perturbations, so bf16 operand rounding perturbs the flow far
    below the 3-MC-sigma gates — but it DOES change bits, hence opt-in
    (default f32 keeps goldens and exact jnp-oracle matches)."""

    weights: tuple
    biases: tuple
    activation: str = static_field(default="silu")
    compute_dtype: str = static_field(default="f32")  # "f32" | "bf16"

    def __call__(self, x: jax.Array) -> jax.Array:
        act = _ACTIVATIONS[self.activation]
        bf16 = self.compute_dtype == "bf16"
        n = len(self.weights)
        for i, (w, b) in enumerate(zip(self.weights, self.biases)):
            lhs = x.astype(jnp.bfloat16) if bf16 else x
            rhs = w.astype(jnp.bfloat16) if bf16 else w
            # preferred_element_type pins accumulation to f32 either way
            x = (
                jax.lax.dot_general(
                    lhs, rhs,
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
        compute_dtype: str = "f32",
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
        return MLP(weights=tuple(ws), biases=tuple(bs), activation=activation,
                   compute_dtype=compute_dtype)
