"""Pytree-dataclass plumbing.

The reference separates "structure" from "parameters" with Functors.@functor
(AdaptiveFlows.jl, SURVEY.md §2a rows 2-3). The JAX-native equivalent is a
frozen dataclass registered as a pytree: array fields are leaves (seen by
grad/optax/jit), `static_field()`s are hashable aux data baked into the jit
cache key (masks, sizes, activation names).
"""
from __future__ import annotations

import dataclasses
from typing import Any

import jax

_STATIC_MARK = "tpuflows_static"


def static_field(**kwargs: Any) -> Any:
    """Dataclass field treated as static pytree metadata (must be hashable)."""
    metadata = dict(kwargs.pop("metadata", {}) or {})
    metadata[_STATIC_MARK] = True
    return dataclasses.field(metadata=metadata, **kwargs)


def pytree_dataclass(cls: type | None = None):
    """Decorator: frozen dataclass registered as a JAX pytree.

    Fields declared with `static_field()` become metadata; everything else is
    pytree data. Works with jax.grad / optax / vmap / jit out of the box.
    """

    def wrap(c: type) -> type:
        c = dataclasses.dataclass(frozen=True)(c)
        data_fields = []
        meta_fields = []
        for f in dataclasses.fields(c):
            if f.metadata.get(_STATIC_MARK, False):
                meta_fields.append(f.name)
            else:
                data_fields.append(f.name)
        jax.tree_util.register_dataclass(
            c, data_fields=data_fields, meta_fields=meta_fields
        )
        return c

    if cls is None:
        return wrap
    return wrap(cls)


def replace(obj: Any, **changes: Any) -> Any:
    """dataclasses.replace that works on our frozen pytree dataclasses."""
    return dataclasses.replace(obj, **changes)
