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
     fetched either with one `all_gather` of the (n_local, d) shard
     blocks + local take (`gather_particles=True`; fine for small
     payloads), or with the bidirectional-ring `ppermute` block exchange
     (`gather_particles=False`, `sharded_take_exchange`): O(n_local * d)
     memory always, O(hops * n_local * d) traffic with hops == 1 under
     balanced weights — the config-5 path (64k x 256-d across hosts).

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


def sharded_take_exchange(tree, anc: jax.Array,
                          axis_name: str = WORKERS):
    """Fetch rows at GLOBAL indices `anc` via bidirectional ring ppermute.

    Never materializes the global array: per-shard memory stays
    O(n_local * d) and traffic is O(hops * n_local * d), where `hops` is
    the ring distance to the farthest shard any output slot's ancestor
    lives on — globally agreed via `pmax`, so every shard executes the
    same number of `ppermute` rounds (a `lax.while_loop` whose condition
    is replicated). Systematic ancestors are monotone in the output slot,
    so under the roughly-balanced weights an ESS-triggered resampler sees,
    ancestors live on the same or adjacent shard and hops == 1; a fully
    degenerate weight vector (all mass on one shard) still resolves
    exactly with hops == n_shards // 2.

    This is the SURVEY.md §7 "hard part 2" / §2c `ppermute` collective:
    config 5's 64k x 256-d particle exchange costs 64 MB/device under the
    all_gather path but only ~2 x (n_local x d) = 2 MB/device here.
    """
    r = jax.lax.axis_index(axis_name)
    n_shards = jax.lax.axis_size(axis_name)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    n_local = leaves[0].shape[0]

    src_shard = anc // n_local  # (n_local,) shard holding each ancestor
    src_local = anc % n_local
    # ring distance from this shard to each ancestor's shard
    fwd = (src_shard - r) % n_shards
    dist = jnp.minimum(fwd, n_shards - fwd)
    hops = jax.lax.pmax(jnp.max(dist), axis_name)

    fwd_perm = [(s, (s - 1) % n_shards) for s in range(n_shards)]
    bwd_perm = [(s, (s + 1) % n_shards) for s in range(n_shards)]

    def take_from(out_leaves, buf_leaves, cur_shard):
        sel = src_shard == cur_shard
        new = []
        for out, buf in zip(out_leaves, buf_leaves):
            rows = jnp.take(buf, src_local, axis=0)
            mask = sel.reshape(sel.shape + (1,) * (rows.ndim - 1))
            new.append(jnp.where(mask, rows, out))
        return new

    # hop 0: own block
    out_leaves = [jnp.zeros((n_local,) + l.shape[1:], l.dtype)
                  for l in leaves]
    out_leaves = take_from(out_leaves, leaves, r)

    def cond(carry):
        t = carry[0]
        return t <= hops

    def body(carry):
        t, buf_f, buf_b, out = carry
        # after t rotations, buf_f holds shard (r + t)'s block,
        # buf_b holds shard (r - t)'s block
        buf_f = [jax.lax.ppermute(b, axis_name, fwd_perm) for b in buf_f]
        buf_b = [jax.lax.ppermute(b, axis_name, bwd_perm) for b in buf_b]
        out = take_from(out, buf_f, (r + t) % n_shards)
        out = take_from(out, buf_b, (r - t) % n_shards)
        return (t + 1, buf_f, buf_b, out)

    if n_shards > 1:
        _, _, _, out_leaves = jax.lax.while_loop(
            cond, body, (jnp.asarray(1, hops.dtype), list(leaves),
                         list(leaves), out_leaves)
        )
    return jax.tree_util.tree_unflatten(treedef, out_leaves)


def resample_sharded(key: jax.Array, particles, log_w: jax.Array,
                     axis_name: str = WORKERS,
                     gather_particles: bool = True):
    """Systematic resampling of row-sharded particles.

    `particles` may be a pytree of arrays sharing the leading local
    particle axis (e.g. positions + cached densities) — every leaf is
    gathered by the SAME ancestors. Returns (particles_tree, anc).

    `gather_particles=True` fetches ancestors with one all_gather (fine for
    small payloads); `False` uses the ppermute block exchange
    (`sharded_take_exchange`) — O(n_local * d) memory and, under balanced
    weights, O(n_local * d) traffic; identical results either way."""
    with jax.named_scope("resample_ancestors"):
        anc = sharded_ancestors(key, log_w, axis_name)
    if gather_particles:
        out = jax.tree_util.tree_map(
            lambda a: sharded_take(a, anc, axis_name), particles
        )
    else:
        out = sharded_take_exchange(particles, anc, axis_name)
    return out, anc
