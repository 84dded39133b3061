"""No-U-Turn Sampler: iterative multinomial NUTS, vmap-able, fixed max depth.

Reference parity (SURVEY.md §2b row 14): AdvancedHMC.jl's multinomial NUTS
with tree doubling, generalized U-turn criterion, and divergence handling,
as driven by BAT.jl's HamiltonianMC. Config 4 (BASELINE.json:10) runs 1024
vmapped chains of this kernel on one chip.

TPU-first formulation (SURVEY.md §7 hard part 1): the textbook recursive
tree doubling is data-dependent recursion — untraceable. Here the tree is
built ITERATIVELY with O(max_depth) memory:

  - The doubling loop and the within-subtree leapfrog loop are
    `lax.while_loop`s, so the compiled program is O(1) in trajectory length
    (1 leapfrog body, not 2^max_depth inlined copies) and vmap lifts them to
    masked lockstep execution across chains (chains that stop early idle
    until the batch's slowest tree finishes — the documented tradeoff).
  - Sub-tree U-turn checks use the O(max_depth) checkpoint scheme: leaves
    are numbered within each doubling; a leaf with (0-based) index s stores
    its momentum and the pre-leaf momentum prefix-sum at checkpoint slot
    popcount(s) when s is even; after leaf n-1 (n even), every complete
    binary subtree ending at that leaf corresponds to one checkpoint slot in
    the contiguous range [popcount(n)-1, popcount(n)-2+trailing_zeros(n)],
    and all those U-turn conditions are evaluated VECTORIZED over the
    max_depth slots (branchless — no per-subtree control flow).
  - Progressive multinomial sampling within subtrees; biased progressive
    acceptance across doublings; generalized U-turn criterion on momentum
    sums (rho) with the diagonal metric.

Divergence: delta-energy > max_delta_energy (Stan's 1000) marks the leaf
divergent; the subtree and trajectory stop, the divergent leaf is excluded
from the proposal weights.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from tpuflows.mcmc.hmc import PhasePoint, kinetic, leapfrog


def _popcount32(x: jax.Array) -> jax.Array:
    x = x - ((x >> 1) & 0x55555555)
    x = (x & 0x33333333) + ((x >> 2) & 0x33333333)
    x = (x + (x >> 4)) & 0x0F0F0F0F
    return (x * 0x01010101) >> 24


def _trailing_zeros32(x: jax.Array) -> jax.Array:
    return _popcount32((x & -x) - 1)


class NUTSInfo(NamedTuple):
    accept_prob: jax.Array  # mean MH-style accept stat over the trajectory
    num_steps: jax.Array  # leapfrog steps taken
    tree_depth: jax.Array
    diverging: jax.Array
    turning: jax.Array
    energy: jax.Array  # H0 of the transition
    logp: jax.Array  # log density at the new position


class _Subtree(NamedTuple):
    z_end: PhasePoint  # outermost phase point (trajectory continuation)
    q_prop: jax.Array
    logp_prop: jax.Array
    logw: jax.Array  # log sum of leaf weights
    rho: jax.Array  # sum of leaf momenta
    turning: jax.Array
    diverging: jax.Array
    sum_accept: jax.Array
    n_leaf: jax.Array  # leaves actually evaluated


def _is_turning(p_left, p_right, rho, inv_mass):
    """Generalized U-turn: rho . v <= 0 at either boundary (v = M^-1 p)."""
    v = rho * inv_mass
    return jnp.logical_or(
        jnp.sum(v * p_left, axis=-1) <= 0.0,
        jnp.sum(v * p_right, axis=-1) <= 0.0,
    )


def make_nuts_kernel(
    log_density: Callable,
    max_depth: int = 8,
    max_delta_energy: float = 1000.0,
    logp_and_grad: Callable | None = None,
):
    """Build transition(key, q, eps, inv_mass) -> (q_new, NUTSInfo).

    Single chain on a (d,) vector; vmap over chains. `eps` scalar,
    `inv_mass` (d,) are shared adaptation parameters.

    `logp_and_grad(q) -> (logp, grad)` overrides the default
    `jax.value_and_grad(log_density)` — the hook for the fused Pallas
    leapfrog-gradient (kernels/fused_logp.py), whose custom_vmap rule
    turns the caller's per-chain vmap into ONE batched device program.
    """
    if logp_and_grad is None:
        logp_and_grad = jax.value_and_grad(log_density)
    neg_inf = jnp.asarray(-jnp.inf, jnp.float32)

    def build_subtree(key, z0, direction, n_leaves, h0, eps, inv_mass, d):
        """Integrate up to n_leaves leapfrogs from z0 in `direction`."""
        eps_signed = direction * eps

        def cond(c):
            (_, leaf_idx, _, _, _, logw, _, turning, diverging, *_rest) = c
            return (leaf_idx < n_leaves) & ~turning & ~diverging

        def body(c):
            (key, leaf_idx, z, q_prop, logp_prop, logw, rho_sum, turning,
             diverging, sum_accept, r_ck, rs_ck) = c
            key, k_take = jax.random.split(key)
            z_new = leapfrog(logp_and_grad, z, eps_signed, inv_mass)
            h = -z_new.logp + kinetic(z_new.p, inv_mass)
            dh = h - h0
            dh = jnp.where(jnp.isfinite(dh), dh, jnp.inf)
            div = dh > max_delta_energy
            logw_leaf = jnp.where(div, neg_inf, -dh)
            accept = jnp.minimum(1.0, jnp.exp(jnp.minimum(-dh, 0.0)))
            accept = jnp.where(jnp.isfinite(accept), accept, 0.0)
            logw_new = jnp.logaddexp(logw, logw_leaf)
            # progressive multinomial draw within the subtree
            take = jnp.log(jax.random.uniform(k_take)) < logw_leaf - logw_new
            take = take & ~div
            q_prop = jnp.where(take, z_new.q, q_prop)
            logp_prop = jnp.where(take, z_new.logp, logp_prop)

            # -- checkpoint store (even leaf indices start subtrees) -------
            # Branchless one-hot write: `slot` is a per-chain traced index,
            # so dynamic_update_slice/indexing here would vmap into TPU
            # scatter/gather with n_chains distinct indices — measured 188x
            # slower than the leapfrog itself (docs/perf.md). A one-hot
            # select over the max_depth slot axis is pure VPU work.
            slot = _popcount32(leaf_idx)
            store = (leaf_idx % 2) == 0
            write = ((jnp.arange(max_depth) == slot) & store)[:, None]
            r_ck = jnp.where(write, z_new.p[None, :], r_ck)
            rs_ck = jnp.where(write, rho_sum[None, :], rs_ck)  # prefix BEFORE leaf

            rho_new = rho_sum + z_new.p

            # -- vectorized U-turn checks over ending binary subtrees ------
            n = leaf_idx + 1
            tz = _trailing_zeros32(n)
            pc = _popcount32(n)
            idx_min = pc - 1
            idx_max = pc - 2 + tz  # inclusive; empty range when n odd (tz=0)
            slots = jnp.arange(max_depth)
            valid = (slots >= idx_min) & (slots <= idx_max) & ((n % 2) == 0)
            rho_k = rho_new[None, :] - rs_ck  # (max_depth, d)
            turn_k = _is_turning(r_ck, z_new.p[None, :], rho_k, inv_mass)
            turning_new = turning | jnp.any(valid & turn_k)

            return (key, leaf_idx + 1, z_new, q_prop, logp_prop, logw_new,
                    rho_new, turning_new, div, sum_accept + accept, r_ck, rs_ck)

        init = (
            key,
            jnp.asarray(0, jnp.int32),
            z0,
            z0.q,
            z0.logp,
            neg_inf,
            jnp.zeros((d,), jnp.float32),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(0.0, jnp.float32),
            jnp.zeros((max_depth, d), jnp.float32),
            jnp.zeros((max_depth, d), jnp.float32),
        )
        (_, leaf_idx, z, q_prop, logp_prop, logw, rho_sum, turning, diverging,
         sum_accept, _, _) = jax.lax.while_loop(cond, body, init)
        return _Subtree(
            z_end=z, q_prop=q_prop, logp_prop=logp_prop, logw=logw,
            rho=rho_sum, turning=turning, diverging=diverging,
            sum_accept=sum_accept, n_leaf=leaf_idx,
        )

    def _transition(key, q, eps, inv_mass):
        with jax.named_scope("nuts_transition"):
            return transition(key, q, eps, inv_mass)

    def transition(key, q, eps, inv_mass):
        d = q.shape[-1]
        k_mom, k_loop = jax.random.split(key)
        logp0, grad0 = logp_and_grad(q)
        p0 = jax.random.normal(k_mom, q.shape, q.dtype) / jnp.sqrt(inv_mass)
        z0 = PhasePoint(q=q, p=p0, logp=logp0, grad=grad0)
        h0 = -logp0 + kinetic(p0, inv_mass)

        def cond(c):
            (_, depth, _, _, _, _, _, _, _, _, turning, diverging, _, _) = c
            return (depth < max_depth) & ~turning & ~diverging

        def body(c):
            (key, depth, z_left, z_right, q_prop, logp_prop, logw, rho,
             _depth_final, n_steps, turning, diverging, sum_accept,
             n_accum) = c
            key, k_dir, k_sub, k_acc = jax.random.split(key, 4)
            direction = jnp.where(
                jax.random.bernoulli(k_dir), 1.0, -1.0
            ).astype(q.dtype)
            z_start = jax.tree_util.tree_map(
                lambda a, b: jnp.where(direction > 0, a, b), z_right, z_left
            )
            st = build_subtree(
                k_sub, z_start, direction, jnp.asarray(2, jnp.int32) ** depth,
                h0, eps, inv_mass, d,
            )
            ok = ~st.turning & ~st.diverging
            # biased progressive acceptance across doublings
            acc_p = jnp.minimum(1.0, jnp.exp(st.logw - logw))
            take = ok & (jax.random.uniform(k_acc) < acc_p)
            q_prop = jnp.where(take, st.q_prop, q_prop)
            logp_prop = jnp.where(take, st.logp_prop, logp_prop)

            # merge endpoints only if the subtree is valid (else we stop and
            # the endpoints are irrelevant)
            z_right_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok & (direction > 0), new, old),
                st.z_end, z_right,
            )
            z_left_new = jax.tree_util.tree_map(
                lambda new, old: jnp.where(ok & (direction < 0), new, old),
                st.z_end, z_left,
            )
            logw_new = jnp.where(ok, jnp.logaddexp(logw, st.logw), logw)
            rho_new = jnp.where(ok, rho + st.rho, rho)
            turning_comb = _is_turning(
                z_left_new.p, z_right_new.p, rho_new, inv_mass
            )
            turning_new = st.turning | (ok & turning_comb)

            return (key, depth + 1, z_left_new, z_right_new, q_prop,
                    logp_prop, logw_new, rho_new,
                    jnp.where(ok, depth + 1, depth), n_steps + st.n_leaf,
                    turning_new, st.diverging, sum_accept + st.sum_accept,
                    n_accum + st.n_leaf)

        init = (
            k_loop,
            jnp.asarray(0, jnp.int32),
            z0,
            z0,
            q,
            logp0,
            jnp.asarray(0.0, jnp.float32),
            p0,
            jnp.asarray(0, jnp.int32),
            jnp.asarray(0, jnp.int32),
            jnp.asarray(False),
            jnp.asarray(False),
            jnp.asarray(0.0, jnp.float32),
            jnp.asarray(0, jnp.int32),
        )
        (_, _, _, _, q_prop, logp_prop, _, _, depth_final, n_steps, turning,
         diverging, sum_accept, n_accum) = jax.lax.while_loop(cond, body, init)

        info = NUTSInfo(
            accept_prob=sum_accept / jnp.maximum(n_accum.astype(jnp.float32), 1.0),
            num_steps=n_steps,
            tree_depth=depth_final,
            diverging=diverging,
            turning=turning,
            energy=h0,
            logp=logp_prop,
        )
        return q_prop, info

    return _transition
