"""Fused whole-transition NUTS kernel (kernels/nuts_pallas.py).

Three-level trust chain (mcmc/nuts.py remains the semantic oracle):
  1. plain-XLA `_transition_math` samples the right distribution
     (moment gates on a diag-normal vs truth),
  2. the Pallas kernel (interpret mode on CPU) is BITWISE-equal to the
     plain-XLA math — same jaxpr, different executor,
  3. it drives NUTSDriver end-to-end (warmup adaptation + draws).
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflows.kernels.nuts_pallas import make_fused_nuts_transition
from tpuflows.targets import DiagNormal


def _target():
    return DiagNormal(loc=jnp.array([1.0, -1.0, 0.5, 0.0]),
                      scale=jnp.array([1.0, 0.5, 2.0, 1.0]))


def test_fused_math_samples_correct_moments():
    t = _target()
    d, n = 4, 256
    trans = make_fused_nuts_transition(lambda x, p: t.log_density(x), (),
                                       max_depth=6, interpret=False)
    eps = jnp.asarray(0.4)
    im = jnp.asarray([1.0, 0.25, 4.0, 1.0], jnp.float32)
    q = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)

    @jax.jit
    def step(key, q):
        return trans(jax.random.split(key, n), q, eps, im)

    xs = []
    for i in range(400):
        q, info = step(jax.random.fold_in(jax.random.key(1), i), q)
        if i >= 80:
            xs.append(np.asarray(q))
    x = np.concatenate(xs, 0)
    tm = np.asarray(t.mean())
    ts = np.asarray(jnp.sqrt(jnp.diagonal(t.cov())))
    # chains are independent; thinned pooled draws ~ n_eff >= n * T / 5
    se = ts / np.sqrt(n * len(xs) / 5.0)
    assert np.all(np.abs(x.mean(0) - tm) < 5 * se), (x.mean(0), tm)
    np.testing.assert_allclose(x.std(0), ts, rtol=0.06)
    assert float(jnp.mean(info.accept_prob)) > 0.6


def test_fused_kernel_bitwise_matches_math():
    """Interpret-mode Pallas == plain-XLA math on every output, including
    tree sizes and depths — same jaxpr, different executor (also covers
    row padding: n % tile_b != 0)."""
    t = _target()
    d, n = 4, 20
    eps = jnp.asarray(0.4)
    im = jnp.ones((d,), jnp.float32)
    q = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    keys = jax.random.split(jax.random.key(1), n)
    logp = lambda x, p: t.log_density(x)  # noqa: E731
    t_math = make_fused_nuts_transition(logp, (), max_depth=4, tile_b=8,
                                        interpret=False)
    t_pall = make_fused_nuts_transition(logp, (), max_depth=4, tile_b=8,
                                        interpret=True)
    q_m, i_m = t_math(keys, q, eps, im)
    q_p, i_p = t_pall(keys, q, eps, im)
    assert jnp.array_equal(q_m, q_p)
    assert jnp.array_equal(i_m.num_steps, i_p.num_steps)
    assert jnp.array_equal(i_m.tree_depth, i_p.tree_depth)
    assert jnp.array_equal(i_m.logp, i_p.logp)
    assert jnp.array_equal(i_m.diverging, i_p.diverging)


def test_fused_transition_with_flow_params():
    """Flow parameters ride as call-time operands (the preconditioned
    path): transition through a trained-ish affine flow mixes and returns
    finite diagnostics."""
    from tpuflows.flows import build_flow
    from tpuflows.kernels.nuts_pallas import fused_nuts_for_flow
    from tpuflows.targets import NealsFunnel

    dim, n = 8, 64
    target = NealsFunnel(dim=dim)
    init = jax.random.normal(jax.random.key(1), (256, dim), jnp.float32)
    flow = build_flow(init, jax.random.key(2), kind="affine", n_blocks=1,
                      hidden=(16,), mask_scheme="leading", clamp=8.0)
    trans = fused_nuts_for_flow(target.log_density, flow, max_depth=5)
    q = jax.random.normal(jax.random.key(3), (n, dim), jnp.float32)
    keys = jax.random.split(jax.random.key(4), n)
    q1, info = jax.jit(trans)(keys, q, jnp.asarray(0.3),
                              jnp.ones((dim,), jnp.float32))
    assert q1.shape == (n, dim)
    assert bool(jnp.all(jnp.isfinite(q1)))
    assert bool(jnp.all(info.num_steps >= 1))
    assert float(jnp.mean(info.accept_prob)) > 0.2


def test_tile_flow_matches_reference_inverse():
    """kernels/tile_flow (2-D p-major spline layout for in-kernel use)
    reproduces the generic flow inverse bitwise on arqs chains."""
    from tpuflows.flows import build_flow
    from tpuflows.kernels.tile_flow import (
        permute_for_tiles,
        tile_inverse_and_ladj,
    )

    flow = build_flow(jax.random.normal(jax.random.key(1), (256, 16)),
                      jax.random.key(2), kind="arqs", n_blocks=2, knots=8,
                      hidden=(32, 32), mask_scheme="mixed", clamp=8.0,
                      use_pallas=False)
    z = jax.random.normal(jax.random.key(3), (64, 16))
    x_ref, l_ref = flow.inverse_and_ladj(z)
    fp = permute_for_tiles(flow)
    x_t, l_t = tile_inverse_and_ladj(fp, z)
    assert jnp.array_equal(x_t, x_ref)
    assert jnp.allclose(l_t, l_ref, atol=1e-5)
    # fused transition through an arqs flow (CPU plain-XLA path) mixes
    from tpuflows.kernels.nuts_pallas import fused_nuts_for_flow
    from tpuflows.targets import NealsFunnel

    t = NealsFunnel(dim=16)
    trans = fused_nuts_for_flow(t.log_density, flow, max_depth=5)
    q = jax.random.normal(jax.random.key(5), (32, 16))
    q1, info = jax.jit(trans)(jax.random.split(jax.random.key(6), 32), q,
                              jnp.asarray(0.2), jnp.ones((16,)))
    assert bool(jnp.all(jnp.isfinite(q1)))
    assert bool(jnp.all(info.num_steps >= 1))


def test_window_math_samples_correct_moments():
    """The streaming multi-transition window (`_window_math` — per-chain
    state machine, one leapfrog per chain per tick) samples the same
    distribution as the per-transition kernel: moment gates on the diag
    normal. Continuation across windows via draws[-1]."""
    from tpuflows.kernels.nuts_pallas import make_fused_nuts_window

    t = _target()
    d, n, S = 4, 256, 8
    win = make_fused_nuts_window(lambda x, p: t.log_density(x), (),
                                 window=S, max_depth=5, interpret=False)
    eps = jnp.asarray(0.4)
    im = jnp.asarray([1.0, 0.25, 4.0, 1.0], jnp.float32)
    q = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    wj = jax.jit(win)
    xs = []
    for i in range(50):
        draws, info = wj(jax.random.fold_in(jax.random.key(1), i), q,
                         eps, im)
        q = draws[-1]
        if i >= 10:
            xs.append(np.asarray(draws).reshape(-1, d))
    x = np.concatenate(xs, 0)
    tm = np.asarray(t.mean())
    ts = np.asarray(jnp.sqrt(jnp.diagonal(t.cov())))
    se = ts / np.sqrt(x.shape[0] / 5.0)
    assert np.all(np.abs(x.mean(0) - tm) < 5 * se), (x.mean(0), tm)
    np.testing.assert_allclose(x.std(0), ts, rtol=0.06)
    assert float(jnp.mean(info.accept_prob)) > 0.6
    assert bool(jnp.all(info.num_steps >= 1))


def test_window_kernel_bitwise_matches_math_and_drives_driver():
    """Interpret-mode Pallas window == plain-XLA window math on every
    output (incl. row padding), and NUTSDriver(window_transition=...)
    produces correctly shaped, continuable draws."""
    from tpuflows.kernels.nuts_pallas import make_fused_nuts_window
    from tpuflows.mcmc import NUTSDriver

    t = _target()
    d, n, S = 4, 20, 4
    eps = jnp.asarray(0.4)
    im = jnp.ones((d,), jnp.float32)
    q = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    logp = lambda x, p: t.log_density(x)  # noqa: E731
    w_m = make_fused_nuts_window(logp, (), window=S, max_depth=4,
                                 tile_b=8, interpret=False)
    w_p = make_fused_nuts_window(logp, (), window=S, max_depth=4,
                                 tile_b=8, interpret=True)
    dm, i_m = w_m(jax.random.key(1), q, eps, im)
    dp, i_p = w_p(jax.random.key(1), q, eps, im)
    assert jnp.array_equal(dm, dp)
    assert jnp.array_equal(i_m.num_steps, i_p.num_steps)
    assert jnp.array_equal(i_m.tree_depth, i_p.tree_depth)
    assert jnp.array_equal(i_m.logp, i_p.logp)
    assert jnp.array_equal(i_m.diverging, i_p.diverging)

    drv = NUTSDriver(t.log_density, max_depth=4, window_transition=w_m)
    st = drv.warmup(jax.random.key(2),
                    jax.random.normal(jax.random.key(3), (64, d)), 150)
    st2, z, info = drv.draws(jax.random.key(4), st, 2 * S, chunk_size=S)
    assert z.shape == (2 * S, 64, d)
    assert info.num_steps.shape == (2 * S, 64)
    # continuation: next window starts from the last draw
    assert jnp.array_equal(st2.q, z[-1])
    with pytest.raises(ValueError):
        drv.draws(jax.random.key(5), st, S + 1)  # not a window multiple


def test_streamed_logp_grad_matches_whole_chain_vjp():
    """tile_flow.tile_logp_and_grad_streamed (per-block remat backward —
    the round-5 VMEM fix that lifts the fused-transition spline tile cap)
    equals the whole-chain trace-time jax.vjp on an arqs chain."""
    from tpuflows.flows import build_flow
    from tpuflows.kernels.tile_flow import (
        permute_for_tiles,
        tile_inverse_and_ladj,
        tile_logp_and_grad_streamed,
    )
    from tpuflows.targets import NealsFunnel

    t = NealsFunnel(dim=16)
    flow = build_flow(jax.random.normal(jax.random.key(1), (256, 16)),
                      jax.random.key(2), kind="arqs", n_blocks=3, knots=8,
                      hidden=(32, 32), mask_scheme="mixed", clamp=8.0,
                      use_pallas=False)
    fp = permute_for_tiles(flow)
    z = jax.random.normal(jax.random.key(3), (64, 16))

    def whole(zz):
        x, ladj = tile_inverse_and_ladj(fp, zz)
        return (t.log_density(x) + ladj)[:, None]

    lp_ref, pull = jax.vjp(whole, z)
    (g_ref,) = pull(jnp.ones_like(lp_ref))
    lp_s, g_s = jax.jit(
        lambda zz: tile_logp_and_grad_streamed(fp, zz, t.log_density))(z)
    np.testing.assert_allclose(np.asarray(lp_s), np.asarray(lp_ref),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(g_s), np.asarray(g_ref),
                               rtol=1e-5, atol=1e-5)


def test_driver_with_fused_transition():
    """NUTSDriver(transition=...) warms up (pooled DA + Welford) and draws;
    the result passes a loose moment check on the diag normal."""
    from tpuflows.mcmc import NUTSDriver

    t = _target()
    d, n = 4, 128
    trans = make_fused_nuts_transition(lambda x, p: t.log_density(x), (),
                                       max_depth=6, interpret=False)
    drv = NUTSDriver(t.log_density, max_depth=6, transition=trans)
    q0 = jax.random.normal(jax.random.key(0), (n, d), jnp.float32)
    st = drv.warmup(jax.random.key(1), q0, 200)
    assert 0.05 < float(st.step_size) < 5.0
    _, z, info = drv.draws(jax.random.key(2), st, 200)
    x = np.asarray(z.reshape(-1, d))
    tm = np.asarray(t.mean())
    ts = np.asarray(jnp.sqrt(jnp.diagonal(t.cov())))
    se = ts / np.sqrt(x.shape[0] / 5.0)
    assert np.all(np.abs(x.mean(0) - tm) < 5 * se)
    np.testing.assert_allclose(x.std(0), ts, rtol=0.12)
    # per-chain adaptation is incompatible with the batched kernel
    with pytest.raises(ValueError):
        NUTSDriver(t.log_density, transition=trans,
                   per_chain_step_size=True)
