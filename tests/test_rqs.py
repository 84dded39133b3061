"""RQ-spline math: monotonicity, tails, round-trip, ladj vs autodiff
(SURVEY.md §4; MonotonicSplines.jl parity per SURVEY.md §2b row 9)."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflows.flows import rqs_ref


def random_raw(key, shape, K):
    return 1.5 * jax.random.normal(key, (*shape, 3 * K - 1))


@pytest.mark.parametrize("K", [4, 8])
def test_roundtrip(K):
    key = jax.random.key(0)
    raw = random_raw(key, (128, 3), K)
    x = jax.random.uniform(jax.random.key(1), (128, 3), minval=-6.0, maxval=6.0)
    y, lf = rqs_ref.rqs_forward_from_raw(x, raw)
    x2, li = rqs_ref.rqs_inverse_from_raw(y, raw)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=5e-3, rtol=5e-3)
    np.testing.assert_allclose(np.asarray(lf + li), 0.0, atol=2e-2)


def test_identity_tails():
    raw = random_raw(jax.random.key(2), (16, 2), 6)
    x = jnp.array([[-5.0, 7.0]] * 16)
    y, ladj = rqs_ref.rqs_forward_from_raw(x, raw)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x))
    np.testing.assert_allclose(np.asarray(ladj), 0.0)


def test_monotone_and_boundary_continuity():
    raw = random_raw(jax.random.key(3), (1, 1), 8)
    xs = jnp.linspace(-4.0, 4.0, 513)[:, None]
    raw_b = jnp.broadcast_to(raw, (513, 1, 23))
    y, _ = rqs_ref.rqs_forward_from_raw(xs, raw_b)
    dy = jnp.diff(y[:, 0])
    assert np.all(np.asarray(dy) > 0), "spline must be strictly increasing"
    # continuity at +/-B with identity tails
    np.testing.assert_allclose(np.asarray(y[0, 0]), -4.0, atol=1e-5)
    np.testing.assert_allclose(np.asarray(y[-1, 0]), 4.0, atol=1e-5)


def test_ladj_matches_autodiff_derivative():
    raw = random_raw(jax.random.key(4), (64, 1), 8)
    x = jax.random.uniform(jax.random.key(5), (64, 1), minval=-3.9, maxval=3.9)

    y, ladj = rqs_ref.rqs_forward_from_raw(x, raw)

    def f_scalar(xi, ri):
        yy, _ = rqs_ref.rqs_forward_from_raw(xi[None, None], ri[None, None, :])
        return yy[0, 0]

    for i in range(8):
        d_ad = jax.grad(f_scalar)(x[i, 0], raw[i, 0])
        np.testing.assert_allclose(
            np.asarray(ladj[i, 0]), np.log(np.asarray(d_ad)), atol=2e-4, rtol=2e-4
        )


def test_gradients_finite_everywhere():
    """No NaN grads, even for tail inputs (the where-clamp guard)."""
    raw = random_raw(jax.random.key(6), (32, 2), 6)
    x = jnp.concatenate(
        [
            jax.random.uniform(jax.random.key(7), (16, 2), minval=-3.9, maxval=3.9),
            jax.random.uniform(jax.random.key(8), (16, 2), minval=5.0, maxval=9.0),
        ]
    )

    def loss(raw, x):
        y, l = rqs_ref.rqs_forward_from_raw(x, raw)
        return jnp.sum(y) + jnp.sum(l)

    g_raw, g_x = jax.grad(loss, argnums=(0, 1))(raw, x)
    assert np.all(np.isfinite(np.asarray(g_raw)))
    assert np.all(np.isfinite(np.asarray(g_x)))
