"""Pallas RQS kernel vs the pure-jnp oracle (SURVEY.md §4: kernels tested
against flows/rqs_ref to machine precision, incl. the custom_vjp backward).
Runs in interpret mode on the CPU test mesh; the same code path compiles
via Mosaic on TPU."""
import jax
import jax.numpy as jnp
import pytest

from tpuflows.flows import rqs_ref
from tpuflows.kernels import rqs_pallas


def _mk(key, shape, K=8):
    kx, kp = jax.random.split(jax.random.key(key))
    x = 6.0 * jax.random.normal(kx, shape)  # covers in-range + tails
    raw = jax.random.normal(kp, (*shape, 3 * K - 1))
    return x, raw


@pytest.mark.parametrize("shape", [(64, 8), (33, 3), (7, 129)])
def test_forward_matches_oracle(shape):
    x, raw = _mk(0, shape)
    y_ref, l_ref = rqs_ref.rqs_forward_from_raw(x, raw)
    y_pal, l_pal = rqs_pallas.rqs_forward_from_raw(x, raw)
    assert jnp.allclose(y_pal, y_ref, atol=1e-4)
    assert jnp.allclose(l_pal, l_ref, atol=1e-4)


@pytest.mark.parametrize("shape", [(64, 8), (33, 3)])
def test_inverse_matches_oracle(shape):
    y, raw = _mk(1, shape)
    x_ref, l_ref = rqs_ref.rqs_inverse_from_raw(y, raw)
    x_pal, l_pal = rqs_pallas.rqs_inverse_from_raw(y, raw)
    assert jnp.allclose(x_pal, x_ref, atol=1e-4)
    assert jnp.allclose(l_pal, l_ref, atol=1e-4)


def test_roundtrip():
    x, raw = _mk(2, (32, 16))
    y, lf = rqs_pallas.rqs_forward_from_raw(x, raw)
    x2, li = rqs_pallas.rqs_inverse_from_raw(y, raw)
    assert jnp.allclose(x2, x, atol=1e-4)
    assert jnp.allclose(lf + li, jnp.zeros_like(lf), atol=1e-4)


def test_custom_vjp_matches_oracle_grads():
    x, raw = _mk(3, (16, 4), K=4)

    def loss_ref(x, raw):
        y, l = rqs_ref.rqs_forward_from_raw(x, raw)
        return jnp.sum(jnp.sin(y)) + jnp.sum(l * l)

    def loss_pal(x, raw):
        y, l = rqs_pallas.rqs_forward_from_raw(x, raw)
        return jnp.sum(jnp.sin(y)) + jnp.sum(l * l)

    gx_r, gr_r = jax.grad(loss_ref, argnums=(0, 1))(x, raw)
    gx_p, gr_p = jax.grad(loss_pal, argnums=(0, 1))(x, raw)
    assert jnp.allclose(gx_p, gx_r, atol=1e-4)
    assert jnp.allclose(gr_p, gr_r, atol=1e-4)


def test_custom_vjp_inverse_grads():
    y, raw = _mk(4, (16, 4), K=4)

    def loss(mod, y, raw):
        x, l = mod.rqs_inverse_from_raw(y, raw)
        return jnp.sum(x * x) - jnp.sum(l)

    gy_r, gr_r = jax.grad(lambda a, b: loss(rqs_ref, a, b), (0, 1))(y, raw)
    gy_p, gr_p = jax.grad(lambda a, b: loss(rqs_pallas, a, b), (0, 1))(y, raw)
    assert jnp.allclose(gy_p, gy_r, atol=1e-4)
    assert jnp.allclose(gr_p, gr_r, atol=1e-4)


def test_coupling_block_use_pallas_end_to_end():
    """A use_pallas coupling block agrees with the jnp path and trains."""
    from tpuflows.flows import RQSCouplingBlock

    key = jax.random.key(0)
    mask = (1, 0, 1, 0)
    blk_ref = RQSCouplingBlock.init(key, mask, knots=4, hidden=(16,))
    blk_pal = RQSCouplingBlock.init(key, mask, knots=4, hidden=(16,),
                                    use_pallas=True)
    x = jax.random.normal(jax.random.key(1), (32, 4))
    z_r, l_r = blk_ref.forward_and_ladj(x)
    z_p, l_p = blk_pal.forward_and_ladj(x)
    assert jnp.allclose(z_p, z_r, atol=1e-4)
    assert jnp.allclose(l_p, l_r, atol=1e-4)
    x_r, li_r = blk_ref.inverse_and_ladj(z_r)
    x_p, li_p = blk_pal.inverse_and_ladj(z_p)
    assert jnp.allclose(x_p, x_r, atol=1e-4)
    assert jnp.allclose(li_p, li_r, atol=1e-4)
