"""Whitening bijector and shaped-variate transforms.

Reference parity: SURVEY.md §2a row 4 (scale-shift/whitening) and §2b
row 13 (ValueShapes.jl shaped<->flat variate transforms).
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpuflows.flows import Whiten
from tpuflows.targets import CorrelatedGaussian
from tpuflows.util.shapes import VariateShape


def test_whiten_round_trip_and_ladj():
    t = CorrelatedGaussian.ar1(6, rho=0.8)
    x = t.sample(jax.random.key(0), 512)
    w = Whiten.from_samples(x)
    z, ladj = w.forward_and_ladj(x)
    x2, ladj_inv = w.inverse_and_ladj(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x),
                               rtol=1e-4, atol=1e-4)
    np.testing.assert_allclose(np.asarray(ladj + ladj_inv), 0.0, atol=1e-4)
    # ladj matches autodiff log|det J| on a single variate
    j = jax.jacfwd(w.forward)(x[0])
    _, logdet = jnp.linalg.slogdet(j)
    np.testing.assert_allclose(float(ladj[0]), float(logdet), rtol=1e-4)


def test_whiten_decorrelates():
    t = CorrelatedGaussian.ar1(8, rho=0.9)
    x = t.sample(jax.random.key(0), 8192)
    z = Whiten.from_samples(x).forward(x)
    cov = np.cov(np.asarray(z).T)
    np.testing.assert_allclose(cov, np.eye(8), atol=0.1)


def test_variate_shape_round_trip():
    example = {"mu": jnp.zeros(()), "sigma": jnp.zeros((3,)),
               "W": jnp.zeros((2, 2))}
    vs = VariateShape(example)
    assert vs.dim == 1 + 3 + 4
    vec = jnp.arange(2 * 5 * 8, dtype=jnp.float32).reshape(2, 5, 8)
    tree = vs.unflatten(vec)
    assert tree["W"].shape == (2, 5, 2, 2)
    assert tree["sigma"].shape == (2, 5, 3)
    back = vs.flatten(tree)
    np.testing.assert_array_equal(np.asarray(back), np.asarray(vec))


def test_variate_shape_flat_log_density_jits():
    example = {"a": jnp.zeros((2,)), "b": jnp.zeros(())}
    vs = VariateShape(example)

    def shaped_logp(p):
        return -0.5 * jnp.sum(p["a"] ** 2) - 0.5 * p["b"] ** 2

    logp = vs.flat_log_density(shaped_logp)
    x = jnp.array([1.0, 2.0, 3.0])
    expected = -0.5 * (1 + 4) - 0.5 * 9
    np.testing.assert_allclose(float(jax.jit(logp)(x)), expected, rtol=1e-6)
    # vmaps over batches
    xb = jnp.stack([x, 2 * x])
    out = jax.vmap(logp)(xb)
    assert out.shape == (2,)
