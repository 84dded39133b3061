"""Core bijector invariants (SURVEY.md §4 assertion kind 1):
round-trip exactness and ladj vs brute-force autodiff Jacobian."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflows.flows import (
    AffineCoupling,
    Chain,
    Standardize,
    build_flow,
    inverse,
    rqs_coupling_module,
    with_logabsdet_jacobian,
)
from tpuflows.util.shapes import alternating_mask


def brute_force_ladj(f, x):
    """log|det J| of f at a single point x via jax.jacfwd."""
    jac = jax.jacfwd(lambda v: f(v))(x)
    sign, logdet = jnp.linalg.slogdet(jac)
    return logdet


def make_flows(dim, key):
    k1, k2, k3 = jax.random.split(key, 3)
    samples = 2.0 + 0.5 * jax.random.normal(k1, (256, dim))
    return {
        "standardize": Standardize.from_samples(samples),
        "affine_coupling": AffineCoupling.init(
            k2, alternating_mask(dim, 0), hidden=(16, 16)
        ),
        "rqs_module": rqs_coupling_module(k3, dim, n_blocks=2, knots=6, hidden=(16,)),
        "built": build_flow(samples, k3, n_blocks=2, knots=5, hidden=(16,)),
    }


@pytest.mark.parametrize("dim", [2, 5])
@pytest.mark.parametrize(
    "name", ["standardize", "affine_coupling", "rqs_module", "built"]
)
def test_roundtrip_and_ladj(dim, name):
    key = jax.random.key(0)
    flow = make_flows(dim, key)[name]
    x = jax.random.normal(jax.random.key(1), (64, dim)) * 1.5

    z, ladj_f = flow.forward_and_ladj(x)
    x2, ladj_i = flow.inverse_and_ladj(z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-3, rtol=1e-3)
    # ladjs are exact negatives along the round trip
    np.testing.assert_allclose(
        np.asarray(ladj_f + ladj_i), 0.0, atol=1e-3
    )

    # ladj vs autodiff jacobian at a few points (the key spline-math oracle)
    for i in range(4):
        ladj_ad = brute_force_ladj(flow.forward, x[i])
        np.testing.assert_allclose(
            np.asarray(ladj_f[i]), np.asarray(ladj_ad), atol=1e-3, rtol=1e-3
        )


def test_inverse_wrapper_and_wlaj():
    key = jax.random.key(2)
    flow = make_flows(3, key)["rqs_module"]
    x = jax.random.normal(jax.random.key(3), (8, 3))
    inv = inverse(flow)
    z, l1 = with_logabsdet_jacobian(flow, x)
    x2, l2 = with_logabsdet_jacobian(inv, z)
    np.testing.assert_allclose(np.asarray(x2), np.asarray(x), atol=1e-4)
    assert inverse(inv) is flow


def test_chain_append_prepend():
    key = jax.random.key(4)
    f = make_flows(4, key)
    chain = Chain(transforms=(f["standardize"],))
    grown = chain.append(*f["rqs_module"].transforms)
    assert len(grown) == 3
    grown2 = grown.prepend(f["affine_coupling"])
    assert len(grown2) == 4
    x = jax.random.normal(jax.random.key(5), (16, 4))
    z, ladj = grown2.forward_and_ladj(x)
    assert z.shape == x.shape and ladj.shape == (16,)


def test_flow_is_pytree_and_jittable():
    key = jax.random.key(6)
    flow = make_flows(4, key)["built"]
    leaves = jax.tree_util.tree_leaves(flow)
    assert all(hasattr(l, "dtype") for l in leaves)
    fwd = jax.jit(lambda f, x: f.forward_and_ladj(x))
    x = jax.random.normal(jax.random.key(7), (8, 4))
    z, ladj = fwd(flow, x)
    assert z.shape == (8, 4)


def test_scanned_repeat_matches_chain():
    """ScannedRepeat (stacked-leaf scan) == Chain of the same blocks."""
    import jax
    from tpuflows.flows import AffineCoupling, Chain, ScannedRepeat

    mask = (1, 0, 1, 0)
    keys = jax.random.split(jax.random.key(0), 3)
    blocks = [
        AffineCoupling.init(k, mask, hidden=(8,)) for k in keys
    ]
    # perturb params so blocks differ (zero-init final layers are identity)
    blocks = [
        jax.tree_util.tree_map(
            lambda a, i=i: a + 0.01 * (i + 1), b
        ) for i, b in enumerate(blocks)
    ]
    chain = Chain(transforms=tuple(blocks))
    stacked = jax.tree_util.tree_map(
        lambda *xs: jnp.stack(xs), *blocks
    )
    rep = ScannedRepeat(stacked=stacked)
    x = jax.random.normal(jax.random.key(1), (16, 4))
    zc, lc = chain.forward_and_ladj(x)
    zr, lr = rep.forward_and_ladj(x)
    assert jnp.allclose(zr, zc, atol=1e-6)
    assert jnp.allclose(lr, lc, atol=1e-6)
    xc, li = rep.inverse_and_ladj(zr)
    assert jnp.allclose(xc, x, atol=1e-5)
    assert jnp.allclose(li, -lr, atol=1e-5)


def test_mlp_bf16_compute_policy():
    """Opt-in bf16 conditioner compute (flows/nets.py): matmul operands in
    bfloat16, accumulation and params f32. The output tracks the f32 net
    to bf16 rounding; the coupling round-trip stays EXACT because the
    inverse evaluates the same conditioner on the same pass-through bits."""
    import dataclasses

    import jax
    import jax.numpy as jnp

    from tpuflows.flows import RQSCouplingBlock
    from tpuflows.flows.nets import MLP

    net = MLP.init(jax.random.key(0), (8, 32, 8), final_zero=False)
    x = jax.random.normal(jax.random.key(1), (64, 8))
    y32 = net(x)
    net16 = dataclasses.replace(net, compute_dtype="bf16")
    y16 = net16(x)
    assert y16.dtype == jnp.float32  # f32 accumulation/output
    err = jnp.max(jnp.abs(y16 - y32)) / (1.0 + jnp.max(jnp.abs(y32)))
    assert 0 < float(err) < 2e-2  # bf16 has ~8 mantissa bits

    blk = RQSCouplingBlock.init(jax.random.key(2), (1, 0, 1, 0, 1, 0, 1, 0),
                                knots=4, hidden=(16,))
    ws = list(blk.net.weights)
    ws[-1] = 0.1 * jax.random.normal(jax.random.key(3), ws[-1].shape)
    blk = dataclasses.replace(
        blk, net=dataclasses.replace(blk.net, weights=tuple(ws),
                                     compute_dtype="bf16"))
    z, ladj_f = blk.forward_and_ladj(x)
    x2, ladj_i = blk.inverse_and_ladj(z)
    assert jnp.allclose(x2, x, atol=1e-4)
    assert jnp.allclose(ladj_f, -ladj_i, atol=1e-4)
