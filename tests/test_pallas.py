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


def _fused_pair(d, knots=4, hidden=(16,), key=0, wscale=0.1):
    """(oracle block, fused block) with identical NON-zero conditioners."""
    import dataclasses

    from tpuflows.flows import RQSCouplingBlock
    from tpuflows.util.shapes import alternating_mask

    blk = RQSCouplingBlock.init(jax.random.key(key), alternating_mask(d, 0),
                                knots=knots, hidden=hidden)
    ws = list(blk.net.weights)
    ws[-1] = wscale * jax.random.normal(jax.random.key(key + 1),
                                        ws[-1].shape)
    net = dataclasses.replace(blk.net, weights=tuple(ws))
    blk = dataclasses.replace(blk, net=net)
    return blk, dataclasses.replace(blk, use_pallas="fused")


@pytest.mark.parametrize("d,batch", [(4, 37), (8, 256)])
def test_fused_coupling_forward_inverse_match_oracle(d, batch):
    """Whole-block fused kernel (kernels/coupling_pallas) vs the jnp block:
    conditioner matmul + spline + masked ladj reduce, incl. batch padding
    (batch=37 is not a TILE_B multiple)."""
    blk, fused = _fused_pair(d)
    x = 2.0 * jax.random.normal(jax.random.key(2), (batch, d))
    import dataclasses

    z_r, l_r = blk.forward_and_ladj(x)
    z_f, l_f = fused.forward_and_ladj(x)
    assert jnp.allclose(z_f, z_r, atol=1e-4)
    assert jnp.allclose(l_f, l_r, atol=1e-4)
    # inverse: the fused kernel shares _inv_tile_math with the elementwise
    # Pallas kernel (tight match); vs the oracle both carry the same f32
    # quadratic-formula formulation noise near bin edges (looser gate)
    elem = dataclasses.replace(blk, use_pallas=True)
    x_e, li_e = elem.inverse_and_ladj(z_r)
    x_f, li_f = fused.inverse_and_ladj(z_r)
    assert jnp.allclose(x_f, x_e, atol=1e-4)
    assert jnp.allclose(li_f, li_e, atol=1e-4)
    x_r, li_r = blk.inverse_and_ladj(z_r)
    assert jnp.allclose(x_f, x_r, atol=5e-3)
    assert jnp.allclose(li_f, li_r, atol=5e-3)
    # fused round-trip self-consistency is TIGHT (the correctness pillar)
    x_rt, li_rt = fused.inverse_and_ladj(z_f)
    assert jnp.allclose(x_rt, x, atol=1e-4)
    assert jnp.allclose(l_f + li_rt, jnp.zeros_like(l_f), atol=1e-4)


@pytest.mark.slow  # 4 interpret-mode Pallas grads (~65 s CPU); the fast
# tier keeps the fwd/inv value match + the elementwise-kernel VJP match
def test_fused_coupling_vjp_matches_oracle():
    """The fused block's single-kernel backward (weight cotangents
    accumulated across batch-tile grid steps) equals jax.grad of the
    oracle block for BOTH directions."""
    import dataclasses

    blk, fused = _fused_pair(6, key=5)
    x = 1.5 * jax.random.normal(jax.random.key(7), (160, 6))

    def loss(b, xx, inv):
        f = b.inverse_and_ladj if inv else b.forward_and_ladj
        z, l = f(xx)
        return jnp.sum(jnp.sin(z)) + jnp.sum(l * l)

    for inv in (False, True):
        g_r = jax.grad(lambda n: loss(
            dataclasses.replace(blk, net=n), x, inv))(blk.net)
        g_f = jax.grad(lambda n: loss(
            dataclasses.replace(fused, net=n), x, inv))(fused.net)
        # relative gate: grads reach O(300) summed over 160 rows, so f32
        # accumulation-order noise is O(1e-3) absolute
        rel = jax.tree_util.tree_map(
            lambda a, b: float(jnp.max(jnp.abs(a - b))
                               / (1.0 + jnp.max(jnp.abs(a)))), g_r, g_f)
        assert jax.tree_util.tree_reduce(max, rel) < 1e-4, (inv, rel)
        gx_r = jax.grad(lambda xx: loss(blk, xx, inv))(x)
        gx_f = jax.grad(lambda xx: loss(fused, xx, inv))(x)
        assert jnp.allclose(gx_f, gx_r, atol=1e-3), inv


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


def test_fused_kernel_honors_bf16_compute_dtype():
    """VERDICT r3 weak #5: MLP(compute_dtype="bf16") must change the fused
    kernel's matmul operands the same way it changes the jnp path — not be
    silently ignored. bf16 vs f32 outputs must differ (the flag acts) and
    the bf16 fused output must match the bf16 JNP path closely (same
    operand rounding, f32 accumulation)."""
    import dataclasses

    blk, fused = _fused_pair(6, key=9)
    net_bf = dataclasses.replace(blk.net, compute_dtype="bf16")
    blk_bf = dataclasses.replace(blk, net=net_bf)
    fused_bf = dataclasses.replace(fused, net=net_bf)
    x = 1.2 * jax.random.normal(jax.random.key(11), (128, 6))
    z_f32, _ = fused.forward_and_ladj(x)
    z_jnp_bf, l_jnp_bf = blk_bf.forward_and_ladj(x)
    z_fus_bf, l_fus_bf = fused_bf.forward_and_ladj(x)
    # the flag acts on the fused tier (was: silently ignored)
    assert not bool(jnp.allclose(z_fus_bf, z_f32, atol=1e-7))
    # and matches the jnp bf16 policy (same rounding, f32 accumulation) up
    # to fusion reassociation
    assert jnp.allclose(z_fus_bf, z_jnp_bf, atol=2e-3)
    assert jnp.allclose(l_fus_bf, l_jnp_bf, atol=2e-3)


def test_fused_logp_and_grad_matches_oracle():
    """kernels/fused_logp.py (whole leapfrog-gradient in one Pallas
    program): interpret-mode kernel equals jax.value_and_grad of the
    flow-reparameterized target; the unbatched path is the oracle itself."""
    from tpuflows.flows import build_flow
    from tpuflows.kernels.fused_logp import fused_latent_logp_and_grad
    from tpuflows.mcmc.preconditioned import flow_reparameterized
    from tpuflows.targets import NealsFunnel

    dim = 8
    target = NealsFunnel(dim=dim)
    init = jax.random.normal(jax.random.key(1), (64, dim), jnp.float32)
    flow = build_flow(init, jax.random.key(2), kind="affine", n_blocks=1,
                      hidden=(16, 16), mask_scheme="leading", clamp=8.0)
    logp = flow_reparameterized(target.log_density, flow)
    oracle = jax.vmap(jax.value_and_grad(logp))
    z = 0.8 * jax.random.normal(jax.random.key(4), (48, dim), jnp.float32)
    lp_o, g_o = oracle(z)

    fused = fused_latent_logp_and_grad(target.log_density, flow, tile_b=16,
                                       interpret=True)
    lp_f, g_f = jax.vmap(fused)(z)
    assert jnp.allclose(lp_f, lp_o, atol=1e-4)
    assert jnp.allclose(g_f, g_o, atol=1e-4)
    # unbatched call = plain value_and_grad (bitwise)
    lp1, g1 = fused(z[0])
    assert float(jnp.abs(lp1 - lp_o[0])) < 1e-5
    # works inside jit + vmap + scan (the NUTS usage pattern)
    def body(c, _):
        lp, g = jax.vmap(fused)(c)
        return c + 1e-3 * g, jnp.sum(lp)
    zz, lps = jax.jit(lambda z0: jax.lax.scan(body, z0, None, length=3))(z)
    assert bool(jnp.all(jnp.isfinite(zz))) and bool(jnp.all(jnp.isfinite(lps)))


def test_nuts_with_fused_logp_and_grad_matches_moments():
    """NUTSDriver(logp_and_grad=fused) samples the same distribution as the
    autodiff path (moment agreement on a small funnel; CPU batched path ==
    vmapped value_and_grad so draws are bitwise-equal here)."""
    from tpuflows.flows import build_flow
    from tpuflows.kernels.fused_logp import fused_latent_logp_and_grad
    from tpuflows.mcmc import NUTSDriver
    from tpuflows.mcmc.preconditioned import flow_reparameterized
    from tpuflows.targets import NealsFunnel

    dim = 4
    target = NealsFunnel(dim=dim)
    init = jax.random.normal(jax.random.key(1), (128, dim), jnp.float32)
    flow = build_flow(init, jax.random.key(2), kind="affine", n_blocks=1,
                      hidden=(16,), mask_scheme="leading", clamp=8.0)
    logp = flow_reparameterized(target.log_density, flow)
    fused = fused_latent_logp_and_grad(target.log_density, flow, tile_b=32)
    q0 = jax.random.normal(jax.random.key(3), (64, dim), jnp.float32)

    d_ref = NUTSDriver(logp, max_depth=5)
    d_fus = NUTSDriver(logp, max_depth=5, logp_and_grad=fused)
    st_r = d_ref.warmup(jax.random.key(5), q0, 64)
    st_f = d_fus.warmup(jax.random.key(5), q0, 64)
    _, z_r, _ = d_ref.draws(jax.random.key(6), st_r, 64)
    _, z_f, _ = d_fus.draws(jax.random.key(6), st_f, 64)
    # CPU fused batched path is exactly vmapped value_and_grad
    assert jnp.allclose(z_f, z_r, atol=1e-5)


def test_auto_kernel_policy_resolution():
    """use_pallas="auto" (the default) picks the fused kernel only on TPU
    with lane-aligned d (d % 128 == 0, the measured-win regime —
    docs/artifacts/coupling_block_bench.json); everywhere else it resolves
    to the XLA path. On this CPU-backed suite every auto block must
    resolve to False."""
    from tpuflows.flows import RQSCouplingBlock
    from tpuflows.util.shapes import alternating_mask

    on_tpu = jax.default_backend() == "tpu"
    for d in (8, 128):
        blk = RQSCouplingBlock.init(jax.random.key(0), alternating_mask(d, 0),
                                    knots=4, hidden=(16,))
        assert blk.use_pallas == "auto"
        expect = "fused" if (on_tpu and d % 128 == 0) else False
        assert blk._kernel_choice() == expect or (
            blk._kernel_choice() is False and expect is False)
        # single-vector calls (== each lane of an outer vmap) always take
        # the XLA path: a fused pallas_call under vmap is a per-chain
        # TILE_B-padded program (ADVICE r3 / round-4 guard)
        assert blk._kernel_choice(jnp.zeros((d,))) is False
    # explicit settings pass through untouched (batched inputs)
    import dataclasses
    blk = dataclasses.replace(blk, use_pallas="fused")
    assert blk._kernel_choice() == "fused"
    assert blk._kernel_choice(jnp.zeros((4, 128))) == "fused"
    assert blk._kernel_choice(jnp.zeros((128,))) is False
    blk = dataclasses.replace(blk, use_pallas=True)
    assert blk._kernel_choice() is True
