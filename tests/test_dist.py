"""Distributed runtime tests on the 8-virtual-device CPU mesh
(tests/conftest.py): real shard_map/psum/all_gather code paths — the
fake-backend layer the reference lacks (SURVEY.md §4)."""
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpuflows.dist import (
    WORKERS,
    optimize_flow_dp,
    resample_sharded,
    run_nuts_sharded,
    worker_mesh,
)
from tpuflows.flows import build_flow, negll_flow_loss
from tpuflows.smc import SMCConfig, run_smc, systematic_indices
from tpuflows.targets import DiagNormal, NealsFunnel


@pytest.fixture(scope="module")
def mesh():
    return worker_mesh(8)


def test_resample_sharded_matches_local(mesh):
    """The distributed systematic resampler draws the SAME global
    ancestors as the single-device one (shard-count independence)."""
    n, d = 256, 3
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (n, d))
    log_w = jax.random.normal(jax.random.key(2), (n,))

    idx_local = systematic_indices(key, log_w)
    x_local = jnp.take(x, idx_local, axis=0)

    def body(key, x, log_w):
        (out,), anc = resample_sharded(key, (x,), log_w)
        return out, anc

    f = jax.jit(shard_map(
        body, mesh=mesh,
        in_specs=(P(), P(WORKERS), P(WORKERS)),
        out_specs=(P(WORKERS), P(WORKERS)),
        check_vma=False,
    ))
    x_dist, anc = f(key, x, log_w)
    assert jnp.array_equal(jnp.asarray(anc), idx_local)
    assert jnp.allclose(jnp.asarray(x_dist), x_local)


@pytest.mark.parametrize("n_shards", [1, 2, 4, 8])
@pytest.mark.parametrize("weights", ["balanced", "degenerate"])
def test_resample_exchange_matches_gather(n_shards, weights):
    """ppermute block exchange == all_gather path == single-device take,
    at every shard count, including fully degenerate weights (all mass on
    one shard => hops spans the ring)."""
    n, d = 64, 3
    key = jax.random.key(0)
    x = jax.random.normal(jax.random.key(1), (n, d))
    if weights == "balanced":
        log_w = 0.1 * jax.random.normal(jax.random.key(2), (n,))
    else:
        # all mass on the LAST shard's particles
        log_w = jnp.where(jnp.arange(n) >= n - n // max(n_shards, 2),
                          0.0, -100.0)
    mesh = worker_mesh(n_shards)

    idx_local = systematic_indices(key, log_w)
    x_local = jnp.take(x, idx_local, axis=0)

    def body(gather):
        def f(key, x, log_w):
            (out,), anc = resample_sharded(key, (x,), log_w,
                                           gather_particles=gather)
            return out, anc
        return jax.jit(shard_map(
            f, mesh=mesh,
            in_specs=(P(), P(WORKERS), P(WORKERS)),
            out_specs=(P(WORKERS), P(WORKERS)),
            check_vma=False,
        ))

    x_g, anc_g = body(True)(key, x, log_w)
    x_e, anc_e = body(False)(key, x, log_w)
    assert jnp.array_equal(jnp.asarray(anc_e), idx_local)
    assert jnp.allclose(jnp.asarray(x_e), x_local)
    assert jnp.allclose(jnp.asarray(x_e), jnp.asarray(x_g))


def test_resample_exchange_pytree_payload():
    """Exchange path carries a multi-leaf pytree (positions + cached
    log-densities) by the same ancestors."""
    n, d = 32, 2
    mesh = worker_mesh(4)
    key = jax.random.key(3)
    x = jax.random.normal(jax.random.key(4), (n, d))
    lp = jax.random.normal(jax.random.key(5), (n,))
    log_w = jax.random.normal(jax.random.key(6), (n,))

    idx = systematic_indices(key, log_w)

    def f(key, x, lp, log_w):
        (xo, lpo), _ = resample_sharded(key, (x, lp), log_w,
                                        gather_particles=False)
        return xo, lpo

    xo, lpo = jax.jit(shard_map(
        f, mesh=mesh,
        in_specs=(P(), P(WORKERS), P(WORKERS), P(WORKERS)),
        out_specs=(P(WORKERS), P(WORKERS)),
        check_vma=False,
    ))(key, x, lp, log_w)
    assert jnp.allclose(jnp.asarray(xo), jnp.take(x, idx, axis=0))
    assert jnp.allclose(jnp.asarray(lpo), jnp.take(lp, idx, axis=0))


def test_optimize_flow_dp_trains(mesh):
    target = DiagNormal(loc=jnp.array([1.0, -1.0]), scale=jnp.array([0.5, 2.0]))
    samples = target.sample(jax.random.key(0), 2048)
    flow = build_flow(samples, jax.random.key(1), kind="affine", n_blocks=2,
                      hidden=(16,))
    loss0 = negll_flow_loss(flow, samples)
    res = optimize_flow_dp(jax.random.key(2), samples, flow, mesh,
                           nbatches=4, nepochs=30)
    loss1 = negll_flow_loss(res.result, samples)
    assert float(loss1) < float(loss0)
    # fit quality: pushforward of samples ~ standard normal
    z = res.result.forward(samples)
    assert jnp.allclose(jnp.mean(z, 0), jnp.zeros(2), atol=0.15)
    assert jnp.allclose(jnp.std(z, 0), jnp.ones(2), atol=0.15)


def test_run_nuts_sharded_moments(mesh):
    target = DiagNormal(loc=jnp.array([2.0, -1.0]), scale=jnp.array([1.0, 0.5]))
    q0 = jax.random.normal(jax.random.key(0), (32, 2))
    res = run_nuts_sharded(jax.random.key(1), target.log_density, q0, mesh,
                           num_warmup=200, num_samples=200)
    s = jnp.asarray(res.samples).reshape(-1, 2)
    assert jnp.allclose(jnp.mean(s, 0), target.mean(), atol=0.2)
    assert jnp.allclose(jnp.std(s, 0), jnp.array([1.0, 0.5]), atol=0.2)


def test_run_smc_sharded_matches_single(mesh):
    """Sharded SMC: same ladder behavior and statistically matching
    moments/logZ vs the single-device path."""
    dim = 2
    target = DiagNormal(loc=jnp.array([1.0, 0.0]), scale=jnp.array([1.5, 0.7]))
    init = jax.random.normal(jax.random.key(0), (512, dim))
    flow = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2,
                      hidden=(16,))
    cfg = SMCConfig(n_particles=1024, n_mutation_steps=2, n_leapfrog=5,
                    max_stages=40)
    res_s = run_smc(jax.random.key(2), target.log_density, flow, dim, cfg)
    res_d = run_smc(jax.random.key(2), target.log_density, flow, dim, cfg,
                    mesh=mesh)
    assert float(res_d.betas[-1]) == 1.0
    assert abs(float(res_d.log_z) - float(res_s.log_z)) < 0.3
    m_d = jnp.mean(jnp.asarray(res_d.particles), 0)
    assert jnp.allclose(m_d, target.mean(), atol=0.25)
