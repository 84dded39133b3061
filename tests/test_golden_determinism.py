"""Golden values (SURVEY.md §4 assertion kind 2) and determinism
guarantees (SURVEY.md §5 — the TPU-side replacement for race detection:
same seed => bitwise-same results, independent of sharding)."""
import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P
from jax import shard_map

from tpuflows.dist import WORKERS, worker_mesh
from tpuflows.dist.resample import resample_sharded
from tpuflows.flows import build_flow, rqs_ref
from tpuflows.mcmc import run_nuts
from tpuflows.smc import systematic_indices
from tpuflows.targets import NealsFunnel


def test_golden_rqs_values():
    """Hardcoded spline outputs for a fixed input (guards silent numerical
    regressions in normalize/search/eval). Values recorded from the
    pure-jnp oracle at commit time (f32)."""
    x = jnp.array([[-5.0, -1.25, 0.0, 0.75, 3.9]])
    raw = jnp.asarray(
        0.35 * jnp.sin(jnp.arange(5 * 11, dtype=jnp.float32)).reshape(1, 5, 11)
    )  # K = 4
    y, ladj = rqs_ref.rqs_forward_from_raw(x, raw)
    y_expected = jnp.array(
        [[-5.0, 0.43955922, 0.6390989, -0.88805735, 3.892031]]
    )
    l_expected = jnp.array(
        [[0.0, 0.23752192, 0.00656199, -0.22391734, 0.14844733]]
    )
    assert jnp.allclose(y, y_expected, atol=1e-5), y
    assert jnp.allclose(ladj, l_expected, atol=1e-5), ladj
    # exact analytic inverse round-trips the goldens
    x2, l2 = rqs_ref.rqs_inverse_from_raw(y, raw)
    assert jnp.allclose(x2, x, atol=1e-5)
    assert jnp.allclose(l2, -ladj, atol=1e-5)


def test_nuts_deterministic_same_seed():
    t = NealsFunnel(dim=4)
    q0 = jax.random.normal(jax.random.key(0), (8, 4)) * 0.3
    r1 = run_nuts(jax.random.key(7), t.log_density, q0,
                  num_warmup=50, num_samples=50)
    r2 = run_nuts(jax.random.key(7), t.log_density, q0,
                  num_warmup=50, num_samples=50)
    assert jnp.array_equal(r1.samples, r2.samples)  # bitwise
    r3 = run_nuts(jax.random.key(8), t.log_density, q0,
                  num_warmup=50, num_samples=50)
    assert not jnp.array_equal(r1.samples, r3.samples)


def test_training_deterministic_same_seed():
    samples = jax.random.normal(jax.random.key(0), (512, 4))
    import optax

    from tpuflows.flows import optimize_flow

    flow = build_flow(samples, jax.random.key(1), kind="rqs", n_blocks=2,
                      knots=4, hidden=(16,))
    r1 = optimize_flow(jax.random.key(2), samples, flow, optax.adam(1e-3),
                       nbatches=4, nepochs=5)
    r2 = optimize_flow(jax.random.key(2), samples, flow, optax.adam(1e-3),
                       nbatches=4, nepochs=5)
    assert jnp.array_equal(r1.loss_hist, r2.loss_hist)


def test_resampler_shard_count_invariant():
    """Systematic ancestors are identical at 1, 2, 4, 8 shards (the
    determinism-under-resharding guarantee of SURVEY.md §7 hard part 2)."""
    n = 128
    key = jax.random.key(3)
    log_w = jax.random.normal(jax.random.key(4), (n,))
    expected = systematic_indices(key, log_w)

    for n_dev in (1, 2, 4, 8):
        mesh = worker_mesh(n_dev)

        def body(key, log_w):
            (anc,), _ = resample_sharded(
                key, (jnp.arange(n, dtype=jnp.int32)[:, None],), log_w
            )
            return anc

        f = jax.jit(shard_map(
            body, mesh=mesh,
            in_specs=(P(), P(WORKERS)),
            out_specs=P(WORKERS),
            check_vma=False,
        ))
        anc = jnp.asarray(f(key, log_w))[:, 0]
        assert jnp.array_equal(anc, expected), n_dev
