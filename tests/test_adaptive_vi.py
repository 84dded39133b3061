"""Adaptive loop (config 3, BASELINE.json:9) and VI subsystem tests."""
import jax
import jax.numpy as jnp
import pytest

from tpuflows.adaptive import AdaptiveConfig, adaptive_fit
from tpuflows.flows import build_flow
from tpuflows.targets import DiagNormal, GaussianMixture
from tpuflows.vi import elbo, fit_vi, vi_log_q, vi_sample


def test_adaptive_fit_runs_and_improves():
    """Bimodal 2-d mixture: the loop runs, records rounds, and the flow
    becomes a usable importance proposal (behavioral assertion, SURVEY §4)."""
    target = GaussianMixture.bimodal(dim=2, separation=4.0)
    cfg = AdaptiveConfig(
        max_rounds=2,
        ess_threshold=1e9,  # force both rounds
        n_chains=16,
        num_warmup=100,
        num_samples=100,
        flow_kind="affine",
        n_blocks=2,
        hidden=(32, 32),
        train_epochs=40,
        train_batches=8,
        learning_rate=2e-3,
    )
    res = adaptive_fit(jax.random.key(0), target.log_density, 2, cfg)
    assert res.n_rounds == 2 and not res.converged
    assert res.samples.shape == (100, 16, 2)
    assert len(res.rounds) == 2
    # flow should be a decent IS proposal for the bimodal target by round 2
    assert float(res.rounds[-1].flow_is_ess) > 0.1
    # both modes reached: data-space draws straddle the separation axis
    x0 = res.samples[..., 0].reshape(-1)
    assert (jnp.mean(x0 > 0) > 0.1) and (jnp.mean(x0 < 0) > 0.1)


def test_adaptive_best_flow_tracking():
    """round 5: the loop returns the PRECONDITIONER with the highest
    sampling min-ESS across rounds (a later refit can regress the loop's
    own objective — seen in the committed funnel search, where round 7's
    refit pushed IS-ESS to 0.92 while bench-scale mixing dropped)."""
    target = DiagNormal(loc=jnp.zeros(2), scale=jnp.ones(2))
    cfg = AdaptiveConfig(
        max_rounds=3, ess_threshold=1e9, n_chains=16, num_warmup=100,
        num_samples=100, flow_kind="affine", n_blocks=2, hidden=(16,),
        train_epochs=10, train_batches=4,
    )
    res = adaptive_fit(jax.random.key(3), target.log_density, 2, cfg)
    assert res.best_flow is not None
    # rounds 1.. sample through a flow; the best is the max of those
    ess_through_flow = [float(r.min_ess) for r in res.rounds[1:]]
    assert res.best_min_ess == pytest.approx(max(ess_through_flow))
    # the best flow is a usable bijector (round-trips)
    x = jax.random.normal(jax.random.key(4), (8, 2))
    z = res.best_flow.forward(x)
    assert jnp.allclose(res.best_flow.inverse(z), x, atol=1e-4)


def test_adaptive_fit_ess_stopping():
    """Easy unimodal target: the ESS criterion triggers before max_rounds."""
    target = DiagNormal(loc=jnp.zeros(2), scale=jnp.ones(2))
    cfg = AdaptiveConfig(
        max_rounds=4,
        ess_threshold=50.0,
        n_chains=16,
        num_warmup=100,
        num_samples=100,
        flow_kind="affine",
        n_blocks=2,
        hidden=(16,),
        train_epochs=10,
        train_batches=4,
    )
    res = adaptive_fit(jax.random.key(1), target.log_density, 2, cfg)
    assert res.converged
    assert res.n_rounds < 4


def test_vi_fit_recovers_gaussian():
    target = DiagNormal(loc=jnp.array([1.0, -2.0]), scale=jnp.array([0.5, 2.0]))
    samples0 = jax.random.normal(jax.random.key(0), (256, 2))
    flow = build_flow(samples0, jax.random.key(1), kind="affine",
                      n_blocks=2, hidden=(32,))
    res = fit_vi(jax.random.key(2), target.log_density, flow, 2,
                 batch_size=256, nsteps=400)
    # ELBO should improve and approach log Z = 0 (normalized target)
    assert float(res.elbo_hist[-1]) > float(res.elbo_hist[0])
    assert float(res.final_elbo) > -0.1
    x = vi_sample(jax.random.key(3), res.flow, 2, 8192)
    assert jnp.allclose(jnp.mean(x, 0), target.mean(), atol=0.15)
    assert jnp.allclose(jnp.std(x, 0), jnp.array([0.5, 2.0]), atol=0.25)


def test_vi_log_q_normalized():
    """q(x) integrates to 1: E_q[1] via self-normalized check —
    E_{x~q}[exp(log_q - log_q)] trivially 1; instead check against analytic
    density for an untrained (identity-ish) flow on its own draws."""
    samples0 = jax.random.normal(jax.random.key(0), (256, 3))
    flow = build_flow(samples0, jax.random.key(1), kind="affine",
                      n_blocks=1, hidden=(8,))
    x = vi_sample(jax.random.key(2), flow, 3, 4096)
    lq = vi_log_q(flow, x)
    assert lq.shape == (4096,)
    assert bool(jnp.all(jnp.isfinite(lq)))
    # ELBO of q against itself equals entropy consistency: E_q[log q] finite
    # and the importance identity E_q[ exp(-log q) ] ~ volume check skipped;
    # core check: round-trip consistency of sample/log_q shapes + finiteness.


def test_adaptive_growth_appends_blocks():
    """grow_on_stall mechanics, unit-level (reference's append-module
    adaptive growth, SURVEY.md §2a row 2): stall detection, append with
    alternated mask, round-trip of the grown flow, and the
    max_grown_blocks cap — without the end-to-end loop (the slow tier's
    test_adaptive_growth_repeated_and_capped runs growth inside
    adaptive_fit for real)."""
    from tpuflows.adaptive.loop import AdaptiveRound, maybe_grow_flow
    from tpuflows.flows import build_flow

    cfg = AdaptiveConfig(
        grow_on_stall=True,
        grow_is_ess_target=0.5,
        grow_min_gain=1.1,
        max_grown_blocks=2,
        flow_kind="affine",  # matches the built flow: growth counting is
        # derived from the flow structure (resume-safe), so cfg kind and
        # flow must agree as they do inside adaptive_fit
        n_blocks=1,
        knots=4,
        hidden=(8,),
    )

    def rec(is_ess):
        z = jnp.asarray(0.0)
        return AdaptiveRound(z, z, jnp.asarray(is_ess), z, z, z)

    samples = jax.random.normal(jax.random.key(0), (256, 2))
    flow = build_flow(samples, jax.random.key(1), kind="affine", n_blocks=1)
    assert len(flow.transforms) == 2  # standardize + 1 affine block

    # fewer than 2 rounds recorded: no growth possible yet
    f, n, grew = maybe_grow_flow(flow, [rec(0.1)], 0, cfg, 2,
                                 jax.random.key(2))
    assert not grew and n == 0 and f is flow
    # improving (no stall): no growth
    f, n, grew = maybe_grow_flow(flow, [rec(0.1), rec(0.3)], 0, cfg, 2,
                                 jax.random.key(2))
    assert not grew
    # above target: no growth even when flat
    f, n, grew = maybe_grow_flow(flow, [rec(0.8), rec(0.8)], 0, cfg, 2,
                                 jax.random.key(2))
    assert not grew
    # stalled below target: append one RQS block, mask alternated
    f, n, grew = maybe_grow_flow(flow, [rec(0.1), rec(0.1)], 0, cfg, 2,
                                 jax.random.key(2))
    assert grew and n == 1 and len(f.transforms) == 3
    # the grown flow still round-trips exactly
    x = jax.random.normal(jax.random.key(3), (64, 2))
    z, ladj_f = f.forward_and_ladj(x)
    x2, ladj_i = f.inverse_and_ladj(z)
    assert jnp.allclose(x2, x, atol=1e-4)
    assert jnp.allclose(ladj_f, -ladj_i, atol=1e-4)
    # second stalled append alternates the mask again; then the cap binds
    f, n, grew = maybe_grow_flow(f, [rec(0.1), rec(0.1)], n, cfg, 2,
                                 jax.random.key(4))
    assert grew and n == 2 and len(f.transforms) == 4
    assert f.transforms[-1].mask != f.transforms[-2].mask
    f2, n2, grew = maybe_grow_flow(f, [rec(0.1), rec(0.1)], n, cfg, 2,
                                   jax.random.key(5))
    assert not grew and n2 == 2 and f2 is f


@pytest.mark.slow
def test_adaptive_growth_repeated_and_capped():
    """Slow variant (ADVICE r2): enough rounds for TWO appends — covers the
    alternating-mask placement of the second grown block AND the
    max_grown_blocks cap (a 5th round must NOT grow past the cap)."""
    target = GaussianMixture.bimodal(dim=2, separation=4.0)
    cfg = AdaptiveConfig(
        max_rounds=5,
        ess_threshold=1e9,
        n_chains=16,
        num_warmup=40,
        num_samples=40,
        flow_kind="affine",
        n_blocks=1,
        hidden=(8,),
        train_epochs=5,
        train_batches=4,
        grow_on_stall=True,
        grow_is_ess_target=1.1,
        grow_min_gain=1e9,
        max_grown_blocks=2,
    )
    res = adaptive_fit(jax.random.key(0), target.log_density, 2, cfg)
    # standardize + 1 affine + 2 grown RQS blocks, capped there: rounds
    # 2 and 3 each append one, rounds 4+ are blocked by the cap
    assert len(res.flow.transforms) == 4
    # the two grown blocks landed on ALTERNATING masks (each transforms
    # the dims the other passes through)
    m3 = res.flow.transforms[2].mask
    m4 = res.flow.transforms[3].mask
    assert tuple(m3) != tuple(m4)
    x = jax.random.normal(jax.random.key(1), (64, 2))
    z, ladj_f = res.flow.forward_and_ladj(x)
    x2, ladj_i = res.flow.inverse_and_ladj(z)
    assert jnp.allclose(x2, x, atol=1e-4)
    assert jnp.allclose(ladj_f, -ladj_i, atol=1e-4)


def test_build_flow_user_module_list():
    """build_flow(samples, key, modules=[...]): ready bijectors and
    (samples, key)->Bijector constructors mix freely (reference
    `build_flow(samples; modules)` parity)."""
    from tpuflows.flows import AffineCoupling, RQSCouplingBlock, Standardize

    samples = 2.0 * jax.random.normal(jax.random.key(0), (512, 4)) + 1.0
    flow = build_flow(
        samples, jax.random.key(1),
        modules=[
            lambda s, k: Standardize.from_samples(s),
            lambda s, k: AffineCoupling.init(k, (1, 0, 1, 0), hidden=(16,)),
            RQSCouplingBlock.init(jax.random.key(2), (0, 1, 0, 1), knots=4,
                                  hidden=(16,)),
        ])
    assert len(flow.transforms) == 3
    x = samples[:32]
    z, ladj_f = flow.forward_and_ladj(x)
    x2, ladj_i = flow.inverse_and_ladj(z)
    assert jnp.allclose(x2, x, atol=1e-4)
    assert jnp.allclose(ladj_f, -ladj_i, atol=1e-4)
