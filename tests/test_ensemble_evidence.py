"""Ensemble sampler + evidence estimators (SURVEY.md §4 assertion kinds:
moment gates and analytic ground truth — a normalized target has log Z = 0,
a target scaled by c has log Z = log c)."""
import jax
import jax.numpy as jnp
import numpy as np
import optax

from tpuflows.flows import build_flow
from tpuflows.integration import (
    log_evidence_bridge,
    log_evidence_harmonic,
    log_evidence_is,
)
from tpuflows.mcmc import run_ensemble
from tpuflows.targets import DiagNormal
from tpuflows.vi import fit_vi, vi_sample


def test_ensemble_recovers_gaussian_moments():
    target = DiagNormal(loc=jnp.array([1.0, -2.0, 0.5]),
                        scale=jnp.array([0.5, 1.5, 1.0]))
    walkers0 = jax.random.normal(jax.random.key(0), (64, 3))
    res = run_ensemble(jax.random.key(1), target.log_density, walkers0,
                       num_warmup=300, num_samples=700)
    draws = np.asarray(res.samples).reshape(-1, 3)
    assert 0.1 < float(res.accept_rate) < 0.9
    np.testing.assert_allclose(draws.mean(0), np.asarray(target.loc),
                               atol=0.15)
    np.testing.assert_allclose(draws.std(0), np.asarray(target.scale),
                               atol=0.2)


def test_ensemble_gradient_free():
    """Works on a non-differentiable target (|x|-kinked Laplace)."""
    def log_density(x):
        return -jnp.sum(jnp.abs(x), axis=-1)

    walkers0 = jax.random.normal(jax.random.key(2), (32, 2))
    res = run_ensemble(jax.random.key(3), log_density, walkers0,
                       num_warmup=200, num_samples=400)
    draws = np.asarray(res.samples).reshape(-1, 2)
    # Laplace(1): mean 0, std sqrt(2)
    np.testing.assert_allclose(draws.mean(0), 0.0, atol=0.2)
    np.testing.assert_allclose(draws.std(0), np.sqrt(2.0), atol=0.3)


def _fitted_flow_and_target():
    target = DiagNormal(loc=jnp.array([1.0, -0.5]),
                        scale=jnp.array([0.8, 1.2]))
    init = jax.random.normal(jax.random.key(4), (256, 2))
    flow0 = build_flow(init, jax.random.key(5), kind="affine", n_blocks=2,
                       hidden=(16,))
    vi = fit_vi(jax.random.key(6), target.log_density, flow0, 2,
                optimizer=optax.adam(5e-3), batch_size=256, nsteps=400)
    return vi.flow, target


def test_evidence_normalized_target_is_zero():
    flow, target = _fitted_flow_and_target()
    res = log_evidence_is(jax.random.key(7), target.log_density, flow, 2)
    assert abs(float(res.log_z)) < 0.05
    assert float(res.ess) > 0.5 * res.n  # decent fit -> high weight-ESS

    bridge = log_evidence_bridge(
        jax.random.key(8), target.log_density, flow,
        vi_sample(jax.random.key(9), flow, 2, 4096),
    )
    assert abs(float(bridge.log_z)) < 0.05

    hm = log_evidence_harmonic(
        target.log_density, flow,
        target.sample(jax.random.key(10), 4096),
    )
    assert abs(float(hm)) < 0.1


def test_evidence_recovers_scale_constant():
    """p*(x) = c * p(x) must give log Z = log c for all three estimators."""
    flow, target = _fitted_flow_and_target()
    log_c = 3.7

    def scaled(x):
        return target.log_density(x) + log_c

    res = log_evidence_is(jax.random.key(11), scaled, flow, 2)
    np.testing.assert_allclose(float(res.log_z), log_c, atol=0.05)
    bridge = log_evidence_bridge(
        jax.random.key(12), scaled, flow,
        vi_sample(jax.random.key(13), flow, 2, 4096),
    )
    np.testing.assert_allclose(float(bridge.log_z), log_c, atol=0.05)


def test_evidence_is_and_bridge_d16():
    """IS + bridge at d=16 (VERDICT r4 next #4 fast-tier leg; the
    production-dim runs live in scripts/evidence_production_dims.py):
    anisotropic Gaussian scaled by a constant, affine flow fitted by
    forward KL on exact draws — both estimators recover log c."""
    dim, log_c = 16, -2.4
    scale = jnp.exp(0.4 * jnp.sin(jnp.arange(dim, dtype=jnp.float32)))
    target = DiagNormal(loc=0.3 * jnp.ones(dim), scale=scale)

    def scaled(x):
        return target.log_density(x) + log_c

    draws = target.sample(jax.random.key(20), 4096)
    flow0 = build_flow(draws, jax.random.key(21), kind="affine",
                       n_blocks=2, hidden=(32,))
    from tpuflows.flows import optimize_flow

    flow = optimize_flow(jax.random.key(22), draws, flow0,
                         optax.adam(5e-3), nbatches=8, nepochs=30).result
    res = log_evidence_is(jax.random.key(23), scaled, flow, dim, n=16384)
    assert float(res.ess) > 0.2 * res.n  # the fit is real at d=16
    np.testing.assert_allclose(float(res.log_z), log_c, atol=0.05)
    bridge = log_evidence_bridge(
        jax.random.key(24), scaled, flow,
        target.sample(jax.random.key(25), 4096), n_proposal=8192)
    np.testing.assert_allclose(float(bridge.log_z), log_c, atol=0.05)
