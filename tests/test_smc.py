"""SMC subsystem tests (config 5 machinery, single-device;
distributed variant tested in test_dist.py)."""
import jax
import jax.numpy as jnp
import pytest

from tpuflows.flows import build_flow
from tpuflows.smc import (
    SMCConfig,
    next_beta,
    relative_ess,
    resample,
    run_smc,
    systematic_indices,
)
from tpuflows.targets import DiagNormal, GaussianMixture


def test_systematic_resampling_unbiased():
    """Offspring counts match n*w within the systematic-resampling bound
    (each count is floor/ceil of n*w)."""
    key = jax.random.key(0)
    log_w = jnp.log(jnp.array([0.5, 0.25, 0.125, 0.125]))
    n = 4
    idx = systematic_indices(key, jnp.repeat(log_w, 1))
    counts = jnp.bincount(idx, length=n)
    expected = 4 * jnp.exp(log_w)
    assert bool(jnp.all(jnp.abs(counts - expected) <= 1.0))


def test_resample_deterministic_and_shaped():
    key = jax.random.key(1)
    x = jax.random.normal(jax.random.key(2), (128, 3))
    log_w = jax.random.normal(jax.random.key(3), (128,))
    x1, i1 = resample(key, x, log_w)
    x2, i2 = resample(key, x, log_w)
    assert jnp.array_equal(i1, i2)  # deterministic under fixed key
    assert x1.shape == x.shape
    # heavier particles appear more often
    top = jnp.argmax(log_w)
    assert int(jnp.sum(i1 == top)) >= 1


def test_next_beta_bisection():
    key = jax.random.key(0)
    log_ratio = jax.random.normal(key, (1024,)) * 5.0
    b = next_beta(0.0, log_ratio, target_rel_ess=0.5)
    assert 0.0 < float(b) <= 1.0
    # the chosen temperature should hit the ESS target (or be 1.0)
    if float(b) < 1.0:
        ess = relative_ess(float(b) * log_ratio)
        assert abs(float(ess) - 0.5) < 0.05
    # trivial ratios jump straight to 1
    assert float(next_beta(0.0, jnp.zeros(16), 0.5)) == 1.0


@pytest.mark.parametrize("latent", [True, False])
def test_smc_gaussian_moments_and_logz(latent):
    """SMC from an untrained flow to an offset Gaussian: moments within MC
    error and log Z ~ 0 (both densities normalized)."""
    dim = 2
    target = DiagNormal(loc=jnp.array([1.0, -1.0]), scale=jnp.array([1.5, 0.7]))
    init = jax.random.normal(jax.random.key(0), (512, dim))
    flow = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2,
                      hidden=(16,))
    cfg = SMCConfig(n_particles=2048, n_mutation_steps=3, n_leapfrog=5,
                    latent_mutation=latent, max_stages=50)
    res = run_smc(jax.random.key(2), target.log_density, flow, dim, cfg)
    assert float(res.betas[-1]) == 1.0
    assert res.n_stages < 50
    mc_sigma = jnp.array([1.5, 0.7]) / jnp.sqrt(res.particles.shape[0] * 0.1)
    assert bool(jnp.all(jnp.abs(jnp.mean(res.particles, 0) - target.mean())
                        < 5 * mc_sigma))
    assert abs(float(res.log_z)) < 0.25
    assert bool(jnp.all(res.ess_hist > 0.2))


def test_smc_bimodal_recovers_both_modes():
    dim = 2
    target = GaussianMixture.bimodal(dim=dim, separation=6.0)
    init = 3.0 * jax.random.normal(jax.random.key(0), (512, dim))
    flow = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2,
                      hidden=(16,))
    cfg = SMCConfig(n_particles=2048, n_mutation_steps=3, n_leapfrog=5,
                    max_stages=60)
    res = run_smc(jax.random.key(2), target.log_density, flow, dim, cfg)
    x0 = res.particles[:, 0]
    frac_pos = float(jnp.mean(x0 > 0))
    assert 0.25 < frac_pos < 0.75  # symmetric mixture -> balanced modes


def test_smc_flow_retrain_bridge():
    """retrain_every > 0: the bridge flow is refreshed and SMC still hits
    beta = 1 with sane moments."""
    dim = 2
    target = DiagNormal(loc=jnp.array([2.0, 0.0]), scale=jnp.ones(2))
    init = jax.random.normal(jax.random.key(0), (512, dim))
    flow = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2,
                      hidden=(16,))
    cfg = SMCConfig(n_particles=1024, n_mutation_steps=2, n_leapfrog=5,
                    retrain_every=2, retrain_epochs=5, max_stages=40)
    res = run_smc(jax.random.key(2), target.log_density, flow, dim, cfg)
    assert float(res.betas[-1]) == 1.0
    assert abs(float(jnp.mean(res.particles[:, 0])) - 2.0) < 0.3
