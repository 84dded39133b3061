"""Posterior/prior composition + constraint transforms + mode finding.

Assertion kinds per SURVEY.md §4: round-trip invariants, ladj-vs-autodiff
cross-checks, and analytic-ground-truth (conjugate posterior) gates.
"""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflows.targets import (
    Beta,
    Exponential,
    HalfNormal,
    IndependentPrior,
    LogNormal,
    Normal,
    Posterior,
    Uniform,
    find_mode,
)

MARGINALS = [
    Normal(1.0, 2.0),
    LogNormal(0.5, 0.7),
    Exponential(2.0),
    HalfNormal(1.5),
    Uniform(-1.0, 3.0),
    Beta(2.0, 5.0),
]


@pytest.fixture(scope="module")
def prior():
    return IndependentPrior(MARGINALS)


def test_constrain_unconstrain_roundtrip(prior):
    u = jax.random.normal(jax.random.key(0), (64, prior.dim))
    theta = prior.constrain(u)
    u2 = prior.unconstrain(theta)
    np.testing.assert_allclose(np.asarray(u2), np.asarray(u),
                               rtol=2e-4, atol=2e-4)


def test_constrain_maps_into_support(prior):
    u = 4.0 * jax.random.normal(jax.random.key(1), (256, prior.dim))
    th = np.asarray(prior.constrain(u))
    assert np.all(th[:, 1] > 0) and np.all(th[:, 2] > 0) and np.all(th[:, 3] > 0)
    assert np.all((th[:, 4] > -1.0) & (th[:, 4] < 3.0))
    assert np.all((th[:, 5] > 0.0) & (th[:, 5] < 1.0))


def test_constrain_ladj_matches_autodiff(prior):
    u = jax.random.normal(jax.random.key(2), (8, prior.dim))
    ladj = prior.constrain_ladj(u)
    J = jax.vmap(jax.jacfwd(prior.constrain))(u)
    _, brute = np.linalg.slogdet(np.asarray(J))
    np.testing.assert_allclose(np.asarray(ladj), brute, rtol=1e-4, atol=1e-4)


def test_log_pdf_normalized_by_quadrature():
    # each marginal's pdf must integrate to 1 (trapezoid over its support)
    grids = {
        0: np.linspace(-15, 17, 20001),
        1: np.linspace(1e-6, 60, 40001),
        2: np.linspace(1e-6, 15, 20001),
        3: np.linspace(1e-6, 12, 20001),
        4: np.linspace(-1 + 1e-6, 3 - 1e-6, 20001),
        5: np.linspace(1e-6, 1 - 1e-6, 20001),
    }
    for i, g in grids.items():
        p = IndependentPrior([MARGINALS[i]])
        lp = np.asarray(p.log_pdf(jnp.asarray(g, jnp.float32)[:, None]))
        z = np.trapezoid(np.exp(lp), g)
        assert abs(z - 1.0) < 2e-3, f"marginal {i} integrates to {z}"


def test_prior_sampling_moments(prior):
    th = np.asarray(prior.sample(jax.random.key(3), 60_000))
    # analytic means: N(1,2)->1; logN(.5,.7)->exp(.5+.245); Exp(2)->0.5;
    # HalfN(1.5)->1.5*sqrt(2/pi); U(-1,3)->1; Beta(2,5)->2/7
    want = np.array([1.0, np.exp(0.5 + 0.7**2 / 2), 0.5,
                     1.5 * np.sqrt(2 / np.pi), 1.0, 2 / 7])
    got = th.mean(axis=0)
    np.testing.assert_allclose(got, want, rtol=0.04, atol=0.04)


def test_unconstrained_density_preserves_normalization(prior):
    # ∫ p(θ)dθ = ∫ p(θ(u))|dθ/du| du = 1, check by importance sampling
    # against a wide normal in u-space for the Uniform marginal.
    p = IndependentPrior([Uniform(-1.0, 3.0)])
    u = 4.0 * jax.random.normal(jax.random.key(4), (150_000, 1))
    logq = -0.5 * (u / 4.0) ** 2 - jnp.log(4.0) - 0.5 * jnp.log(2 * jnp.pi)
    logp_u = p.log_pdf(p.constrain(u)) + p.constrain_ladj(u)
    z = jnp.mean(jnp.exp(logp_u - logq.squeeze(-1)))
    assert abs(float(z) - 1.0) < 0.02


def test_conjugate_posterior_mode():
    # y_i ~ N(θ, 1), θ ~ N(0, 1): MAP = Σy / (n + 1)
    y = jnp.asarray([0.8, 1.2, 1.0, 0.6], jnp.float32)

    def loglik(theta):
        mu = theta[..., 0]
        return -0.5 * jnp.sum((y - mu[..., None]) ** 2, axis=-1)

    post = Posterior(loglik, IndependentPrior([Normal(0.0, 1.0)]))
    res = find_mode(post, jnp.zeros(1), nsteps=400)
    want = float(jnp.sum(y)) / (len(y) + 1)
    assert abs(float(res.mode[0]) - want) < 1e-3
    assert bool(jnp.isfinite(res.log_density))


def test_posterior_bounded_param_nuts_recovers_scale():
    # y_i ~ N(0, σ), σ ~ LogNormal(0,1); NUTS in unconstrained space must
    # land near the analytic MAP of σ and never leave the support.
    from tpuflows.mcmc import run_nuts

    key = jax.random.key(5)
    sigma_true = 1.7
    y = sigma_true * jax.random.normal(key, (200,))

    def loglik(theta):
        s = theta[..., 0]
        return (-0.5 * jnp.sum(y**2) / s**2 - y.shape[0] * jnp.log(s))

    post = Posterior(loglik, IndependentPrior([LogNormal(0.0, 1.0)]))
    q0 = post.sample_prior(jax.random.key(6), 32)
    # chains start from the prior, i.e. in heterogeneous curvature regimes
    # of a raw scale posterior — the documented per-chain-step-size opt-in
    # (pooled default would bias the small-sigma chains; mcmc/sample.py
    # step-size policy)
    res = run_nuts(jax.random.key(7), post.log_density, q0,
                   num_warmup=200, num_samples=200, max_depth=6,
                   per_chain_step_size=True)
    sig = post.constrain(res.samples.reshape(-1, 1))[:, 0]
    assert np.all(np.asarray(sig) > 0)
    assert abs(float(jnp.mean(sig)) - float(jnp.std(y))) < 0.15


def test_find_mode_multistart_escapes_bad_start():
    from tpuflows.targets import GaussianMixture
    t = GaussianMixture.bimodal(dim=2, separation=4.0)
    res = find_mode(t, jnp.asarray([0.0, 0.0]), nsteps=600, n_starts=16,
                    learning_rate=0.1)
    # mode of a separated symmetric bimodal is at one of the component
    # centers, not the saddle at the origin
    assert float(jnp.linalg.norm(res.mode)) > 1.0
