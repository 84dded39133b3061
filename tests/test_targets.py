"""Target densities: normalization sanity, exact-sampler moments vs analytic
moments, and the hierarchical target's quadrature ground truth."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from tpuflows.targets import (
    CorrelatedGaussian,
    GaussianMixture,
    HierarchicalGaussian,
    NealsFunnel,
    StandardNormal,
    logdensityof,
)


def mc_moments_check(target, n=80_000, seed=0, tol_sigma=4.0):
    x = target.sample(jax.random.key(seed), n)
    mean = np.asarray(jnp.mean(x, 0))
    tmean = np.asarray(target.mean())
    tvar = np.asarray(jnp.diagonal(target.cov()))
    se = np.sqrt(tvar / n)
    assert np.all(np.abs(mean - tmean) < tol_sigma * se + 1e-6), (
        f"{type(target).__name__}: sample mean off"
    )


def test_standard_normal_logdensity():
    t = StandardNormal(dim=3)
    x = jnp.zeros((1, 3))
    np.testing.assert_allclose(
        float(logdensityof(t, x)[0]), -1.5 * np.log(2 * np.pi), rtol=1e-6
    )
    mc_moments_check(t)


def test_correlated_gaussian_ar1():
    t = CorrelatedGaussian.ar1(8, rho=0.7)
    # log density matches dense-matrix evaluation
    x = jax.random.normal(jax.random.key(1), (16, 8))
    cov = np.asarray(t.cov(), np.float64)
    inv = np.linalg.inv(cov)
    _, logdet = np.linalg.slogdet(cov)
    xd = np.asarray(x, np.float64)
    expect = -0.5 * np.einsum("ni,ij,nj->n", xd, inv, xd) - 0.5 * (
        logdet + 8 * np.log(2 * np.pi)
    )
    np.testing.assert_allclose(
        np.asarray(t.log_density(x)), expect, rtol=2e-4, atol=2e-4
    )
    mc_moments_check(t)


def test_mixture_bimodal():
    t = GaussianMixture.bimodal(16, separation=4.0)
    assert t.dim == 16
    mc_moments_check(t)
    # symmetry of the two modes
    x = jnp.zeros((1, 16))
    xa = x.at[0, 0].set(2.0)
    xb = x.at[0, 0].set(-2.0)
    np.testing.assert_allclose(
        float(t.log_density(xa)[0]), float(t.log_density(xb)[0]), rtol=1e-6
    )


def test_funnel():
    t = NealsFunnel(dim=8, sigma_v=3.0)
    mc_moments_check(t, n=500_000)
    # conditional structure: logp difference in x_1 at fixed v matches N(0, e^v)
    v = 1.3
    x1 = jnp.zeros((1, 8)).at[0, 0].set(v)
    x2 = x1.at[0, 1].set(2.0)
    diff = float((t.log_density(x2) - t.log_density(x1))[0])
    np.testing.assert_allclose(diff, -0.5 * 4.0 * np.exp(-v), rtol=1e-5)


def test_hierarchical_ground_truth_consistency():
    t = HierarchicalGaussian.standard(dim=34)  # small-J for test speed
    assert t.dim == 34
    mean = np.asarray(t.mean())
    cov = np.asarray(t.cov())
    assert mean.shape == (34,) and cov.shape == (34, 34)
    # exact sampler agrees with quadrature moments
    x = t.sample(jax.random.key(2), 40_000)
    smean = np.asarray(jnp.mean(x, 0))
    svar = np.asarray(jnp.var(x, 0))
    se = np.sqrt(np.diagonal(cov) / 40_000)
    assert np.all(np.abs(smean - mean) < 5 * se + 5e-3)
    np.testing.assert_allclose(svar, np.diagonal(cov), rtol=0.1, atol=5e-3)
    # log_density is finite and peaked near the posterior mean
    lp_mean = float(t.log_density(jnp.asarray(mean)[None])[0])
    lp_far = float(t.log_density(jnp.asarray(mean)[None] + 10.0)[0])
    assert np.isfinite(lp_mean) and lp_mean > lp_far


def test_hierarchical_log_evidence_quadrature():
    """log_evidence() (1-D log_tau grid, mu/theta marginalized analytically)
    against INDEPENDENT 2-D brute-force quadrature over (mu, log_tau) with
    theta integrated analytically: p(y | mu, lt) = prod_i N(y_i; mu,
    tau^2 + noise^2). Small J so the 2-D grid is cheap and dense."""
    t = HierarchicalGaussian.standard(dim=6)  # J = 4
    y = np.asarray(t.y, np.float64)
    mus = np.linspace(-20.0, 20.0, 2001)
    lts = np.linspace(-7.0, 5.0, 1201)
    mu_g, lt_g = np.meshgrid(mus, lts, indexing="ij")
    w2 = np.exp(2.0 * lt_g) + t.noise**2
    log_lik = np.zeros_like(mu_g)
    for yi in y:
        log_lik += -0.5 * (yi - mu_g) ** 2 / w2 - 0.5 * np.log(
            2 * np.pi * w2)
    log_prior = (-0.5 * (mu_g / t.prior_mu_scale) ** 2
                 - 0.5 * np.log(2 * np.pi * t.prior_mu_scale**2)
                 - 0.5 * lt_g**2 - 0.5 * np.log(2 * np.pi))
    li = log_lik + log_prior
    m = li.max()
    brute = m + np.log(np.exp(li - m).sum()
                       * (mus[1] - mus[0]) * (lts[1] - lts[0]))
    assert abs(t.log_evidence() - brute) < 1e-4, (t.log_evidence(), brute)
    # ... and log_density carries COMPLETE normalizing constants (so its
    # integral IS the evidence): hand-evaluate the joint at one point
    # (theta = y so the likelihood quadratic vanishes)
    mu0, lt0 = 1.0, 0.3
    xm = np.zeros((1, 6), np.float64)
    xm[0, 0], xm[0, 1] = mu0, lt0
    xm[0, 2:] = y
    t2 = np.exp(2 * lt0)
    joint = (-0.5 * (mu0 / t.prior_mu_scale) ** 2
             - 0.5 * np.log(2 * np.pi * t.prior_mu_scale**2)
             - 0.5 * lt0**2 - 0.5 * np.log(2 * np.pi)
             + sum(-0.5 * (yi - mu0) ** 2 / t2
                   - 0.5 * np.log(2 * np.pi * t2) for yi in y)
             + len(y) * (-0.5 * np.log(2 * np.pi * t.noise**2)))
    lp0 = float(t.log_density(jnp.asarray(xm, jnp.float32))[0])
    assert abs(lp0 - joint) < 1e-3


def test_banana_density_matches_sampler():
    """Banana: exact samples vs analytic moments, and the log-density is a
    proper normalized pdf (checked by importance sampling against its own
    exact sampler: E_p[1] = 1 trivially; instead check E over a Gaussian
    q of p/q equals 1)."""
    from tpuflows.targets import Banana

    t = Banana(dim=4, b=0.5, sigma1=2.0)
    x = t.sample(jax.random.key(0), 80_000)
    np.testing.assert_allclose(np.asarray(jnp.mean(x, 0)),
                               np.asarray(t.mean()), atol=0.1)
    np.testing.assert_allclose(
        np.asarray(jnp.var(x, 0)), np.asarray(jnp.diagonal(t.cov())),
        rtol=0.05,
    )
    # normalization: E_q[p/q] = 1 with q a wide diag normal
    scale = jnp.array([4.0, 12.0, 2.0, 2.0])
    z = jax.random.normal(jax.random.key(1), (400_000, 4)) * scale
    log_q = jnp.sum(
        -0.5 * (z / scale) ** 2 - jnp.log(scale) - 0.5 * jnp.log(2 * jnp.pi),
        axis=-1,
    )
    log_w = t.log_density(z) - log_q
    z_hat = float(jnp.exp(jax.scipy.special.logsumexp(log_w) - jnp.log(z.shape[0])))
    assert abs(z_hat - 1.0) < 0.05


def test_rosenbrock_sampler_matches_density_moments():
    from tpuflows.targets import Rosenbrock

    t = Rosenbrock(dim=4)
    x = t.sample(jax.random.key(2), 80_000)
    np.testing.assert_allclose(np.asarray(jnp.mean(x, 0)),
                               np.asarray(t.mean()), atol=0.05)
    # density is exact: check conditional structure via log-density of
    # shifted points (x_odd exactly on the parabola maximizes the pair term)
    on = jnp.array([[1.0, 1.0, 1.0, 1.0]])
    off = jnp.array([[1.0, 1.5, 1.0, 1.0]])
    assert float(t.log_density(on)[0]) > float(t.log_density(off)[0])


def test_multimodal_cauchy_quantiles():
    from tpuflows.targets import MultimodalCauchy

    t = MultimodalCauchy(dim=4, mu=1.0, sigma=0.2)
    x = t.sample(jax.random.key(3), 400_000)
    # symmetric mixture: median of dims 0,1 is 0; dims >= 2 median 0 too
    med = np.asarray(jnp.median(x, axis=0))
    np.testing.assert_allclose(med, 0.0, atol=0.02)
    # dims >= 2: analytic quartiles of Cauchy(0, 0.2) are +-0.2
    q1, q3 = np.quantile(np.asarray(x[:, 2]), [0.25, 0.75])
    np.testing.assert_allclose([q1, q3], [-0.2, 0.2], atol=0.01)
    # bimodality of dim 0: mass near +-1 exceeds mass near 0
    h_near_mode = np.mean(np.abs(np.abs(np.asarray(x[:, 0])) - 1.0) < 0.2)
    h_near_zero = np.mean(np.abs(np.asarray(x[:, 0])) < 0.2)
    assert h_near_mode > 2 * h_near_zero
