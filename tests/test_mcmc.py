"""MCMC kernels: leapfrog reversibility, HMC/NUTS statistical correctness
(3-MC-sigma moment gates per BASELINE.json:5), adaptation behavior, and
flow preconditioning on a funnel."""
import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from tpuflows.diagnostics import effective_sample_size, moment_gate, split_rhat
from tpuflows.flows import build_flow, optimize_flow
from tpuflows.mcmc import (
    PhasePoint,
    flow_reparameterized,
    leapfrog,
    make_hmc_kernel,
    make_nuts_kernel,
    run_nuts,
    to_data_space,
)
from tpuflows.targets import CorrelatedGaussian, DiagNormal, NealsFunnel, StandardNormal


def test_leapfrog_reversible_and_energy():
    t = StandardNormal(dim=4)
    lpg = jax.value_and_grad(t.log_density)
    q = jnp.array([0.5, -1.0, 2.0, 0.1])
    p = jnp.array([1.0, 0.3, -0.5, 0.7])
    logp, grad = lpg(q)
    z = PhasePoint(q=q, p=p, logp=logp, grad=grad)
    inv_mass = jnp.ones(4)
    eps = 0.1
    for _ in range(10):
        z = leapfrog(lpg, z, eps, inv_mass)
    # integrate back with negated momentum
    zr = PhasePoint(q=z.q, p=-z.p, logp=z.logp, grad=z.grad)
    for _ in range(10):
        zr = leapfrog(lpg, zr, eps, inv_mass)
    np.testing.assert_allclose(np.asarray(zr.q), np.asarray(q), atol=1e-4)
    np.testing.assert_allclose(np.asarray(-zr.p), np.asarray(p), atol=1e-4)


def test_hmc_standard_normal_moments():
    t = StandardNormal(dim=3)
    kernel = jax.jit(
        jax.vmap(make_hmc_kernel(t.log_density, num_leapfrog=16),
                 in_axes=(0, 0, None, None))
    )
    n_chains = 32
    q = jax.random.normal(jax.random.key(0), (n_chains, 3))
    inv_mass = jnp.ones(3)
    keys = jax.random.key(1)
    draws = []
    for i in range(150):
        ks = jax.random.split(jax.random.fold_in(keys, i), n_chains)
        q, info = kernel(ks, q, 0.25, inv_mass)
        if i >= 50:
            draws.append(q)
    s = jnp.stack(draws)  # (100, 32, 3)
    check = moment_gate(s, t.mean(), jnp.diagonal(t.cov()), n_sigma=3.5)
    assert check.passed, check
    assert float(jnp.mean(info.accept_prob)) > 0.6


def test_nuts_diag_normal_moments_and_adaptation():
    t = DiagNormal(loc=jnp.array([1.0, -2.0, 0.0, 3.0]),
                   scale=jnp.array([0.3, 3.0, 1.0, 0.1]))
    q0 = jax.random.normal(jax.random.key(2), (16, 4))
    res = run_nuts(
        jax.random.key(3), t.log_density, q0,
        num_warmup=400, num_samples=400, max_depth=8,
    )
    # adaptation learned the scales: inv_mass ~ target variance
    ratio = np.asarray(res.inv_mass) / np.asarray(jnp.diagonal(t.cov()))
    assert np.all(ratio > 0.2) and np.all(ratio < 5.0), ratio
    check = moment_gate(res.samples, t.mean(), jnp.diagonal(t.cov()),
                        n_sigma=3.5)
    assert check.passed, check
    rhat = np.asarray(split_rhat(res.samples))
    assert np.all(rhat < 1.05), rhat
    assert float(jnp.mean(res.info.accept_prob)) > 0.6
    assert not bool(jnp.any(res.info.diverging[-1]))


@pytest.mark.slow  # covered in the fast tier by the diag-normal gate test
def test_nuts_correlated_gaussian():
    t = CorrelatedGaussian.ar1(6, rho=0.8)
    q0 = jax.random.normal(jax.random.key(4), (16, 6))
    res = run_nuts(jax.random.key(5), t.log_density, q0,
                   num_warmup=300, num_samples=400, max_depth=8)
    check = moment_gate(res.samples, t.mean(), jnp.diagonal(t.cov()),
                        n_sigma=3.5)
    assert check.passed, check


def test_stan_windows_better_metric_on_raw_multiscale():
    """warmup_schedule="stan" (doubling Welford windows, VERDICT r2 item 8)
    vs the single-window default on a RAW target with 3.5 decades of scale
    and chains started near the origin: the single window bakes the
    far-from-stationarity transient of the wide dims into its only metric;
    doubling windows re-estimate off progressively better draws."""
    from tpuflows.mcmc.sample import stan_window_closes

    # schedule shape: doubling windows inside the slow phase, last one
    # extended to the slow-phase end
    closes, start, end = stan_window_closes(400)
    idx = np.flatnonzero(closes)
    assert start == 60 and end == 360
    assert idx[-1] == end - 1
    assert len(idx) >= 3
    widths = np.diff(np.concatenate([[start - 1], idx]))
    assert np.all(widths[1:-1] == 2 * widths[:-2])  # doubling until the last

    d = 8
    scale = jnp.asarray([0.1, 0.3, 1.0, 3.0, 10.0, 30.0, 100.0, 300.0])
    t = DiagNormal(loc=jnp.zeros(d), scale=scale)
    q0 = 0.1 * jax.random.normal(jax.random.key(0), (16, d))
    true_log_var = np.log(np.asarray(scale) ** 2)

    errs = {}
    for sched in ("single", "stan"):
        res = run_nuts(jax.random.key(1), t.log_density, q0, num_warmup=400,
                       num_samples=10, max_depth=8, warmup_schedule=sched)
        errs[sched] = np.max(np.abs(
            np.log(np.asarray(res.inv_mass)) - true_log_var))
    # measured (seed 1): single 0.556, stan 0.034 — demand a decisive margin
    assert errs["stan"] < 0.5 * errs["single"], errs
    assert errs["stan"] < 0.3, errs


def test_nuts_tree_stats_sane():
    t = StandardNormal(dim=2)
    kernel = make_nuts_kernel(t.log_density, max_depth=6)
    q, info = jax.jit(kernel)(jax.random.key(6), jnp.zeros(2), 0.5,
                              jnp.ones(2))
    assert int(info.num_steps) >= 1
    assert 0 <= int(info.tree_depth) <= 6
    assert 0.0 <= float(info.accept_prob) <= 1.0
    assert not bool(info.diverging)


def test_nuts_divergence_flagged_on_huge_step():
    t = StandardNormal(dim=2)
    kernel = make_nuts_kernel(t.log_density, max_depth=6)
    vk = jax.jit(jax.vmap(kernel, in_axes=(0, 0, None, None)))
    keys = jax.random.split(jax.random.key(7), 64)
    q = 3.0 + jax.random.normal(jax.random.key(8), (64, 2))
    _, info = vk(keys, q, 1e3, jnp.ones(2))
    assert bool(jnp.any(info.diverging))


@pytest.mark.slow
def test_flow_preconditioned_funnel():
    """Train a flow on exact funnel draws, then NUTS in latent space —
    the config-4 pattern (BASELINE.json:10) at test scale."""
    t = NealsFunnel(dim=4, sigma_v=2.0)
    train = t.sample(jax.random.key(9), 4096)
    # arqs (affine+RQS): a spline-only flow's bounded range cannot carry
    # the funnel's unbounded scale, leaving this gate fp-marginal — any
    # float perturbation (XLA opt level, reduction association) flipped
    # it between rounds; the affine partner makes the margin real (the
    # same lesson as the c4 config fix)
    flow = build_flow(train, jax.random.key(10), kind="arqs", n_blocks=2,
                      knots=6, hidden=(32, 32), clamp=6.0)
    fit = optimize_flow(jax.random.key(11), train, flow, optax.adam(2e-3),
                        nbatches=16, nepochs=40)
    logp_lat = flow_reparameterized(t.log_density, fit.result)
    q0 = 0.1 * jax.random.normal(jax.random.key(12), (16, 4))
    res = run_nuts(jax.random.key(13), logp_lat, q0,
                   num_warmup=300, num_samples=500, max_depth=8,
                   adapt_mass=False)
    x = to_data_space(fit.result, res.samples.reshape(-1, 4)).reshape(
        res.samples.shape
    )
    # Gate on the EXACT light-tailed reparameterization (the
    # test_gate_c4_funnel_flow_nuts trick): under the funnel,
    # [v/sigma_v, x_i * exp(-v/2)] is iid standard normal. Raw second
    # moments (Var(x_i) = e^{sigma_v^2/2}, kurtosis e^{2 sigma_v^2})
    # are unestimable at this draw count — the old raw gate sat at
    # ~5 sigma of its own (empirical-m4) error bar and flipped on any
    # float perturbation.
    v = x[..., :1]
    std = jnp.concatenate(
        [v / t.sigma_v, x[..., 1:] * jnp.exp(-v / 2.0)], axis=-1)
    check = moment_gate(std, jnp.zeros(4), jnp.ones(4), n_sigma=3.5)
    assert check.passed, check


def test_ess_and_rhat_sanity():
    # iid draws: ESS ~ n*m, rhat ~ 1
    x = jax.random.normal(jax.random.key(14), (500, 4, 3))
    ess = np.asarray(effective_sample_size(x))
    assert np.all(ess > 800), ess
    rh = np.asarray(split_rhat(x))
    assert np.all(np.abs(rh - 1.0) < 0.05)
    # strongly autocorrelated: ESS much smaller (AR chain built in numpy —
    # a 500-op jnp python loop would dominate this test's runtime in trace)
    rng = np.random.RandomState(15)
    noise = rng.randn(500, 4, 1)
    ar_np = np.empty_like(noise)
    ar_np[0] = noise[0]
    for i in range(1, 500):
        ar_np[i] = 0.95 * ar_np[i - 1] + np.sqrt(1 - 0.95**2) * noise[i]
    ar = jnp.asarray(ar_np, jnp.float32)
    ess_ar = np.asarray(effective_sample_size(ar))
    assert np.all(ess_ar < 400), ess_ar
    # non-mixed chains: rhat >> 1
    bad = x.at[:, 0, :].add(5.0)
    assert np.all(np.asarray(split_rhat(bad)) > 1.5)


def test_chunked_run_matches_unchunked():
    """chunk_size changes program partitioning, never results (bitwise)."""
    from tpuflows.targets import DiagNormal

    t = DiagNormal(loc=jnp.zeros(3), scale=jnp.ones(3))
    q0 = jax.random.normal(jax.random.key(0), (4, 3))
    a = run_nuts(jax.random.key(1), t.log_density, q0,
                 num_warmup=30, num_samples=25)
    b = run_nuts(jax.random.key(1), t.log_density, q0,
                 num_warmup=30, num_samples=25, chunk_size=8)
    assert jnp.array_equal(a.samples, b.samples)
    assert jnp.array_equal(a.step_size, b.step_size)
    assert jnp.array_equal(a.inv_mass, b.inv_mass)
