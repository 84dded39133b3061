"""3-MC-sigma posterior-moment acceptance gates (BASELINE.json:5) on the
five baseline-config targets (BASELINE.json:7-11), at CI scale. Each gate
uses the config's designated algorithm; standard errors use the ESS
(diagnostics/moments.py), so these are honest statistical tests with
deterministic seeds."""
import jax
import jax.numpy as jnp
import pytest

from tpuflows.diagnostics import moment_gate
from tpuflows.flows import build_flow
from tpuflows.mcmc import run_nuts
from tpuflows.mcmc.preconditioned import flow_reparameterized
from tpuflows.smc import SMCConfig, run_smc
from tpuflows.targets import (
    CorrelatedGaussian,
    GaussianMixture,
    HierarchicalGaussian,
    NealsFunnel,
    StandardNormal,
)
from tpuflows.vi import fit_vi, vi_sample


def _diag(cov):
    return jnp.diag(cov)


def test_family_threshold_calibration():
    """Bonferroni threshold: a PERFECT sampler passes the family-corrected
    gate at the single-test 3-sigma rate, while the raw max-z gate over
    many dims rejects it often. Monte-Carlo over 200 iid-normal datasets."""
    import numpy as np

    from tpuflows.diagnostics.moments import family_threshold

    # closed-form sanity: m=1 leaves the threshold unchanged
    assert abs(family_threshold(3.0, 1) - 3.0) < 1e-9
    t512 = family_threshold(3.0, 512)
    assert 4.2 < t512 < 4.9
    rng = np.random.RandomState(0)
    d, n = 64, 1500
    fails_raw = fails_fam = 0
    for _ in range(60):
        x = rng.randn(n, d).astype(np.float32)
        raw = moment_gate(x, np.zeros(d), np.ones(d))
        fam = moment_gate(x, np.zeros(d), np.ones(d),
                          family_correction=True)
        fails_raw += not raw.passed
        fails_fam += not fam.passed
    # raw max-z over 128 moments fails a perfect sampler frequently;
    # the corrected gate almost never does
    assert fails_raw >= 5, fails_raw
    assert fails_fam <= 2, fails_fam


def test_gate_c1_std_normal_flow_fit():
    """Config 1: flow fit on exact samples; gate on flow draws,
    MULTI-SEED CALIBRATED (round-1 review: a single hand-picked eval key
    hid a 4.4-sigma outlier; this version distinguishes a fit bias — every
    seed deviating the same way — from sampling chance — rare independent
    outliers). The flow cannot beat its training set, so the claimed ESS
    is the training size."""
    t = StandardNormal(dim=2)
    samples = t.sample(jax.random.key(0), 8192)
    flow = build_flow(samples, jax.random.key(1), kind="affine",
                      n_blocks=1, hidden=(32,))
    import optax

    import numpy as np

    from tpuflows.flows import optimize_flow

    opt = optax.adam(optax.cosine_decay_schedule(5e-4, 200 * 8))
    res = optimize_flow(jax.random.key(2), samples, flow, opt,
                        nbatches=8, nepochs=200)
    tm, tv = jnp.mean(samples, 0), jnp.var(samples, 0)
    # 12 independent eval draws (includes the round-1 "outlier" key(3))
    gates = []
    for seed in range(3, 15):
        x = res.result.inverse(
            jax.random.normal(jax.random.key(seed), (16384, 2)))
        gates.append(moment_gate(x, tm, tv, ess=16384))
    n_pass = sum(g.passed for g in gates)
    sig_var = np.array([g.max_sigma_var for g in gates])
    sig_mean = np.array([g.max_sigma_mean for g in gates])
    # A calibrated 3-sigma gate on 2 dims passes ~99% of seeds; a variance
    # BIAS in the fit would fail most seeds in the same direction.
    assert n_pass >= 10, (n_pass, sig_mean.round(2), sig_var.round(2))
    # the typical deviation must look like noise, not bias: the median
    # worst-of-2-dims |z| for a calibrated gate sits near 1.1 (max of two
    # half-normals); allow generous slack but catch a systematic shift
    assert float(np.median(sig_var)) < 2.0, sig_var.round(2)
    assert float(np.median(sig_mean)) < 2.0, sig_mean.round(2)
    # loose absolute sanity band vs the TRUE moments
    x = res.result.inverse(jax.random.normal(jax.random.key(5), (16384, 2)))
    assert bool(jnp.all(jnp.abs(jnp.mean(x, 0)) < 0.1))
    assert bool(jnp.all(jnp.abs(jnp.var(x, 0) - 1.0) < 0.1))


@pytest.mark.slow
def test_gate_c2_correlated_reverse_kl():
    """Config 2: 8-d AR(1) Gaussian via reverse-KL RQS flow."""
    t = CorrelatedGaussian.ar1(dim=8, rho=0.8)
    init = t.sample(jax.random.key(0), 512)
    flow = build_flow(init, jax.random.key(1), kind="rqs", n_blocks=4,
                      knots=8, hidden=(48, 48))
    res = fit_vi(jax.random.key(2), t.log_density, flow, 8,
                 batch_size=512, nsteps=800)
    x = vi_sample(jax.random.key(3), res.flow, 8, 16384)
    gate = moment_gate(x, t.mean(), _diag(t.cov()), ess=16384 / 4)
    assert gate.passed, gate


@pytest.mark.slow
def test_gate_c3_mixture_nuts():
    """Config 3 target: bimodal mixture sampled by plain NUTS at CI scale
    (the adaptive loop itself is covered in test_adaptive_vi)."""
    t = GaussianMixture.bimodal(dim=4, separation=3.0)
    q0 = t.sample(jax.random.key(0), 64)  # overdispersed starts at modes
    res = run_nuts(jax.random.key(1), t.log_density, q0,
                   num_warmup=300, num_samples=400)
    gate = moment_gate(res.samples, t.mean(), _diag(t.cov()))
    assert gate.passed, gate


@pytest.mark.slow
def test_gate_c4_funnel_flow_nuts():
    """Config 4 (CI scale): flow-preconditioned NUTS on an 8-d funnel."""
    t = NealsFunnel(dim=8)
    init = t.sample(jax.random.key(0), 4096)
    # arqs: affine partner carries the funnel's unbounded scale (see
    # test_mcmc.test_flow_preconditioned_funnel note / c4 config)
    flow = build_flow(init, jax.random.key(1), kind="arqs", n_blocks=2,
                      knots=8, hidden=(48, 48), clamp=6.0)
    import optax

    from tpuflows.flows import optimize_flow

    opt = optax.adam(optax.cosine_decay_schedule(2e-3, 200 * 8))
    fres = optimize_flow(jax.random.key(2), init, flow, opt,
                         nbatches=8, nepochs=200)
    flow = fres.result
    logp = flow_reparameterized(t.log_density, flow)
    q0 = flow.forward(t.sample(jax.random.key(3), 64))
    res = run_nuts(jax.random.key(4), logp, q0, num_warmup=300,
                   num_samples=600)
    x = flow.inverse(res.samples.reshape(-1, 8)).reshape(res.samples.shape)
    # Var(x_i) = e^{sigma_v^2/2} is driven by rare large-v tails — raw
    # second moments are unestimable at CI scale. Gate instead on the
    # EXACT light-tailed reparameterization: under the funnel,
    # [v/sigma_v, x_i * exp(-v/2)] is iid standard normal.
    v = x[..., :1]
    resid = x[..., 1:] * jnp.exp(-v / 2.0)
    std = jnp.concatenate([v / 3.0, resid], axis=-1)
    gate = moment_gate(std, jnp.zeros(8), jnp.ones(8))
    assert gate.passed, gate


@pytest.mark.slow
def test_gate_c5_hierarchical_smc():
    """Config 5 (CI scale): 18-d hierarchical posterior via flow-bridged
    SMC, gated against the EXACT quadrature moments."""
    t = HierarchicalGaussian.standard(dim=10)
    init = t.sample(jax.random.key(0), 4096)
    flow = build_flow(init, jax.random.key(1), kind="rqs", n_blocks=4,
                      knots=8, hidden=(48, 48))
    # pretrain the bridge flow on exact draws (flow-BRIDGED SMC: the flow
    # is the q0 endpoint and the latent mutation preconditioner). NOTE:
    # deliberately a MODEST fit — over-trained forward-KL flows develop
    # thinner-than-posterior tails and degenerate IS weights (measured:
    # 6-block/200-epoch flow has IS ESS 5/8192 on this family vs 167 for
    # this 4-block/80-epoch fit); SMC's annealing absorbs a mediocre
    # bridge but not a zero-overlap one.
    import optax

    from tpuflows.flows import optimize_flow

    fres = optimize_flow(jax.random.key(3), init, flow, optax.adam(2e-3),
                         nbatches=8, nepochs=80)
    cfg = SMCConfig(n_particles=4096, n_mutation_steps=5, n_leapfrog=5,
                    target_rel_ess=0.8, max_stages=80)
    res = run_smc(jax.random.key(2), t.log_density, fres.result, 10, cfg)
    # conservative effective draw count: weight degeneracy at the final
    # reweight + mutation autocorrelation => claim n/16
    gate = moment_gate(res.particles, t.mean(), _diag(t.cov()),
                       ess=cfg.n_particles / 16)
    assert gate.passed, gate
