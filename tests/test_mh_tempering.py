"""Adaptive random-walk MH, flow-independence MH, and parallel tempering.

Reference parity (SURVEY.md §2b row 14): BAT.jl's `MetropolisHastings` +
`AdaptiveMHTuning` default sampler, the transformed-MCMC flow-independence
proposal, and tempered ensemble sampling. Assertion style per SURVEY.md §4:
moment gates (3-MC-sigma), adaptation behavior, and invariance checks.
"""
import jax
import jax.numpy as jnp
import numpy as np

from tpuflows.diagnostics import moment_gate
from tpuflows.flows import Standardize
from tpuflows.mcmc import (
    geometric_betas,
    run_flow_imh,
    run_parallel_tempering,
    run_rwmh,
)
from tpuflows.targets import DiagNormal, GaussianMixture, StandardNormal


def test_rwmh_standard_normal_moments():
    t = StandardNormal(dim=3)
    q0 = jax.random.normal(jax.random.key(0), (64, 3))
    res = run_rwmh(jax.random.key(1), t.log_density, q0,
                   num_warmup=600, num_samples=800)
    assert res.samples.shape == (800, 64, 3)
    check = moment_gate(res.samples, t.mean(), jnp.diagonal(t.cov()),
                        n_sigma=3.5)
    assert check.passed, check
    # adapted acceptance should sit near the RWMH optimum
    acc = float(jnp.mean(res.info.accept_prob))
    assert 0.1 < acc < 0.5


def test_rwmh_shape_adaptation():
    # anisotropic target: per-dim proposal std must track target std
    stds = jnp.array([0.1, 1.0, 10.0])
    t = DiagNormal(loc=jnp.zeros(3), scale=stds)
    q0 = t.sample(jax.random.key(0), 64)
    res = run_rwmh(jax.random.key(1), t.log_density, q0,
                   num_warmup=800, num_samples=200)
    ratio = np.asarray(res.sigma) / np.asarray(stds)
    # each dim's proposal shape within 2x of the target scale
    assert np.all(ratio > 0.5) and np.all(ratio < 2.0)


def test_flow_imh_exact_proposal_always_accepts():
    # with flow == identity and target == base, q == p: every proposal
    # accepts and the draws are iid N(0, I)
    dim = 4
    t = StandardNormal(dim=dim)
    flow = Standardize.identity(dim)
    q0 = jax.random.normal(jax.random.key(0), (32, dim))
    res = run_flow_imh(jax.random.key(1), t.log_density, flow, q0,
                       num_samples=300)
    acc = float(jnp.mean(res.info.accepted.astype(jnp.float32)))
    assert acc > 0.999
    check = moment_gate(res.samples, t.mean(), jnp.diagonal(t.cov()),
                        n_sigma=3.5)
    assert check.passed, check


def test_parallel_tempering_mixes_bimodal():
    # well-separated bimodal mixture: beta=1 RWMH alone cannot cross;
    # replica exchange must populate both modes
    t = GaussianMixture.bimodal(dim=2, separation=8.0, scale=0.5)
    betas = geometric_betas(6, beta_min=0.02)
    q0 = jnp.zeros((32, 2)) + 4.0  # start everything in ONE mode
    res = run_parallel_tempering(
        jax.random.key(0), t.log_density, q0, betas,
        num_warmup=500, num_samples=1000,
    )
    assert res.samples.shape == (1000, 32, 2)
    # mode occupancy along the separation axis
    frac_pos = float(jnp.mean((res.samples[..., 0] > 0).astype(jnp.float32)))
    assert 0.25 < frac_pos < 0.75, f"stuck in one mode: frac_pos={frac_pos}"
    # neighbor swaps actually firing at every interface
    swap = jnp.mean(res.info.swap_accept, axis=0)
    assert float(jnp.min(swap)) > 0.05
    check = moment_gate(res.samples, t.mean(), jnp.diagonal(t.cov()),
                        n_sigma=4.0)
    assert check.max_sigma_mean < 4.0, check


def test_parallel_tempering_single_temperature_is_rwmh():
    # a 1-rung ladder must reduce to plain MH at beta = 1 (still correct)
    t = StandardNormal(dim=2)
    q0 = jax.random.normal(jax.random.key(0), (64, 2))
    res = run_parallel_tempering(
        jax.random.key(1), t.log_density, q0, jnp.ones((1,)),
        num_warmup=400, num_samples=600,
    )
    check = moment_gate(res.samples, t.mean(), jnp.diagonal(t.cov()),
                        n_sigma=3.5)
    assert check.passed, check
