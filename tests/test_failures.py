"""Failure detection (SURVEY.md §5): collective-timeout watchdog + heartbeat.

The reference has no failure handling; these tests pin down the build's
peer-loss detection contract on the 8-virtual-device mesh:
  - heartbeat completes fast and returns the correct mesh-wide sum,
  - a hung device step is converted into CollectiveTimeout,
  - FailurePolicy pass-through / raise / env parsing.
"""
import os
import time

import jax
import jax.numpy as jnp
import pytest

from tpuflows.dist import (
    CollectiveTimeout,
    FailurePolicy,
    heartbeat,
    run_with_timeout,
    worker_mesh,
)


def test_heartbeat_alive_mesh():
    mesh = worker_mesh(8)
    dt = heartbeat(mesh)
    assert dt < 30.0  # generous: includes first-call compile
    # warm probe is fast
    assert heartbeat(mesh) < 1.0


def test_run_with_timeout_passes_results_and_errors():
    assert run_with_timeout(lambda a, b: a + b, 2, 3, timeout_s=5.0) == 5

    with pytest.raises(ValueError, match="boom"):
        run_with_timeout(lambda: (_ for _ in ()).throw(ValueError("boom")),
                         timeout_s=5.0)


def test_run_with_timeout_detects_hang():
    def hung_step():
        time.sleep(30.0)  # stands in for a psum blocked on a dead peer

    t0 = time.perf_counter()
    with pytest.raises(CollectiveTimeout, match="peer-loss"):
        run_with_timeout(hung_step, timeout_s=0.2)
    assert time.perf_counter() - t0 < 5.0  # detected promptly, not after 30s


def test_policy_disabled_is_identity():
    policy = FailurePolicy(timeout_s=None)
    assert policy.guard(lambda x: x * 2, 21) == 42


def test_policy_raise_action():
    policy = FailurePolicy(timeout_s=0.2, action="raise")
    with pytest.raises(CollectiveTimeout):
        policy.guard(time.sleep, 30.0, phase="unit")


def test_policy_from_env(monkeypatch):
    monkeypatch.delenv("TPUFLOWS_COLLECTIVE_TIMEOUT_S", raising=False)
    assert FailurePolicy.from_env().timeout_s is None

    monkeypatch.setenv("TPUFLOWS_COLLECTIVE_TIMEOUT_S", "12.5")
    p = FailurePolicy.from_env()
    assert p.timeout_s == 12.5
    assert p.action == "exit"  # production default

    monkeypatch.setenv("TPUFLOWS_ON_PEER_LOSS", "raise")
    assert FailurePolicy.from_env().action == "raise"


@pytest.mark.slow  # detection costs one full stage budget (~15 s) by design
def test_smc_stage_hang_recovers_losing_at_most_one_stage(
        tmp_path, monkeypatch):
    """Per-stage guard contract (VERDICT r2 item 5): hang ONE SMC stage;
    the watchdog raises within the stage budget, and a restarted run
    resumes from that stage's checkpoint — every completed stage survives.
    """
    import tpuflows.smc.sampler as sampler_mod
    from tpuflows.flows import build_flow
    from tpuflows.smc import SMCConfig, run_smc
    from tpuflows.targets import StandardNormal

    from tpuflows.targets import DiagNormal

    dim = 4
    # deliberately mismatched bridge (q0 = std normal vs shifted/widened
    # target) so the ESS-bisection ladder needs MANY stages — the hang at
    # stage 2 must happen before the run converges
    t = DiagNormal(loc=3.0 * jnp.ones(dim), scale=2.0 * jnp.ones(dim))
    draws = jax.random.normal(jax.random.key(0), (512, dim))
    flow = build_flow(draws, jax.random.key(1), kind="affine", n_blocks=1)
    cfg = SMCConfig(n_particles=256, n_mutation_steps=2, n_leapfrog=3,
                    max_stages=50)
    ckpt = str(tmp_path / "smc")
    # budget must cover one stage INCLUDING its first-call compile; the
    # injected hang (60 s) then trips it while real stages never do
    policy = FailurePolicy(timeout_s=15.0, action="raise")

    real_execute = sampler_mod._execute_stage
    calls = {"n": 0}

    def hang_on_third(stage, *args):
        if calls["n"] == 2:  # stages 0,1 complete; stage 2 hangs
            calls["n"] += 1
            time.sleep(60.0)  # stands in for a psum blocked on a dead peer
        calls["n"] += 1
        return real_execute(stage, *args)

    monkeypatch.setattr(sampler_mod, "_execute_stage", hang_on_third)
    with pytest.raises(CollectiveTimeout):
        run_smc(jax.random.key(2), t.log_density, flow, dim, cfg,
                checkpoint_dir=ckpt, failure_policy=policy)
    monkeypatch.setattr(sampler_mod, "_execute_stage", real_execute)

    # exactly stages 0 and 1 are on disk — the hang lost only stage 2
    from tpuflows.io import latest_checkpoint, load_pytree

    latest = latest_checkpoint(ckpt, prefix="smc_")
    st = load_pytree(latest)
    assert int(st["next_stage"]) == 2

    res = run_smc(jax.random.key(2), t.log_density, flow, dim, cfg,
                  checkpoint_dir=ckpt, failure_policy=policy, verbose=True)
    assert res.n_stages >= 2
    assert float(res.betas[-1]) == 1.0


def test_guarded_device_step_completes():
    """A real sharded computation passes through the watchdog untouched."""
    mesh = worker_mesh(8)
    policy = FailurePolicy(timeout_s=60.0, action="raise")

    def step():
        from jax import shard_map
        from jax.sharding import PartitionSpec as P

        x = jnp.arange(16, dtype=jnp.float32)
        f = shard_map(lambda s: jax.lax.psum(jnp.sum(s), "workers"),
                      mesh=mesh, in_specs=P("workers"), out_specs=P())
        return float(jax.jit(f)(x))

    assert policy.guard(step, phase="unit") == float(jnp.sum(jnp.arange(16)))
