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
