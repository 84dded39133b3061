"""SMC checkpoint/resume (SURVEY.md §5 failure recovery): a run killed with
SIGKILL mid-annealing resumes from the last completed stage and finishes
with EXACTLY the result of an uninterrupted run (same keys, same ladder)."""
import os
import signal
import subprocess
import sys
import time

import pytest

import jax
import jax.numpy as jnp

from tpuflows.flows import build_flow
from tpuflows.smc import SMCConfig, run_smc
from tpuflows.targets import DiagNormal

_CFG = dict(n_particles=512, n_mutation_steps=2, n_leapfrog=3,
            target_rel_ess=0.9, max_stages=40, retrain_every=2,
            retrain_epochs=3, retrain_batches=4)


def _run(key, ckpt=None):
    t = DiagNormal(loc=jnp.array([1.0, -1.0]), scale=jnp.array([0.5, 2.0]))
    init = jax.random.normal(jax.random.key(0), (256, 2))
    flow = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2,
                      hidden=(8,))
    return run_smc(key, t.log_density, flow, 2, SMCConfig(**_CFG),
                   checkpoint_dir=ckpt)


@pytest.mark.slow  # 3 full SMC runs (~70 s CPU); the fast tier keeps
# per-stage checkpointing covered via test_adaptive_resume
def test_smc_resume_matches_uninterrupted(tmp_path):
    ckpt = str(tmp_path / "smc")
    ref = _run(jax.random.key(2))

    # "interrupted": run with max_stages=2 (simulates dying after stage 2)
    t = DiagNormal(loc=jnp.array([1.0, -1.0]), scale=jnp.array([0.5, 2.0]))
    init = jax.random.normal(jax.random.key(0), (256, 2))
    flow = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2,
                      hidden=(8,))
    partial_cfg = dict(_CFG, max_stages=2)
    run_smc(jax.random.key(2), t.log_density, flow, 2,
            SMCConfig(**partial_cfg), checkpoint_dir=ckpt)

    # resume to completion
    res = _run(jax.random.key(2), ckpt=ckpt)
    assert res.n_stages == ref.n_stages
    assert float(res.betas[-1]) == 1.0
    assert jnp.allclose(res.log_z, ref.log_z, atol=1e-5)
    assert jnp.allclose(res.particles, ref.particles, atol=1e-5)


@pytest.mark.slow  # real-subprocess SIGKILL: two cold jax starts (~25 s);
# the in-process resume semantics are covered by the fast test above
def test_smc_kill9_resume(tmp_path):
    """Real process kill: SIGKILL the interpreter mid-SMC, then resume."""
    ckpt = str(tmp_path / "smc")
    script = f"""
import sys; sys.path.insert(0, {str(os.path.join(os.path.dirname(__file__), os.pardir, 'src'))!r})
import jax; jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp
from tpuflows.flows import build_flow
from tpuflows.smc import SMCConfig, run_smc
from tpuflows.targets import DiagNormal
t = DiagNormal(loc=jnp.array([1.0, -1.0]), scale=jnp.array([0.5, 2.0]))
init = jax.random.normal(jax.random.key(0), (256, 2))
flow = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2, hidden=(8,))
res = run_smc(jax.random.key(2), t.log_density, flow, 2,
              SMCConfig(**{_CFG!r}), checkpoint_dir={ckpt!r}, verbose=True)
print("FINAL", res.n_stages, float(res.log_z))
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    p = subprocess.Popen([sys.executable, "-c", script], env=env,
                         stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
                         text=True)
    # wait for at least one stage checkpoint to land, then SIGKILL
    deadline = time.time() + 120
    while time.time() < deadline:
        if p.poll() is not None:
            break  # finished before we killed it — resume is then a no-op
        if any(f.startswith("smc_") and f.endswith(".npz")
               for f in os.listdir(tmp_path / "smc")) if (
                   tmp_path / "smc").exists() else False:
            time.sleep(0.2)  # let a stage or two land
            p.send_signal(signal.SIGKILL)
            p.wait()
            break
        time.sleep(0.1)
    else:
        p.kill()
        raise AssertionError("no checkpoint appeared within 120s")

    # resume in-process and check the final state is complete and sane
    res = _run(jax.random.key(2), ckpt=ckpt)
    ref = _run(jax.random.key(2))
    assert float(res.betas[-1]) == 1.0
    assert res.n_stages == ref.n_stages
    assert jnp.allclose(res.log_z, ref.log_z, atol=1e-5)
