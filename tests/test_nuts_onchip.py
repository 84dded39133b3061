"""On-chip numerical equivalence of the Mosaic-compiled fused NUTS
kernel vs the plain-XLA math (VERDICT r4 next #5).

The fast tier's bitwise test runs the Pallas INTERPRETER on CPU; this
slow-tier test runs scripts/nuts_kernel_onchip_diff.py in a subprocess
(the suite's conftest pins this process to the CPU platform, so the TPU
check must happen out-of-process) whenever the host has a TPU, and
asserts its gates: <=1% knife-edge chains, branch-free energy tight on
every chain, f32-reassociation agreement elsewhere. Skips without TPU.
"""
import json
import os
import subprocess
import sys

import pytest

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
SCRIPT = os.path.join(ROOT, "scripts", "nuts_kernel_onchip_diff.py")


def _tpu_present() -> bool:
    probe = subprocess.run(
        [sys.executable, "-c",
         "import jax; print(jax.default_backend())"],
        capture_output=True, text=True, timeout=300,
        env={k: v for k, v in os.environ.items()
             if k not in ("JAX_PLATFORMS", "XLA_FLAGS")},
    )
    return probe.returncode == 0 and "tpu" in probe.stdout


@pytest.mark.slow  # two fused-kernel compiles on the real chip
def test_fused_kernel_onchip_matches_math():
    if not _tpu_present():
        pytest.skip("no TPU on this host")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    run = subprocess.run([sys.executable, SCRIPT], capture_output=True,
                         text=True, timeout=3000, env=env)
    assert run.returncode == 0, run.stdout + run.stderr
    row = json.loads(run.stdout.strip().splitlines()[-1])
    assert row["all_gates_passed"], row
    for r in row["rows"]:
        assert r["flip_chains"] <= r["n_chains"] // 100, r
        assert r["max_abs_diff_energy_all"] < 2e-2, r
