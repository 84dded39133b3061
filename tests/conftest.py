"""Test conftest: run the suite on an 8-device virtual CPU mesh.

This is the fake-backend layer the reference lacks (SURVEY.md §4): real
shard_map/psum code paths execute on 8 host devices so distributed logic is
CI-testable without a pod.

Note: this environment's sitecustomize pre-imports jax and registers the
axon TPU backend, so env vars are too late — we must override through
jax.config before any backend is initialized. XLA_FLAGS is still read at
CPU-backend init, which happens lazily on first use.
"""
import os

_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    _flags = (_flags + " --xla_force_host_platform_device_count=8").strip()
if "xla_backend_optimization_level" not in _flags:
    # the fast tier is COMPILE-bound (dozens of NUTS/SMC/train programs on
    # tiny shapes): skipping XLA's CPU optimization pipeline cuts tier
    # wall-time ~30% and changes no semantics the tests rely on
    # (determinism tests compare same-process re-runs, statistical gates
    # don't time anything)
    _flags = _flags + " --xla_backend_optimization_level=0"
os.environ["XLA_FLAGS"] = _flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
