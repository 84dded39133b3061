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
    os.environ["XLA_FLAGS"] = (
        _flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_threefry_partitionable", True)
