"""Failure detection for multi-host runs (SURVEY.md §5 "failure detection /
elastic recovery": detect peer loss via collective timeout, restart from the
last checkpoint).

The reference stack has no failure handling at all (SURVEY.md §5). On a TPU
pod the dominant failure mode is a *hung collective*: when a peer process
dies, every other process blocks forever inside the next `psum`/`all_gather`
— the call never raises. XLA gives no cancellation hook, so the only sound
recovery is: detect the hang from the host side, exit the process, and let
the supervisor restart every worker from the last checkpoint (the adaptive
loop and SMC both checkpoint each stage, so restarts lose at most one stage).

Three layers, smallest first:

- `heartbeat(mesh)`: an active liveness probe — a 1-element `psum` across
  the mesh. Completes in ~µs..ms when all peers are alive; hangs when one
  is gone. Run it under `run_with_timeout` to turn "hang" into an exception.
- `run_with_timeout(fn, *args, timeout_s)`: runs `fn` (typically a jitted
  step + host readback) in a worker thread and raises `CollectiveTimeout`
  if it does not complete in time. The hung thread cannot be cancelled
  (XLA limitation) — callers must treat the exception as fatal-for-this-
  process and escalate via their `FailurePolicy`.
- `FailurePolicy`: what to do on timeout — `"raise"` (default; unit tests,
  single-host), or `"exit"` (multi-host production: log on stderr and
  `os._exit(EXIT_PEER_LOSS)` so the pod supervisor restarts the job; a
  normal `sys.exit` would block in atexit handlers joining the hung thread).

Used by `tpuflows.run` when `TPUFLOWS_COLLECTIVE_TIMEOUT_S` is set.
"""
from __future__ import annotations

import concurrent.futures
import os
import sys
import threading
import time
from dataclasses import dataclass
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from tpuflows.dist.mesh import WORKERS

EXIT_PEER_LOSS = 43  # distinct from generic-error exit codes


class CollectiveTimeout(RuntimeError):
    """A device computation (usually a collective) did not complete in time.

    The underlying XLA call is still blocked in its worker thread and cannot
    be cancelled; the process should checkpoint nothing further and restart.
    """


def heartbeat(mesh: Mesh) -> float:
    """Active liveness probe: 1-element psum over every device in the mesh.

    Returns the probe's wall-clock latency in seconds. If any participating
    process has died this call HANGS (that is the failure signature on TPU
    pods) — wrap it in `run_with_timeout` to get an exception instead.
    """
    n = mesh.devices.size
    ones = jax.device_put(
        jnp.ones((n,), jnp.float32),
        NamedSharding(mesh, P(WORKERS)))

    @jax.jit
    def allsum(x):
        from jax import shard_map

        return shard_map(
            lambda s: jax.lax.psum(jnp.sum(s), WORKERS),
            mesh=mesh, in_specs=P(WORKERS), out_specs=P())(x)

    t0 = time.perf_counter()
    total = float(allsum(ones))  # host readback forces completion
    dt = time.perf_counter() - t0
    if total != float(n):
        raise RuntimeError(
            f"heartbeat psum returned {total}, expected {n}: mesh corrupt")
    return dt


def run_with_timeout(fn: Callable[..., Any], *args: Any,
                     timeout_s: float, **kwargs: Any) -> Any:
    """Run `fn(*args, **kwargs)` (device work + host readback) in a worker
    thread; raise `CollectiveTimeout` if it exceeds `timeout_s` seconds.

    The worker thread is a daemon: if the device call is truly hung it can
    never be joined, and the process must exit to recover (see module doc).
    """
    result: dict = {}

    def _target():
        try:
            # block on device work INSIDE the worker thread: jitted calls
            # dispatch asynchronously, so without this the timeout would
            # cover only dispatch, not execution (non-array leaves are
            # ignored by block_until_ready)
            result["value"] = jax.block_until_ready(fn(*args, **kwargs))
        except BaseException as e:  # noqa: BLE001 — reraised below
            result["error"] = e

    t = threading.Thread(target=_target, daemon=True,
                         name="tpuflows-collective")
    t.start()
    t.join(timeout_s)
    if t.is_alive():
        raise CollectiveTimeout(
            f"device step did not complete within {timeout_s}s — on a "
            f"multi-host mesh this is the peer-loss signature; restart "
            f"from the last checkpoint")
    if "error" in result:
        raise result["error"]
    return result["value"]


@dataclass(frozen=True)
class FailurePolicy:
    """How a long-running driver reacts to a collective timeout.

    timeout_s: per-phase budget (None disables detection entirely).
    action: "raise" → propagate CollectiveTimeout to the caller;
            "exit"  → log to stderr and os._exit(EXIT_PEER_LOSS) so the pod
                      supervisor restarts all workers from the checkpoint.
    """

    timeout_s: Optional[float] = None
    action: str = "raise"

    @staticmethod
    def from_env() -> "FailurePolicy":
        raw = os.environ.get("TPUFLOWS_COLLECTIVE_TIMEOUT_S")
        if not raw:
            return FailurePolicy(timeout_s=None)
        return FailurePolicy(
            timeout_s=float(raw),
            action=os.environ.get("TPUFLOWS_ON_PEER_LOSS", "exit"))

    def guard(self, fn: Callable[..., Any], *args: Any,
              phase: str = "step", **kwargs: Any) -> Any:
        """Run one phase under the policy. Identity pass-through when
        detection is disabled."""
        if self.timeout_s is None:
            return fn(*args, **kwargs)
        try:
            return run_with_timeout(fn, *args, timeout_s=self.timeout_s,
                                    **kwargs)
        except CollectiveTimeout as e:
            if self.action == "exit":
                print(f'{{"event": "peer_loss", "phase": "{phase}", '
                      f'"timeout_s": {self.timeout_s}, '
                      f'"process": {jax.process_index()}}}',
                      file=sys.stderr, flush=True)
                sys.stderr.flush()
                os._exit(EXIT_PEER_LOSS)
            raise e
