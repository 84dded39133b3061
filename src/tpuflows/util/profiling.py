"""Tracing / profiling / metrics.

Reference parity (SURVEY.md §5): the reference has NOTHING built in (users
reach for Julia @profile ad hoc); here tracing and metrics are first-class:

  - `named_scope`: re-exported jax.named_scope — hot phases (leapfrog,
    spline eval, resample, train step) are annotated so XProf/TensorBoard
    traces show engine phases, not XLA op soup.
  - `trace(logdir)`: context manager around jax.profiler.start/stop_trace.
  - `MetricsLogger`: structured JSONL emitter on host 0 (stdout or file) —
    the observability channel run.py and bench.py write to.
  - `Timer`: wall-clock phase timer whose stop() forces a host readback of
    a representative array, because through the axon TPU tunnel
    `block_until_ready` can return before device completion (measured:
    27 PFLOP/s "matmuls" without readback).
"""
from __future__ import annotations

import json
import sys
import time
from contextlib import contextmanager
from typing import Any, Optional

import jax
import jax.numpy as jnp

named_scope = jax.named_scope


@contextmanager
def trace(logdir: str):
    """Capture a device trace viewable in TensorBoard/XProf."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class Timer:
    """Wall-clock phase timer with forced device sync at stop."""

    def __init__(self):
        self._t0 = time.perf_counter()

    def stop(self, sync_on: Optional[Any] = None) -> float:
        if sync_on is not None:
            leaves = jax.tree_util.tree_leaves(sync_on)
            if leaves:
                float(jnp.sum(jnp.ravel(leaves[0])[:1]))
        return time.perf_counter() - self._t0


class MetricsLogger:
    """JSONL metrics on process 0. Each record gets a wall timestamp."""

    def __init__(self, path: Optional[str] = None, stream=None):
        """`path`: append JSONL to a file; otherwise write to `stream`
        (default stderr). Only process 0 emits."""
        self._active = jax.process_index() == 0
        self._fh = open(path, "a") if (path and self._active) else None
        self._stream = stream

    def log(self, **record) -> None:
        if not self._active:
            return
        record = {"ts": round(time.time(), 3), **{
            k: (float(v) if hasattr(v, "dtype") else v)
            for k, v in record.items()
        }}
        line = json.dumps(record)
        if self._fh is not None:
            self._fh.write(line + "\n")
            self._fh.flush()
        else:
            print(line, file=self._stream or sys.stderr, flush=True)

    def close(self) -> None:
        if self._fh is not None:
            self._fh.close()
