"""Checkpoint restore across process-count changes (SURVEY.md §5
"per-host sharded" checkpoints; round-1 gap: `_p{i}` paths were pinned).

Real multi-process jax isn't available on one host, so the process axis is
simulated by monkeypatching jax.process_index/process_count (the only two
process facts the checkpoint code consults) and classifying 2-D leaves as
row-sharded the way a pod run's sharding introspection would."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import tpuflows.io.checkpoint as ckpt


@pytest.fixture
def fake_procs(monkeypatch):
    state = {"pid": 0, "count": 1}

    def set_proc(pid, count):
        state["pid"], state["count"] = pid, count

    monkeypatch.setattr(jax, "process_index", lambda: state["pid"])
    monkeypatch.setattr(jax, "process_count", lambda: state["count"])
    # classify leaves the way a real pod's sharding introspection would:
    # 2-D float arrays = row-sharded particles; everything else replicated
    monkeypatch.setattr(
        ckpt, "_leaf_layout",
        lambda leaf: "sharded0" if getattr(leaf, "ndim", 0) == 2
        else "replicated")
    return set_proc


def _tree(rows):
    return {
        "particles": rows,  # (n_local, d) — "sharded"
        "flow_param": jnp.arange(4.0),  # replicated
        "key": jax.random.key(7),
        "beta": jnp.asarray(0.5),
    }


def test_restore_2proc_to_1proc(tmp_path, fake_procs):
    full = jnp.arange(16.0 * 3).reshape(16, 3)
    path = str(tmp_path / "ck")

    # each fake process saves its half of the particle rows (a real pod
    # process's addressable rows; the single-device array's one
    # addressable shard IS that local block)
    for pid in (0, 1):
        fake_procs(pid, 2)
        ckpt.save_pytree(path, _tree(full[pid * 8:(pid + 1) * 8]))

    # restore on ONE process: rows reassembled in process order
    fake_procs(0, 1)
    out = ckpt.load_pytree(path)
    assert np.allclose(np.asarray(out["particles"]), np.asarray(full))
    assert np.allclose(np.asarray(out["flow_param"]), np.arange(4.0))
    assert np.array_equal(jax.random.key_data(out["key"]),
                          jax.random.key_data(jax.random.key(7)))
    assert float(out["beta"]) == 0.5


def test_restore_1proc_to_2proc(tmp_path, fake_procs):
    full = jnp.arange(16.0 * 3).reshape(16, 3)
    path = str(tmp_path / "ck")

    fake_procs(0, 1)
    ckpt.save_pytree(path, _tree(full))

    for pid in (0, 1):
        fake_procs(pid, 2)
        out = ckpt.load_pytree(path)
        assert np.allclose(np.asarray(out["particles"]),
                           np.asarray(full[pid * 8:(pid + 1) * 8]))
        assert np.allclose(np.asarray(out["flow_param"]), np.arange(4.0))


def test_same_count_roundtrip_unchanged(tmp_path):
    """No monkeypatching: the ordinary single-process path is untouched."""
    path = str(tmp_path / "ck")
    t = _tree(jnp.ones((6, 2)))
    ckpt.save_pytree(path, t)
    out = ckpt.load_pytree(path)
    assert np.allclose(np.asarray(out["particles"]), 1.0)
    assert float(out["beta"]) == 0.5
