"""Checkpoint / resume.

Reference parity (SURVEY.md §5): the reference has NO in-package
checkpointing (users reach for JLD2/BSON externally); here it is
first-class — every piece of engine state (flow params, optimizer state,
chain positions, SMC particle shards, PRNG keys, adaptive-round records)
is a pytree, so one save/load pair covers all of them and the adaptive
loop resumes mid-round.

Format: one .npz per checkpoint holding the array leaves (numpy,
host-fetched) + a pickled treedef sidecar for the structure (our
pytree_dataclasses pickle cleanly) + a small .meta.json recording the
process count and each leaf's layout ("replicated" vs "sharded0" —
row-sharded along axis 0, the engine's only sharded axis). Multi-host:
each process writes its own `*_p{index}` pair for its addressable rows;
single-host writes one pair. Atomic via tmp-file rename.

RESHARD-ON-RESTORE: `load_pytree` transparently restores checkpoints
written by a DIFFERENT process count (shared filesystem assumed, the
normal pod setup): "sharded0" leaves are reassembled from all saved
process shards in index order and re-sliced into this process's equal
block; "replicated" leaves are read from shard 0. A 4-host checkpoint
restores on 1 host and vice versa — the round-1 gap.
"""
from __future__ import annotations

import json
import os
import pickle
import re
from typing import Any, Optional

import jax
import numpy as np


def _suffix(pid: int, pcount: int) -> str:
    return f"_p{pid}" if pcount > 1 else ""


def _paths(path: str, pid: int, pcount: int) -> tuple:
    s = _suffix(pid, pcount)
    return f"{path}{s}.npz", f"{path}{s}.tree", f"{path}.meta.json"


def _leaf_layout(leaf) -> str:
    """'sharded0' if the leaf is distributed along axis 0 across processes,
    else 'replicated'. Non-jax leaves (numpy/scalars) are replicated."""
    sharding = getattr(leaf, "sharding", None)
    if sharding is None:
        return "replicated"
    try:
        if sharding.is_fully_replicated:
            return "replicated"
    except Exception:
        return "replicated"
    return "sharded0"


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays (+ hashable statics) to `path{.npz,.tree}`.

    Each process writes its addressable rows of sharded leaves; layout
    metadata makes the checkpoint restorable under any process count."""
    pid, pcount = jax.process_index(), jax.process_count()
    npz_path, tree_path, meta_path = _paths(path, pid, pcount)
    os.makedirs(os.path.dirname(os.path.abspath(npz_path)), exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {}
    layouts = []
    for i, leaf in enumerate(leaves):
        layouts.append(_leaf_layout(leaf))
        if hasattr(leaf, "dtype") and "key" in str(leaf.dtype):
            # typed PRNG keys -> raw uint32 data, flagged for reload
            arrays[f"key_{i}"] = np.asarray(jax.random.key_data(leaf))
        elif layouts[-1] == "sharded0" and pcount > 1:
            # this process's addressable rows only
            shards = [s for s in leaf.addressable_shards]
            shards.sort(key=lambda s: s.index[0].start or 0)
            arrays[f"leaf_{i}"] = np.concatenate(
                [np.asarray(s.data) for s in shards], axis=0)
        else:
            arrays[f"leaf_{i}"] = np.asarray(leaf)
    tmp = npz_path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(f, **arrays)
    os.replace(tmp, npz_path)
    tmp = tree_path + ".tmp"
    with open(tmp, "wb") as f:
        pickle.dump(treedef, f)
    os.replace(tmp, tree_path)
    if pid == 0:
        tmp = meta_path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"process_count": pcount, "layouts": layouts}, f)
        os.replace(tmp, meta_path)


def _read_shard(path: str, pid: int, pcount: int):
    npz_path, tree_path, _ = _paths(path, pid, pcount)
    with open(tree_path, "rb") as f:
        treedef = pickle.load(f)
    return np.load(npz_path), treedef


def _leaf_from(data, i: int, as_numpy: bool = False):
    if f"key_{i}" in data:
        if as_numpy:
            return data[f"key_{i}"]
        return jax.random.wrap_key_data(jax.numpy.asarray(data[f"key_{i}"]))
    return data[f"leaf_{i}"] if as_numpy else jax.numpy.asarray(
        data[f"leaf_{i}"])


def load_pytree(path: str) -> Any:
    """Load a pytree saved by save_pytree.

    Same process count: reads this process's shard directly. Different
    process count: reshards (see module docstring)."""
    pid, pcount = jax.process_index(), jax.process_count()
    _, _, meta_path = _paths(path, pid, pcount)
    meta = None
    if os.path.exists(meta_path):
        with open(meta_path) as f:
            meta = json.load(f)
    saved_count = meta["process_count"] if meta else None

    if saved_count is None or saved_count == pcount:
        data, treedef = _read_shard(path, pid, pcount)
        n = len(data.files)
        leaves = [_leaf_from(data, i) for i in range(n)]
        return jax.tree_util.tree_unflatten(treedef, leaves)

    # ---- reshard: reassemble global leaves from the saved shards --------
    shards = [_read_shard(path, p, saved_count)[0]
              for p in range(saved_count)]
    treedef = _read_shard(path, 0, saved_count)[1]
    layouts = meta["layouts"]
    n = len(shards[0].files)
    leaves = []
    for i in range(n):
        if layouts[i] == "sharded0" and saved_count > 1:
            full = np.concatenate(
                [_leaf_from(s, i, as_numpy=True) for s in shards], axis=0)
        else:
            full = _leaf_from(shards[0], i, as_numpy=True)
        if layouts[i] == "sharded0" and pcount > 1:
            # this process's equal block of the global rows
            rows = full.shape[0]
            if rows % pcount != 0:
                raise ValueError(
                    f"cannot reshard leaf {i}: {rows} rows over "
                    f"{pcount} processes")
            blk = rows // pcount
            full = full[pid * blk:(pid + 1) * blk]
        if f"key_{i}" in shards[0]:
            leaves.append(jax.random.wrap_key_data(jax.numpy.asarray(full)))
        else:
            leaves.append(jax.numpy.asarray(full))
    return jax.tree_util.tree_unflatten(treedef, leaves)


def latest_checkpoint(directory: str, prefix: str = "ckpt_") -> Optional[str]:
    """Highest-step checkpoint path (without extension) or None."""
    if not os.path.isdir(directory):
        return None
    pat = re.compile(re.escape(prefix) + r"(\d+)(?:_p\d+)?\.npz$")
    steps = [int(m.group(1)) for f in os.listdir(directory)
             if (m := pat.match(f))]
    if not steps:
        return None
    return os.path.join(directory, f"{prefix}{max(steps)}")
