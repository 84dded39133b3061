"""Checkpoint / resume.

Reference parity (SURVEY.md §5): the reference has NO in-package
checkpointing (users reach for JLD2/BSON externally); here it is
first-class — every piece of engine state (flow params, optimizer state,
chain positions, SMC particle shards, PRNG keys, adaptive-round records)
is a pytree, so one save/load pair covers all of them and the adaptive
loop resumes mid-round.

Format: one .npz per checkpoint holding the array leaves (numpy,
host-fetched) + a pickled treedef sidecar for the structure (our
pytree_dataclasses pickle cleanly). Multi-host: each process writes its
own `*_p{process_index}` pair for its addressable shards; single-host
writes one pair. Atomic via tmp-file rename.
"""
from __future__ import annotations

import os
import pickle
import re
from typing import Any, Optional

import jax
import numpy as np


def _paths(path: str) -> tuple:
    pid = jax.process_index()
    suffix = f"_p{pid}" if jax.process_count() > 1 else ""
    return f"{path}{suffix}.npz", f"{path}{suffix}.tree"


def save_pytree(path: str, tree: Any) -> None:
    """Save a pytree of arrays (+ hashable statics) to `path{.npz,.tree}`."""
    npz_path, tree_path = _paths(path)
    os.makedirs(os.path.dirname(os.path.abspath(npz_path)), exist_ok=True)
    leaves, treedef = jax.tree_util.tree_flatten(tree)
    arrays = {}
    for i, leaf in enumerate(leaves):
        if hasattr(leaf, "dtype") and "key" in str(leaf.dtype):
            # typed PRNG keys -> raw uint32 data, flagged for reload
            arrays[f"key_{i}"] = np.asarray(jax.random.key_data(leaf))
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


def load_pytree(path: str) -> Any:
    """Load a pytree saved by save_pytree (this process's shard)."""
    npz_path, tree_path = _paths(path)
    with open(tree_path, "rb") as f:
        treedef = pickle.load(f)
    data = np.load(npz_path)
    n = len(data.files)
    leaves = []
    for i in range(n):
        if f"key_{i}" in data:
            leaves.append(jax.random.wrap_key_data(
                jax.numpy.asarray(data[f"key_{i}"])))
        else:
            leaves.append(jax.numpy.asarray(data[f"leaf_{i}"]))
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
