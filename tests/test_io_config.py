"""Checkpoint round-trip and config-system tests."""
import glob
import os

import jax
import jax.numpy as jnp
import optax
import pytest

from tpuflows.config import RunConfig
from tpuflows.flows import build_flow, negll_flow_loss
from tpuflows.io import latest_checkpoint, load_pytree, save_pytree

CONFIG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def test_checkpoint_roundtrip_flow(tmp_path):
    samples = jax.random.normal(jax.random.key(0), (256, 4))
    flow = build_flow(samples, jax.random.key(1), kind="rqs", n_blocks=2,
                      knots=4, hidden=(16,))
    opt = optax.adam(1e-3)
    state = {
        "flow": flow,
        "opt_state": opt.init(flow),
        "key": jax.random.key(7),
        "step": jnp.asarray(42),
    }
    path = str(tmp_path / "ckpt_42")
    save_pytree(path, state)
    loaded = load_pytree(path)
    assert int(loaded["step"]) == 42
    # PRNG key round-trips (typed key array)
    assert jnp.array_equal(
        jax.random.key_data(loaded["key"]), jax.random.key_data(state["key"])
    )
    # flow params identical -> identical loss
    x = jax.random.normal(jax.random.key(2), (64, 4))
    assert jnp.allclose(
        negll_flow_loss(loaded["flow"], x), negll_flow_loss(flow, x)
    )
    # optimizer state round-trips usably
    g = jax.grad(negll_flow_loss)(loaded["flow"], x)
    opt.update(g, loaded["opt_state"], loaded["flow"])


def test_latest_checkpoint(tmp_path):
    for step in (1, 10, 3):
        save_pytree(str(tmp_path / f"ckpt_{step}"), {"x": jnp.zeros(2)})
    latest = latest_checkpoint(str(tmp_path))
    assert latest.endswith("ckpt_10")
    assert latest_checkpoint(str(tmp_path / "nope")) is None


def test_all_shipped_configs_parse_and_build():
    paths = sorted(glob.glob(os.path.join(CONFIG_DIR, "*.json")))
    assert len(paths) == 5  # the five baseline configs
    for p in paths:
        cfg = RunConfig.from_json(p)
        target = cfg.target.build()
        assert target.dim == cfg.target.dim
        assert cfg.task in ("fit", "vi", "adaptive", "nuts", "smc")


def test_config_rejects_unknown_keys():
    with pytest.raises(ValueError, match="unknown keys"):
        RunConfig.from_dict({"name": "x", "task": "fit", "bogus": 1})
    with pytest.raises(ValueError, match="unknown keys"):
        RunConfig.from_dict(
            {"name": "x", "task": "fit", "flow": {"n_block": 4}}
        )


def test_run_task_fit_smoke():
    from tpuflows.run import run

    cfg = RunConfig.from_dict({
        "name": "smoke", "task": "fit", "seed": 0,
        "target": {"kind": "diag_normal", "dim": 2},
        "flow": {"kind": "affine", "n_blocks": 1, "hidden": [8]},
        "train": {"nepochs": 5, "nbatches": 2, "n_fit_samples": 128},
    })
    out = run(cfg)
    assert out["final_loss"] < out["initial_loss"] + 1.0
