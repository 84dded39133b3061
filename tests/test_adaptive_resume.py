"""Adaptive-loop checkpoint/resume (SURVEY.md §5 restartability)."""
import jax
import pytest
import jax.numpy as jnp

from tpuflows.adaptive import AdaptiveConfig, adaptive_fit
from tpuflows.targets import DiagNormal


def _cfg(max_rounds):
    return AdaptiveConfig(
        max_rounds=max_rounds,
        ess_threshold=1e9,  # never converge; run all rounds
        n_chains=8,
        num_warmup=50,
        num_samples=50,
        flow_kind="affine",
        n_blocks=1,
        hidden=(8,),
        train_epochs=5,
        train_batches=2,
    )


@pytest.mark.slow  # 2 full adaptive-loop compiles; resume semantics also
# covered by the SMC fast resume test + kill-9 slow variants
def test_adaptive_resume_matches_uninterrupted(tmp_path):
    t = DiagNormal(loc=jnp.zeros(2), scale=jnp.ones(2))
    ckpt = str(tmp_path / "run")

    # interrupted: 1 round with checkpointing, then resume for 2 more
    r1 = adaptive_fit(jax.random.key(0), t.log_density, 2, _cfg(1),
                      checkpoint_dir=ckpt)
    assert r1.n_rounds == 1
    r2 = adaptive_fit(jax.random.key(0), t.log_density, 2, _cfg(3),
                      checkpoint_dir=ckpt)
    assert r2.n_rounds == 3
    assert len(r2.rounds) == 3

    # resumed run keeps improving / stays sane
    assert bool(jnp.isfinite(r2.rounds[-1].final_loss))
    # round-1 record identical in both runs (resume restored history)
    assert jnp.allclose(r1.rounds[0].min_ess, r2.rounds[0].min_ess)
