"""Round-5 continuation of the engine-found generic recipe search
(VERDICT r4 next #2): resume `adaptive_fit` from the committed round-7
checkpoint (.adaptive_ckpt/adaptive_7 — the 7-module flow whose round-7
growth chose the first-half block mask but whose reverse-KL fit ran out
of round-4's wall clock) and give the fit the wall clock it needs.

Config: identical to scripts/adaptive_generic_artifact.py's search phase
except (a) max_rounds raised 10 -> 24 (pure wall-clock budget — the
stopping rule, ess_threshold 8000, is unchanged) and (b) vi_steps
4000 -> 6000 so the post-growth 9-module fit can actually converge
(round 7's fit was truncated mid-optimization last time). Both changes
are recorded in the artifact. Runs on CPU like the original search (the
flow transfers; eval happens on-chip via
  python scripts/adaptive_generic_artifact.py --phase eval
after this writes the found flow to docs/artifacts/adaptive_generic_flow).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax

jax.config.update("jax_platforms", "cpu")

from tpuflows.adaptive import AdaptiveConfig, adaptive_fit  # noqa: E402
from tpuflows.io import save_pytree  # noqa: E402
from tpuflows.targets import NealsFunnel  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
DIM = 64
FLOW_CKPT = os.path.join(ROOT, "docs", "artifacts", "adaptive_generic_flow")


def _flow_structure(flow):
    out = []
    for t in flow.transforms:
        name = type(t).__name__
        mask = getattr(t, "mask", None)
        if mask is not None:
            m = list(mask)
            if m == [1 - v for v in m[::-1]] and m[0] != m[1]:
                desc = f"checker{m[0]}"
            elif sum(m[:len(m) // 2]) in (0, len(m) // 2) and \
                    len(set(m[:len(m) // 2])) == 1:
                desc = f"block{m[0]}"
            else:
                desc = "mask?"
            out.append(f"{name}[{desc}]")
        else:
            out.append(name)
    return out


def main():
    cfg = AdaptiveConfig(
        flow_kind="arqs", n_blocks=1, knots=8, hidden=(128, 128),
        mask_scheme="alternating", clamp=8.0,
        n_chains=128, num_warmup=150, num_samples=150, max_depth=5,
        fit_method="reverse_kl", vi_steps=6000, vi_batch=1024,
        learning_rate=3e-3,
        grow_on_stall=True, grow_on_ess_stall=True,
        grow_is_ess_target=0.5, grow_min_gain=1.1,
        max_grown_blocks=4, max_rounds=24, ess_threshold=8000.0,
    )
    t0 = time.perf_counter()
    res = adaptive_fit(jax.random.key(0), NealsFunnel(dim=DIM).log_density,
                       DIM, cfg,
                       checkpoint_dir=os.path.join(ROOT, ".adaptive_ckpt"),
                       verbose=True)
    wall = time.perf_counter() - t0
    save_pytree(FLOW_CKPT, {"flow": res.flow})
    rounds = [
        {"min_ess": round(float(r.min_ess), 1),
         "flow_is_ess": round(float(r.flow_is_ess), 4),
         "accept": round(float(r.accept_rate), 3)}
        for r in res.rounds
    ]
    row = {
        "phase": "search_continuation_r5",
        "backend": jax.default_backend(),
        "resumed_from": "adaptive_7",
        "config_delta_vs_r4_search": {"max_rounds": [10, 24],
                                      "vi_steps": [4000, 6000]},
        "n_rounds": res.n_rounds,
        "converged": bool(res.converged),
        "continuation_wall_s": round(wall, 1),
        "structure_found": _flow_structure(res.flow),
        "rounds": rounds,
    }
    print(json.dumps(row))
    with open(FLOW_CKPT + "_search_r5.json", "w") as f:
        f.write(json.dumps(row) + "\n")


if __name__ == "__main__":
    main()
