"""Measure the adaptive-overfit logZ bias of retrain_mode="reweight"
with and without cross-fitting (VERDICT r4 next #6).

Repro regime (the round-3 measurement that produced the "+0.2 nats"
SMCConfig caveat): dim 18, 4k particles, aggressive per-stage retrains
(retrain_every=1) against a target with KNOWN logZ — a normalized
diag-Gaussian plus a constant offset, so truth = log_c exactly.

For each mode (reweight+cross_fit, reweight legacy fit-on-all, freeze
control) run R independent replicates and report mean logZ error +-
standard error. Pass criterion for cross_fit: |mean bias| < 2 s.e.
(and visibly smaller than the legacy mode's bias).

Runs on CPU (tiny model; the point is statistics, not throughput):
  python scripts/reweight_bias.py [--replicates 12]
Artifact: docs/artifacts/reweight_bias.json
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "artifacts", "reweight_bias.json")
DIM = 18
LOG_C = 2.9


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--replicates", type=int, default=12)
    ap.add_argument("--particles", type=int, default=4096)
    args = ap.parse_args()

    from tpuflows.flows import build_flow
    from tpuflows.smc import SMCConfig, run_smc
    from tpuflows.targets import DiagNormal

    scale = jnp.exp(0.3 * jnp.sin(jnp.arange(DIM, dtype=jnp.float32)))
    target = DiagNormal(loc=0.5 * jnp.ones(DIM), scale=scale)
    logp = lambda x: target.log_density(x) + LOG_C  # noqa: E731

    init = jax.random.normal(jax.random.key(0), (1024, DIM), jnp.float32)
    flow0 = build_flow(init, jax.random.key(1), kind="affine", n_blocks=2,
                       hidden=(32, 32))

    modes = {
        "reweight_cross_fit": dict(retrain_mode="reweight",
                                   reweight_cross_fit=True),
        "reweight_fit_on_all": dict(retrain_mode="reweight",
                                    reweight_cross_fit=False),
        "freeze_control": dict(retrain_mode="freeze"),
    }
    rows = {}
    for name, kw in modes.items():
        cfg = SMCConfig(n_particles=args.particles, n_mutation_steps=3,
                        n_leapfrog=5, max_stages=40, retrain_every=1,
                        retrain_epochs=25, **kw)
        errs = []
        for r in range(args.replicates):
            res = run_smc(jax.random.key(100 + r), logp, flow0, DIM, cfg)
            assert float(res.betas[-1]) == 1.0
            errs.append(float(res.log_z) - LOG_C)
        errs = np.asarray(errs)
        se = float(errs.std(ddof=1) / np.sqrt(len(errs)))
        rows[name] = {
            "mean_bias_nats": round(float(errs.mean()), 4),
            "se": round(se, 4),
            "bias_over_se": round(float(errs.mean()) / se, 2),
            "replicates": len(errs),
        }
        print(json.dumps({name: rows[name]}))

    cf = rows["reweight_cross_fit"]
    verdict = {
        "artifact": "reweight_cross_fit_bias",
        "dim": DIM, "n_particles": args.particles, "log_z_truth": LOG_C,
        "modes": rows,
        "cross_fit_unbiased_at_2se": abs(cf["mean_bias_nats"])
        < 2 * cf["se"],
    }
    print(json.dumps(verdict))
    with open(OUT, "w") as f:
        f.write(json.dumps(verdict) + "\n")


if __name__ == "__main__":
    main()
