"""Validate the evidence estimators at PRODUCTION dims (VERDICT r4 next
#4): `integration/evidence.py`'s IS / Meng-Wong-bridge / harmonic routes
were tested only at d=2-3; this artifact runs them at

  (a) the 64-d Neal's funnel against analytic truth (the density is
      normalized, so log Z = 0), with the bench's ceiling flow fitted by
      reverse KL — the same flow family the north-star bench uses; and
  (b) the 256-d hierarchical posterior against quadrature-exact truth
      (`HierarchicalGaussian.log_evidence()`), with the config-5 affine
      leading-mask flow fitted by forward KL on posterior draws — the
      adaptive loop's product. The committed SMC thermodynamic route
      (docs/artifacts/config5_fullspec.json: -601.2831 +- 0.0114 vs
      truth -601.2837) is quoted alongside, giving all three routes of
      SURVEY.md §2b rows 16-17 at 256-d.

Posterior draws for the bridge/harmonic routes come from the targets'
EXACT samplers (both have one), which isolates estimator error from
sampler error — the estimators consume "given posterior draws" by
contract.

Error bars: delta-method s.e. of each logsumexp-mean in log space
(std of normalized weights / sqrt(n)); gate |logZ - truth| < 4 se + 0.02.

Usage: python scripts/evidence_production_dims.py
Artifact: docs/artifacts/evidence_production_dims.json
"""
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                "..", "src"))

import jax
import jax.numpy as jnp
import numpy as np
import optax

jax.config.update("jax_compilation_cache_dir",
                  os.path.join(os.path.dirname(os.path.dirname(
                      os.path.abspath(__file__))), ".jax_cache"))

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
OUT = os.path.join(ROOT, "docs", "artifacts",
                   "evidence_production_dims.json")


def _logmeanexp_se(log_w):
    """Delta-method s.e. of logmeanexp(log_w) over iid draws."""
    lw = np.asarray(log_w, np.float64)
    w = np.exp(lw - lw.max())
    return float(w.std(ddof=1) / (w.mean() * np.sqrt(lw.size)))


def _row(name, log_z, se, truth, ess=None, n=None):
    err = float(log_z) - truth
    gate = abs(err) < 4.0 * se + 0.02
    r = {"route": name, "log_z": round(float(log_z), 4),
         "se": round(se, 4), "error_nats": round(err, 4),
         "gate_passed": bool(gate)}
    if ess is not None:
        r["weight_ess"] = round(float(ess), 1)
    if n is not None:
        r["n"] = int(n)
    return r


def funnel_part():
    from tpuflows.flows import build_flow, make_reverse_kl_trainer
    from tpuflows.integration import (
        log_evidence_bridge,
        log_evidence_harmonic,
        log_evidence_is,
    )
    from tpuflows.targets import NealsFunnel
    from tpuflows.targets.base import std_normal_logpdf

    dim, truth = 64, 0.0
    t = NealsFunnel(dim=dim)
    init = jax.random.normal(jax.random.key(1), (1024, dim), jnp.float32)
    flow = build_flow(init, jax.random.key(2), kind="affine", n_blocks=1,
                      hidden=(128, 128), mask_scheme="leading", clamp=8.0)
    trainer = make_reverse_kl_trainer(
        t.log_density, dim,
        optax.chain(optax.clip_by_global_norm(10.0),
                    optax.adam(optax.cosine_decay_schedule(1e-2, 6000,
                                                           alpha=0.03))),
        batch_size=1024, stl=True, chunk_size=6000)
    flow = trainer(jax.random.key(3), flow, 6000).result

    n_is = 65536
    ires = log_evidence_is(jax.random.key(4), t.log_density, flow, dim,
                           n=n_is)
    # recompute the IS log-weights for the s.e. (same draw)
    z = jax.random.normal(jax.random.key(4), (n_is, dim), jnp.float32)
    x, ladj = flow.inverse_and_ladj(z)
    log_w = t.log_density(x) - (std_normal_logpdf(z) - ladj)
    se_is = _logmeanexp_se(log_w)

    draws = t.sample(jax.random.key(5), 8192)
    bres = log_evidence_bridge(jax.random.key(6), t.log_density, flow,
                               draws, n_proposal=16384)
    # bridge s.e.: conservative proxy = IS s.e. at the bridge's ESS scale
    se_br = float(1.0 / np.sqrt(max(float(bres.ess), 1.0)))
    hz = log_evidence_harmonic(t.log_density, flow, draws)
    zf, lf = flow.forward_and_ladj(draws)
    lw_h = np.asarray(std_normal_logpdf(zf) + lf - t.log_density(draws))
    se_h = _logmeanexp_se(lw_h)

    return {
        "target": "neals_funnel", "dim": dim, "log_z_truth": truth,
        "flow": "affine leading-mask (bench ceiling recipe, reverse-KL)",
        "routes": [
            _row("is_flow_proposal", ires.log_z, se_is, truth,
                 ess=ires.ess, n=n_is),
            _row("bridge_meng_wong", bres.log_z, se_br, truth,
                 ess=bres.ess, n=16384),
            _row("harmonic_flow_aux", hz, se_h, truth, n=8192),
        ],
    }


def hierarchical_part():
    from tpuflows.flows import build_flow, optimize_flow
    from tpuflows.integration import (
        log_evidence_bridge,
        log_evidence_harmonic,
        log_evidence_is,
    )
    from tpuflows.targets import HierarchicalGaussian
    from tpuflows.targets.base import std_normal_logpdf

    dim = 256
    t = HierarchicalGaussian.standard(dim=dim)
    truth = t.log_evidence()
    # IS lives and dies by KL(p || q): at 256-d every nat of forward KL
    # costs ESS exponentially. Four early-stopping-free fits failed IS
    # here (weight-ESS 26-84 of 65,536, errors of nats) and the round-5
    # diagnosis pinned the cause as pure OVER-TRAINING: the affine
    # leading-mask family contains the conditional transport and the fit
    # is essentially exact within ~3 epochs (held-out negll 405), after
    # which hundreds more epochs balloon the held-out loss to 800-1700
    # while the train loss keeps falling. optimize_flow(val_frac=...)
    # early stopping (added on that finding) fixes it outright —
    # measured fresh-draw KL ~ 0.0 and IS weight-ESS ~58k/65k.
    draws = t.sample(jax.random.key(10), 65536)
    flow = build_flow(draws, jax.random.key(11), kind="affine",
                      mask_scheme="leading", n_leading=2, n_blocks=2,
                      hidden=(256, 256), clamp=8.0)
    fres = optimize_flow(jax.random.key(12), draws, flow,
                         optax.adam(optax.cosine_decay_schedule(
                             1e-3, 600 * 16, alpha=0.01)),
                         nbatches=16, nepochs=600, val_frac=0.1)
    flow = fres.result

    n_is = 65536
    ires = log_evidence_is(jax.random.key(13), t.log_density, flow, dim,
                           n=n_is)
    z = jax.random.normal(jax.random.key(13), (n_is, dim), jnp.float32)
    x, ladj = flow.inverse_and_ladj(z)
    log_w = t.log_density(x) - (std_normal_logpdf(z) - ladj)
    se_is = _logmeanexp_se(log_w)

    post = t.sample(jax.random.key(14), 8192)
    bres = log_evidence_bridge(jax.random.key(15), t.log_density, flow,
                               post, n_proposal=16384)
    se_br = float(1.0 / np.sqrt(max(float(bres.ess), 1.0)))
    hz = log_evidence_harmonic(t.log_density, flow, post)
    zf, lf = flow.forward_and_ladj(post)
    lw_h = np.asarray(std_normal_logpdf(zf) + lf - t.log_density(post))
    se_h = _logmeanexp_se(lw_h)

    smc_committed = {"route": "smc_thermodynamic (committed, "
                              "config5_fullspec.json)",
                     "log_z": -601.2831, "se": 0.0114,
                     "error_nats": round(-601.2831 - truth, 4),
                     "gate_passed": bool(abs(-601.2831 - truth)
                                         < 4 * 0.0114 + 0.02)}
    return {
        "target": "hierarchical_gaussian", "dim": dim,
        "log_z_truth": round(truth, 4),
        "flow": "affine leading-2 (config-5 family, forward-KL on "
                "posterior draws)",
        "routes": [
            _row("is_flow_proposal", ires.log_z, se_is, truth,
                 ess=ires.ess, n=n_is),
            _row("bridge_meng_wong", bres.log_z, se_br, truth,
                 ess=bres.ess, n=16384),
            _row("harmonic_flow_aux", hz, se_h, truth, n=8192),
            smc_committed,
        ],
    }


def main():
    rows = {"artifact": "evidence_production_dims",
            "backend": jax.default_backend(),
            "parts": [funnel_part(), hierarchical_part()]}
    # Gate: ALL of IS / bridge / SMC-thermodynamic within 4 s.e. + 0.02
    # at BOTH dims (the strict reading of the round-4 item). History: the
    # 256-d IS leg failed four early-stopping-free fits (self-diagnosed
    # via weight-ESS 26-84 of 65,536) until the round-5 overfit diagnosis
    # added optimize_flow(val_frac=...) — with it the fit is ~exact and
    # IS passes with weight-ESS ~58k. Harmonic is reported as a
    # diagnostic (evidence.py: "prefer IS/bridge").
    all_pass = all(r["gate_passed"]
                   for p in rows["parts"] for r in p["routes"]
                   if not r["route"].startswith("harmonic"))
    rows["gated_routes_within_4se"] = bool(all_pass)
    line = json.dumps(rows)
    print(line)
    with open(OUT, "w") as f:
        f.write(line + "\n")
    if not all_pass:
        sys.exit(1)


if __name__ == "__main__":
    main()
