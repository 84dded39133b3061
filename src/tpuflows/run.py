"""Config-file runner: `python -m tpuflows.run configs/c4_funnel.json`.

The thin CLI the reference never had (SURVEY.md §7 non-goals allow "a thin
config-file runner"). Executes one RunConfig task end-to-end, emits
structured JSONL metrics on stdout (SURVEY.md §5 observability), and
writes checkpoints when `output_dir` is set.
"""
from __future__ import annotations

import os
import sys

import jax
import jax.numpy as jnp
import optax

from tpuflows.util.profiling import MetricsLogger, Timer

# JSONL metrics: stdout on process 0, plus a file when TPUFLOWS_METRICS is
# set (SURVEY.md §5 observability channel).
_metrics = MetricsLogger(path=os.environ.get("TPUFLOWS_METRICS"),
                         stream=sys.stdout)


def _emit(record: dict) -> None:
    _metrics.log(**record)


def run(cfg) -> dict:
    """Execute one config under the env-configured FailurePolicy
    (TPUFLOWS_COLLECTIVE_TIMEOUT_S): on a multi-host mesh a dead peer turns
    the next collective into a hang and the watchdog converts the hang into
    a process exit so the supervisor restarts every worker from the last
    checkpoint (SURVEY.md §5 failure detection).

    Guard granularity matches checkpoint granularity: the staged tasks
    (`smc`, `adaptive`) guard EACH stage/round internally (see
    `run_smc`/`adaptive_fit`), so the env timeout is a per-stage budget and
    recovery loses at most one stage. The single-program tasks (fit, vi,
    nuts, mh, pt) have no intermediate checkpoints, so they are guarded
    whole — for those the timeout must cover the full task."""
    from tpuflows.dist import FailurePolicy

    if cfg.task in ("smc", "adaptive"):
        return _run_task(cfg)  # per-stage guards live inside the driver
    policy = FailurePolicy.from_env()
    return policy.guard(_run_task, cfg, phase=f"task:{cfg.task}")


def _flow_from_spec(samples, key, spec):
    """build_flow with every FlowSpec knob applied (one call site per task)."""
    from tpuflows.flows import build_flow

    return build_flow(samples, key, kind=spec.kind, n_blocks=spec.n_blocks,
                      knots=spec.knots, hidden=spec.hidden,
                      use_pallas=spec.use_pallas,
                      mask_scheme=spec.mask_scheme, n_leading=spec.n_leading,
                      clamp=spec.clamp)


def _run_task(cfg) -> dict:
    from tpuflows.adaptive import adaptive_fit
    from tpuflows.diagnostics import effective_sample_size, split_rhat
    from tpuflows.flows import optimize_flow
    from tpuflows.io import save_pytree
    from tpuflows.mcmc import run_nuts
    from tpuflows.mcmc.preconditioned import flow_reparameterized
    from tpuflows.smc import run_smc
    from tpuflows.vi import fit_vi

    key = jax.random.key(cfg.seed)
    target = cfg.target.build()
    dim = cfg.target.dim
    k_data, k_build, k_task = jax.random.split(key, 3)
    timer = Timer()

    if cfg.task == "fit":
        samples = target.sample(k_data, cfg.train.n_fit_samples)
        flow = _flow_from_spec(samples, k_build, cfg.flow)
        res = optimize_flow(k_task, samples, flow,
                            optax.adam(cfg.train.learning_rate),
                            nbatches=cfg.train.nbatches,
                            nepochs=cfg.train.nepochs)
        out = {"final_loss": float(res.loss_hist[-1]),
               "initial_loss": float(res.loss_hist[0])}
        state = res.result
    elif cfg.task == "vi":
        init = jax.random.normal(k_data, (cfg.train.batch_size, dim))
        flow = _flow_from_spec(init, k_build, cfg.flow)
        res = fit_vi(k_task, target.log_density, flow, dim,
                     optimizer=optax.adam(cfg.train.learning_rate),
                     batch_size=cfg.train.batch_size,
                     nsteps=cfg.train.nsteps)
        out = {"final_elbo": float(res.final_elbo)}
        state = res.flow
    elif cfg.task == "adaptive":
        acfg = cfg.adaptive.to_adaptive_config(cfg.flow)
        res = adaptive_fit(k_task, target.log_density, dim, acfg, verbose=True)
        out = {"n_rounds": res.n_rounds, "converged": res.converged,
               "min_ess": float(res.rounds[-1].min_ess),
               "best_min_ess": float(res.best_min_ess),
               "flow_is_ess": float(res.rounds[-1].flow_is_ess)}
        # ship the best-measured preconditioner, not necessarily the last
        # refit (AdaptiveResult.best_flow)
        state = res.best_flow if res.best_flow is not None else res.flow
    elif cfg.task == "nuts":
        q0 = jax.random.normal(k_data, (cfg.nuts.n_chains, dim))
        if cfg.nuts.preconditioned:
            init = jax.random.normal(k_build, (2048, dim))
            flow = _flow_from_spec(init, k_build, cfg.flow)
            vres = fit_vi(k_task, target.log_density, flow, dim,
                          batch_size=cfg.train.batch_size,
                          nsteps=cfg.train.nsteps)
            flow = vres.flow
            logp = flow_reparameterized(target.log_density, flow)
        else:
            flow = None
            logp = target.log_density
        # whole-transition Pallas kernel in its validated regime (see
        # NUTSSpec.fused_kernel): preconditioned + affine flow + TPU
        transition = None
        fk = cfg.nuts.fused_kernel
        if fk == "on" and flow is None:
            # ADVICE r4: fused_nuts_for_flow dereferences flow.transforms —
            # fail with the actual contract instead of an AttributeError
            raise ValueError(
                "nuts.fused_kernel='on' requires nuts.preconditioned=true "
                "(the fused transition runs in a flow's latent space)")
        # round 5: "auto" covers arqs too (streamed per-block spline
        # backward lifted the chain tile to 128; measured 1.27x metric
        # over the XLA path — docs/artifacts/bench_generic_fused_ab.json)
        if fk == "on" or (fk == "auto" and flow is not None
                          and cfg.flow.kind in ("affine", "arqs", "rqs")
                          and jax.default_backend() == "tpu"):
            from tpuflows.kernels.nuts_pallas import fused_nuts_for_flow

            transition = fused_nuts_for_flow(
                target.log_density, flow, max_depth=cfg.nuts.max_depth)
        res = run_nuts(k_task, logp, q0, num_warmup=cfg.nuts.num_warmup,
                       num_samples=cfg.nuts.num_samples,
                       max_depth=cfg.nuts.max_depth,
                       target_accept=cfg.nuts.target_accept,
                       warmup_schedule=cfg.nuts.warmup_schedule,
                       chunk_size=cfg.nuts.chunk_size,
                       transition=transition)
        x = res.samples
        if flow is not None:
            # jitted + chunked over draws: an eager inverse materializes
            # the full (draws*chains, d, 3K-1) spline-param tensor at once
            # (GBs for RQS flows at production sizes — see bench.py)
            inv = jax.jit(lambda zz: flow.inverse(zz.reshape(-1, dim))
                          .reshape(zz.shape))
            x = jnp.concatenate(
                [inv(x[lo:lo + 64]) for lo in range(0, x.shape[0], 64)],
                axis=0)
        ess = effective_sample_size(x)
        out = {"min_ess": float(jnp.min(ess)),
               "max_rhat": float(jnp.max(split_rhat(x))),
               "step_size": float(res.step_size),
               "divergence_rate": float(jnp.mean(
                   res.info.diverging.astype(jnp.float32)))}
        state = x
    elif cfg.task == "mh":
        from tpuflows.mcmc import run_flow_imh, run_rwmh

        q0 = jax.random.normal(k_data, (cfg.mh.n_chains, dim))
        if cfg.mh.flow_proposal:
            init = jax.random.normal(k_build, (2048, dim))
            flow = _flow_from_spec(init, k_build, cfg.flow)
            flow = fit_vi(k_task, target.log_density, flow, dim,
                          batch_size=cfg.train.batch_size,
                          nsteps=cfg.train.nsteps).flow
            res = run_flow_imh(k_task, target.log_density, flow, q0,
                               num_samples=cfg.mh.num_samples)
        else:
            res = run_rwmh(k_task, target.log_density, q0,
                           num_warmup=cfg.mh.num_warmup,
                           num_samples=cfg.mh.num_samples,
                           target_accept=cfg.mh.target_accept)
        ess = effective_sample_size(res.samples)
        out = {"min_ess": float(jnp.min(ess)),
               "max_rhat": float(jnp.max(split_rhat(res.samples))),
               "accept_rate": float(jnp.mean(res.info.accept_prob))}
        state = res.samples
    elif cfg.task == "pt":
        from tpuflows.mcmc import geometric_betas, run_parallel_tempering

        q0 = jax.random.normal(k_data, (cfg.pt.n_chains, dim))
        betas = geometric_betas(cfg.pt.n_temps, cfg.pt.beta_min)
        res = run_parallel_tempering(
            k_task, target.log_density, q0, betas,
            num_warmup=cfg.pt.num_warmup, num_samples=cfg.pt.num_samples,
            target_accept=cfg.pt.target_accept)
        ess = effective_sample_size(res.samples)
        out = {"min_ess": float(jnp.min(ess)),
               "max_rhat": float(jnp.max(split_rhat(res.samples))),
               "mean_swap_accept": float(jnp.mean(res.info.swap_accept))}
        state = res.samples
    elif cfg.task == "smc":
        if cfg.smc.pretrain == "prior":
            # validated config-5 recipe: build + forward-KL-pretrain the
            # bridge flow on PRIOR draws (docs/artifacts/config5_fullspec.json)
            if not hasattr(target, "sample_prior"):
                raise ValueError(
                    f'smc.pretrain="prior" needs target.sample_prior; '
                    f"{cfg.target.kind!r} has none")
            init = target.sample_prior(k_data, cfg.smc.pretrain_draws)
            flow = _flow_from_spec(init, k_build, cfg.flow)
            flow = optimize_flow(
                k_build, init, flow, optax.adam(cfg.smc.pretrain_lr),
                nbatches=cfg.smc.pretrain_batches,
                nepochs=cfg.smc.pretrain_epochs).result
        else:
            init = jax.random.normal(k_data, (2048, dim))
            flow = _flow_from_spec(init, k_build, cfg.flow)
        mesh = None
        if cfg.smc.sharded:
            from tpuflows.dist import worker_mesh

            mesh = worker_mesh()
        ckpt = f"{cfg.output_dir}/smc_ckpt" if cfg.output_dir else None
        res = run_smc(k_task, target.log_density, flow, dim,
                      cfg.smc.to_smc_config(), mesh=mesh, verbose=True,
                      checkpoint_dir=ckpt)
        out = {"n_stages": res.n_stages, "log_z": float(res.log_z),
               "final_beta": float(res.betas[-1]),
               "mean_accept": float(jnp.mean(res.accept_hist))}
        state = res.particles
    else:
        raise ValueError(f"unknown task: {cfg.task!r}")

    out.update({"name": cfg.name, "task": cfg.task,
                "wall_s": round(timer.stop(sync_on=state), 2)})
    if cfg.output_dir:
        save_pytree(f"{cfg.output_dir}/{cfg.name}_state", state)
    _emit(out)
    return out


def main(argv=None) -> None:
    from tpuflows.config import RunConfig
    from tpuflows.dist import init_distributed

    argv = argv if argv is not None else sys.argv[1:]
    if not argv:
        print("usage: python -m tpuflows.run <config.json> [...]",
              file=sys.stderr)
        raise SystemExit(2)
    init_distributed()
    for path in argv:
        run(RunConfig.from_json(path))


if __name__ == "__main__":
    main()
