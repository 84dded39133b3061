"""Adaptive flow refinement: the train-sample-retrain loop.

Reference parity (SURVEY.md §2b row 15, §3.5): BAT.jl's flow-adaptive
transformed MCMC — the "adaptive" in AdaptiveFlows. Each round:

  1. sample the target through the current flow (flow-preconditioned NUTS
     in latent space; round 0 samples the raw target),
  2. fit/refresh the flow on the pooled samples (`optimize_flow`, forward
     KL), exactly the reference's interleaving of `optimize_flow` with
     `bat_sample`,
  3. stop when the cross-chain autocorrelation ESS of the latest draws
     clears the threshold (config 3, BASELINE.json:9).

TPU design: the outer loop is a host-side python loop (a handful of
rounds; each round re-traces only when flow structure changes — it never
does, params are donated pytrees), while everything inside a round (NUTS
warmup+draws, the full training scan) is jitted whole. Flow-quality is
additionally tracked per round as importance-weight ESS of flow draws
against the target — the same number the SMC bridge uses.
"""
from __future__ import annotations

from typing import Callable, NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from tpuflows.diagnostics import (
    effective_sample_size,
    importance_weight_ess,
    split_rhat,
)
from tpuflows.dist.failures import FailurePolicy
from tpuflows.flows.build import build_flow
from tpuflows.flows.core import Bijector
from tpuflows.flows.train import optimize_flow
from tpuflows.mcmc.preconditioned import flow_reparameterized
from tpuflows.mcmc.sample import run_nuts
from tpuflows.targets.base import std_normal_logpdf


class AdaptiveConfig(NamedTuple):
    """Knobs for `adaptive_fit` (reference: keyword args on the BAT loop)."""

    max_rounds: int = 5
    ess_threshold: float = 400.0  # min cross-chain ESS over dims to stop
    n_chains: int = 64
    num_warmup: int = 300
    num_samples: int = 300
    max_depth: int = 8
    target_accept: float = 0.8
    # flow fit per round. fit_method:
    #   "forward_kl" — the reference's recipe: fit the flow to the pooled
    #     NUTS draws (optimize_flow). Right when the sampler already
    #     reaches the whole target.
    #   "reverse_kl" — adaptive VI: fit by self-sampled reverse KL against
    #     the target density (fit_vi), which needs NO good draws — right
    #     for raw multiscale targets where round-0 sampling is the
    #     chicken-and-egg problem. Growth/stopping machinery unchanged.
    #   "hybrid" — forward-KL fit, then a reverse-KL refinement.
    fit_method: str = "forward_kl"
    vi_steps: int = 2000
    vi_batch: int = 1024
    flow_kind: str = "rqs"
    n_blocks: int = 4
    knots: int = 8
    hidden: tuple = (64, 64)
    mask_scheme: str = "alternating"
    clamp: float = 4.0  # affine log-scale soft-clamp (arqs growth units too)
    train_epochs: int = 60
    train_batches: int = 16
    learning_rate: float = 1e-3
    use_pallas: object = "auto"
    # -- adaptive GROWTH (reference append-module helpers, SURVEY.md §2a
    # row 2): when the flow-as-proposal quality stalls between rounds and
    # is still below `grow_is_ess_target`, append a fresh coupling block
    # (mask alternated past the existing blocks) before the next retrain.
    grow_on_stall: bool = False
    grow_is_ess_target: float = 0.5  # rel IS-ESS above which growth stops
    grow_min_gain: float = 1.1  # stall = is_ess < prev * this
    # also grow when the SAMPLING min-ESS (the loop's stopping target)
    # stalls below ess_threshold — the IS-ESS criterion alone can saturate
    # while the sampler still needs capacity (see maybe_grow_flow)
    grow_on_ess_stall: bool = False
    max_grown_blocks: int = 4


class AdaptiveRound(NamedTuple):
    """Per-round record (the reference's loss_hist, plus sampler health)."""

    min_ess: jax.Array
    max_rhat: jax.Array
    flow_is_ess: jax.Array  # importance-weight ESS of flow-as-proposal
    accept_rate: jax.Array
    divergence_rate: jax.Array
    final_loss: jax.Array


class AdaptiveResult(NamedTuple):
    flow: Bijector
    samples: jax.Array  # (n_draws, n_chains, d) data-space, last round
    rounds: Sequence[AdaptiveRound]
    n_rounds: int
    converged: bool
    # the PRECONDITIONER that achieved the highest sampling min-ESS
    # across rounds (round 5: a later refit can regress the loop's own
    # objective — round-7 of the committed funnel search pushed IS-ESS
    # to 0.92 while bench-scale mixing DROPPED vs the round-5 flow — so
    # the engine returns its best-measured flow alongside the last one;
    # None until some round samples through a flow)
    best_flow: Optional[Bijector] = None
    best_min_ess: float = 0.0


def _growth_mask_menu(dim: int):
    """The engine's generic mask menu for grown blocks: both checkerboards
    and both half-block masks — the same menu build_flow's "mixed" scheme
    draws from. Block masks let a conditioner see leading dims whole,
    which hierarchical/funnel-style targets (a global scale in a leading
    dim) need; cycling them is target-agnostic."""
    from tpuflows.util.shapes import alternating_mask, block_mask

    return [alternating_mask(dim, 0), alternating_mask(dim, 1),
            block_mask(dim, 0), block_mask(dim, 1)]


def _next_growth_mask(dim: int, flow):
    """Least-used mask from the menu, counted against the masks ALREADY in
    the flow — stateless (checkpoint/resume-safe: a carried counter once
    duplicated a checkerboard after resume) and deduplicating (new
    capacity goes to the mask family the flow lacks first)."""
    existing = [tuple(t.mask) for t in flow.transforms
                if getattr(t, "mask", None) is not None]
    menu = _growth_mask_menu(dim)
    counts = [existing.count(tuple(m)) for m in menu]
    return menu[counts.index(min(counts))]


def _n_grown_units(flow, cfg) -> int:
    """Growth count derived from the flow itself (resume-safe; a carried
    counter reset on checkpoint resume and duplicated a mask). Growth
    always appends RQS blocks (alone, or paired with an affine for
    arqs), so grown units = RQS blocks beyond the initial build."""
    if flow is None:
        return 0
    from tpuflows.flows.coupling import RQSCouplingBlock

    units = sum(isinstance(t, RQSCouplingBlock) for t in flow.transforms)
    initial = cfg.n_blocks if cfg.flow_kind in ("rqs", "arqs") else 0
    return max(0, units - initial)


def maybe_grow_flow(flow, rounds, n_grown, cfg, dim, key):
    """Growth decision + append (reference append-module helpers,
    SURVEY.md §2a row 2): append a fresh coupling unit with the
    least-used mask from the generic menu (`_next_growth_mask`), up to
    `cfg.max_grown_blocks` appends, when either stall criterion fires:

      * flow-as-proposal IS-ESS stalled between the last two rounds and
        still below `cfg.grow_is_ess_target` (always on with
        `grow_on_stall`), or
      * `grow_on_ess_stall`: the loop's OWN convergence target stalled —
        sampling min-ESS below `ess_threshold` and not improving. The
        IS-ESS criterion alone can saturate (a decent proposal) while the
        sampler still needs capacity.

    With `flow_kind="arqs"` the appended unit is an affine+RQS pair
    sharing the mask (the same pairing build_flow uses). `n_grown` is
    ignored (derived from the flow; kept for call compatibility).
    Returns (flow, n_grown, grew)."""
    n_grown = _n_grown_units(flow, cfg)
    # either trigger flag enables the growth machinery (ADVICE r4: the
    # ESS-stall trigger used to be silently inert without grow_on_stall)
    if not ((cfg.grow_on_stall or cfg.grow_on_ess_stall)
            and flow is not None and len(rounds) >= 2
            and n_grown < cfg.max_grown_blocks):
        return flow, n_grown, False
    is_now = float(rounds[-1].flow_is_ess)
    is_prev = float(rounds[-2].flow_is_ess)
    is_stall = (cfg.grow_on_stall
                and is_now < cfg.grow_is_ess_target
                and is_now < is_prev * cfg.grow_min_gain)
    ess_now = float(rounds[-1].min_ess)
    ess_prev = float(rounds[-2].min_ess)
    ess_stall = (cfg.grow_on_ess_stall
                 and ess_now < cfg.ess_threshold
                 and ess_now < ess_prev * cfg.grow_min_gain)
    if not (is_stall or ess_stall):
        return flow, n_grown, False
    from tpuflows.flows.affine import AffineCoupling
    from tpuflows.flows.coupling import RQSCouplingBlock

    mask = _next_growth_mask(dim, flow)
    k_aff, k_rqs = jax.random.split(key)
    if cfg.flow_kind == "arqs":
        flow = flow.append(AffineCoupling.init(
            k_aff, mask, hidden=cfg.hidden, clamp=cfg.clamp))
    flow = flow.append(RQSCouplingBlock.init(
        k_rqs, mask, knots=cfg.knots, hidden=cfg.hidden,
        use_pallas=cfg.use_pallas))
    return flow, n_grown + 1, True


def _flow_is_ess(key, flow, log_density, dim, n=2048):
    """Kish ESS of the flow as an importance proposal for the target."""
    z = jax.random.normal(key, (n, dim), jnp.float32)
    x, ladj = flow.inverse_and_ladj(z)
    log_q = std_normal_logpdf(z) - ladj  # q(x) under the flow
    log_w = log_density(x) - log_q
    return importance_weight_ess(log_w) / n


def adaptive_fit(
    key: jax.Array,
    log_density: Callable,
    dim: int,
    config: AdaptiveConfig = AdaptiveConfig(),
    init_positions: Optional[jax.Array] = None,
    flow: Optional[Bijector] = None,
    checkpoint_dir: Optional[str] = None,
    verbose: bool = False,
    failure_policy: Optional[FailurePolicy] = None,
) -> AdaptiveResult:
    """Run the adaptive loop until the ESS criterion or max_rounds.

    `log_density` acts on (..., d). Returns the trained flow and the final
    round's data-space samples. With `checkpoint_dir`, every completed
    round is checkpointed (flow, samples, key, round records) and a fresh
    call resumes from the latest checkpoint — the restartability story of
    SURVEY.md §5 (failure detection/elastic recovery): on a multi-host
    failure, restart the job and the loop continues from the last round.

    Failure detection is PER PHASE: each round's sampling and retraining
    device work runs under `failure_policy.guard` (default:
    `FailurePolicy.from_env()`), so a hung collective is detected within
    one phase budget and recovery via `checkpoint_dir` loses at most the
    round in flight — not the whole run.
    """
    cfg = config
    policy = failure_policy if failure_policy is not None \
        else FailurePolicy.from_env()
    k_init, key = jax.random.split(key)
    if init_positions is None:
        init_positions = 0.5 * jax.random.normal(
            k_init, (cfg.n_chains, dim), jnp.float32
        )

    rounds = []
    samples = None
    converged = False
    n_rounds = 0
    start_round = 0
    best_flow = None
    best_min_ess = 0.0
    opt = optax.adam(cfg.learning_rate)

    if checkpoint_dir is not None:
        from tpuflows.io import latest_checkpoint, load_pytree

        latest = latest_checkpoint(checkpoint_dir, prefix="adaptive_")
        if latest is not None:
            state = load_pytree(latest)
            flow = state["flow"]
            samples = state["samples"]
            key = state["key"]
            rounds = [AdaptiveRound(*r) for r in state["rounds"]]
            start_round = int(state["next_round"])
            n_rounds = start_round
            best_flow = state.get("best_flow", None)
            best_min_ess = float(state.get("best_min_ess", 0.0))
            if verbose:
                print(f"[adaptive] resumed at round {start_round}")

    n_grown = 0
    for rnd in range(start_round, cfg.max_rounds):
        key, k_sample, k_build, k_train, k_is, k_grow = jax.random.split(
            key, 6)

        # -- 0. growth: append a coupling block when the flow stalled ------
        flow, n_grown, grew = maybe_grow_flow(
            flow, rounds, n_grown, cfg, dim, k_grow)
        if grew and verbose:
            print(f"[adaptive round {rnd}] grew flow to "
                  f"{len(flow.transforms)} modules (is_ess stalled at "
                  f"{float(rounds[-1].flow_is_ess):.3f})")

        # -- 1. sample (latent space once a flow exists) -------------------
        if flow is None:
            logp = log_density
            q0 = init_positions
        else:
            logp = flow_reparameterized(log_density, flow)
            # restart chains from the latent image of the previous draws
            q0 = flow.forward(samples[-1]) if samples is not None else init_positions

        res = policy.guard(
            run_nuts,
            k_sample,
            logp,
            q0,
            num_warmup=cfg.num_warmup,
            num_samples=cfg.num_samples,
            max_depth=cfg.max_depth,
            target_accept=cfg.target_accept,
            phase=f"adaptive_sample:{rnd}",
        )
        draws = res.samples  # (n_draws, n_chains, d), latent if flow else data
        if flow is not None:
            draws = flow.inverse(draws)
        samples = draws

        ess = effective_sample_size(draws)
        rhat = split_rhat(draws)
        min_ess = jnp.min(ess)
        max_rhat = jnp.max(rhat)
        # best-preconditioner tracking: this round's min_ess measures the
        # flow the round SAMPLED through (before the refit below)
        if flow is not None and float(min_ess) > best_min_ess:
            best_min_ess = float(min_ess)
            best_flow = flow

        # -- 2. retrain flow on pooled draws ------------------------------
        flat = draws.reshape(-1, dim)
        if flow is None:
            flow = build_flow(
                flat,
                k_build,
                kind=cfg.flow_kind,
                n_blocks=cfg.n_blocks,
                knots=cfg.knots,
                hidden=cfg.hidden,
                mask_scheme=cfg.mask_scheme,
                clamp=cfg.clamp,
                use_pallas=cfg.use_pallas,
            )
        final_loss = jnp.asarray(jnp.nan)
        if cfg.fit_method in ("forward_kl", "hybrid"):
            train = policy.guard(
                optimize_flow,
                k_train,
                flat,
                flow,
                opt,
                nbatches=cfg.train_batches,
                nepochs=cfg.train_epochs,
                phase=f"adaptive_train:{rnd}",
            )
            flow = train.result
            final_loss = train.loss_hist[-1]
        if cfg.fit_method in ("reverse_kl", "hybrid"):
            from tpuflows.vi import fit_vi

            k_train, k_vi = jax.random.split(k_train)
            vres = policy.guard(
                fit_vi, k_vi, log_density, flow, dim,
                optimizer=optax.adam(cfg.learning_rate),
                batch_size=cfg.vi_batch, nsteps=cfg.vi_steps,
                stl=True,
                phase=f"adaptive_vi:{rnd}",
            )
            flow = vres.flow
            final_loss = -vres.final_elbo  # negated: loss convention
        if cfg.fit_method not in ("forward_kl", "reverse_kl", "hybrid"):
            raise ValueError(f"unknown fit_method: {cfg.fit_method!r}")

        record = AdaptiveRound(
            min_ess=min_ess,
            max_rhat=max_rhat,
            flow_is_ess=_flow_is_ess(k_is, flow, log_density, dim),
            accept_rate=jnp.mean(res.info.accept_prob),
            divergence_rate=jnp.mean(res.info.diverging.astype(jnp.float32)),
            final_loss=final_loss,
        )
        rounds.append(record)
        n_rounds = rnd + 1
        if checkpoint_dir is not None:
            from tpuflows.io import save_pytree

            state = {
                "flow": flow,
                "samples": samples,
                "key": key,
                "rounds": [tuple(r) for r in rounds],
                "next_round": jnp.asarray(rnd + 1),
            }
            if best_flow is not None:
                state["best_flow"] = best_flow
                state["best_min_ess"] = jnp.asarray(best_min_ess)
            save_pytree(f"{checkpoint_dir}/adaptive_{rnd + 1}", state)
        if verbose:
            print(
                f"[adaptive round {rnd}] min_ess={float(min_ess):.1f} "
                f"max_rhat={float(max_rhat):.4f} "
                f"flow_is_ess={float(record.flow_is_ess):.3f} "
                f"accept={float(record.accept_rate):.3f}"
            )

        # -- 3. stop on ESS (evaluated on the post-flow round's draws) -----
        if float(min_ess) >= cfg.ess_threshold:
            converged = True
            break

    return AdaptiveResult(
        flow=flow,
        samples=samples,
        rounds=rounds,
        n_rounds=n_rounds,
        converged=converged,
        best_flow=best_flow if best_flow is not None else flow,
        best_min_ess=best_min_ess,
    )
