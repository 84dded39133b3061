"""Typed run configuration.

Reference parity (SURVEY.md §5): the reference passes plain keyword
arguments; here every subsystem knob lives in a frozen dataclass and one
top-level `RunConfig` loads from JSON (configs/ ships the five baseline
configs, BASELINE.json:7-11) — no string-keyed dict plumbing past this
module.
"""
from __future__ import annotations

import dataclasses
import json
from dataclasses import dataclass, field
from typing import Optional, Tuple

import jax.numpy as jnp

from tpuflows.adaptive.loop import AdaptiveConfig
from tpuflows.smc.sampler import SMCConfig


@dataclass(frozen=True)
class TargetSpec:
    kind: str  # std_normal | diag_normal | correlated | mixture | funnel
    #          | hierarchical | banana | rosenbrock
    dim: int
    # optional per-kind knobs
    separation: float = 4.0
    rho: float = 0.8
    scale: float = 3.0

    def build(self):
        from tpuflows import targets as T

        k, d = self.kind, self.dim
        if k == "std_normal":
            return T.StandardNormal(dim=d)
        if k == "diag_normal":
            return T.DiagNormal(loc=jnp.zeros(d), scale=jnp.ones(d))
        if k == "correlated":
            return T.CorrelatedGaussian.ar1(dim=d, rho=self.rho)
        if k == "mixture":
            return T.GaussianMixture.bimodal(dim=d, separation=self.separation)
        if k == "funnel":
            return T.NealsFunnel(dim=d, sigma_v=self.scale)
        if k == "hierarchical":
            return T.HierarchicalGaussian.standard(dim=d)
        if k == "banana":
            return T.Banana(dim=d)
        if k == "rosenbrock":
            return T.Rosenbrock(dim=d)
        raise ValueError(f"unknown target kind: {k!r}")


@dataclass(frozen=True)
class FlowSpec:
    kind: str = "rqs"  # rqs | arqs | affine
    n_blocks: int = 4
    knots: int = 8
    hidden: Tuple[int, ...] = (64, 64)
    use_pallas: object = "auto"
    # mask/coupling geometry (see flows/build.py): "leading" + affine with a
    # wide clamp is the validated recipe for hierarchical scale targets
    # (config 5; docs/artifacts/config5_fullspec.json)
    mask_scheme: str = "alternating"  # alternating | mixed | leading
    n_leading: int = 1
    clamp: float = 4.0


@dataclass(frozen=True)
class TrainSpec:
    loss: str = "forward_kl"  # forward_kl | reverse_kl
    nepochs: int = 100
    nbatches: int = 10
    nsteps: int = 1000  # reverse-KL steps
    batch_size: int = 512
    learning_rate: float = 1e-3
    n_fit_samples: int = 4096


@dataclass(frozen=True)
class NUTSSpec:
    n_chains: int = 64
    num_warmup: int = 500
    num_samples: int = 500
    max_depth: int = 8
    target_accept: float = 0.8
    preconditioned: bool = True
    # "single" (default; right for preconditioned/Gaussianized latents) or
    # "stan" (doubling Welford windows; right for raw multiscale targets —
    # see mcmc/sample.py step-size & schedule policy)
    warmup_schedule: str = "single"
    # device-program partition (mcmc/sample.py chunk_size): results are
    # bitwise chunk-invariant; 256 bounds single-program runtime on the
    # tunneled chip while keeping per-call dispatch negligible
    chunk_size: int = 256
    # whole-transition Pallas NUTS (kernels/nuts_pallas.py): "auto" uses it
    # on TPU for preconditioned runs with affine OR arqs/rqs flows (round
    # 5: the streamed per-block spline backward made the spline path a
    # measured 1.27x win — docs/artifacts/bench_generic_fused_ab.json);
    # "on"/"off" force it. "on" requires preconditioned=true.
    fused_kernel: str = "auto"


@dataclass(frozen=True)
class MHSpec:
    """Adaptive random-walk MH (BAT's default sampler) / flow-independence MH."""

    n_chains: int = 64
    num_warmup: int = 1000
    num_samples: int = 1000
    target_accept: float = 0.234
    flow_proposal: bool = False  # True: independence MH from the fitted flow


@dataclass(frozen=True)
class PTSpec:
    """Parallel tempering (BAT tempered ensemble sampling analog)."""

    n_temps: int = 8
    beta_min: float = 0.01
    n_chains: int = 64
    num_warmup: int = 1000
    num_samples: int = 1000
    target_accept: float = 0.234


@dataclass(frozen=True)
class SMCSpec:
    n_particles: int = 4096
    target_rel_ess: float = 0.5
    n_mutation_steps: int = 5
    n_leapfrog: int = 5
    max_stages: int = 200
    latent_mutation: bool = True
    retrain_every: int = 0
    retrain_mode: str = "freeze"  # freeze | reweight (see SMCConfig)
    final_equilibration_stages: int = 0
    sharded: bool = False
    # bridge-flow pretraining before SMC starts: "none" builds the flow from
    # standard-normal init draws (untrained); "prior" pretrains it by forward
    # KL on draws from the target's PRIOR (requires target.sample_prior —
    # always available for a Bayesian model, no posterior oracle involved).
    # "prior" + the leading-mask affine FlowSpec is the validated config-5
    # recipe (docs/artifacts/config5_fullspec.json).
    pretrain: str = "none"  # none | prior
    pretrain_draws: int = 8192
    pretrain_epochs: int = 60
    pretrain_batches: int = 8
    pretrain_lr: float = 2e-3

    def to_smc_config(self) -> SMCConfig:
        return SMCConfig(
            n_particles=self.n_particles,
            target_rel_ess=self.target_rel_ess,
            n_mutation_steps=self.n_mutation_steps,
            n_leapfrog=self.n_leapfrog,
            max_stages=self.max_stages,
            latent_mutation=self.latent_mutation,
            retrain_every=self.retrain_every,
            retrain_mode=self.retrain_mode,
            final_equilibration_stages=self.final_equilibration_stages,
        )


@dataclass(frozen=True)
class AdaptiveSpec:
    max_rounds: int = 5
    ess_threshold: float = 400.0
    n_chains: int = 64
    num_warmup: int = 300
    num_samples: int = 300
    train_epochs: int = 60

    def to_adaptive_config(self, flow: "FlowSpec") -> AdaptiveConfig:
        return AdaptiveConfig(
            max_rounds=self.max_rounds,
            ess_threshold=self.ess_threshold,
            n_chains=self.n_chains,
            num_warmup=self.num_warmup,
            num_samples=self.num_samples,
            flow_kind=flow.kind,
            n_blocks=flow.n_blocks,
            knots=flow.knots,
            hidden=tuple(flow.hidden),
            train_epochs=self.train_epochs,
            use_pallas=flow.use_pallas,
        )


@dataclass(frozen=True)
class RunConfig:
    name: str
    task: str  # fit | vi | adaptive | nuts | smc | mh | pt
    seed: int = 0
    target: TargetSpec = field(default_factory=lambda: TargetSpec("std_normal", 2))
    flow: FlowSpec = field(default_factory=FlowSpec)
    train: TrainSpec = field(default_factory=TrainSpec)
    nuts: NUTSSpec = field(default_factory=NUTSSpec)
    smc: SMCSpec = field(default_factory=SMCSpec)
    adaptive: AdaptiveSpec = field(default_factory=AdaptiveSpec)
    mh: MHSpec = field(default_factory=MHSpec)
    pt: PTSpec = field(default_factory=PTSpec)
    output_dir: Optional[str] = None

    @staticmethod
    def from_dict(d: dict) -> "RunConfig":
        def build(cls, sub):
            kwargs = dict(sub)
            for f in dataclasses.fields(cls):
                if f.name in kwargs and f.type == Tuple[int, ...]:
                    kwargs[f.name] = tuple(kwargs[f.name])
            known = {f.name for f in dataclasses.fields(cls)}
            unknown = set(kwargs) - known
            if unknown:
                raise ValueError(f"{cls.__name__}: unknown keys {unknown}")
            return cls(**kwargs)

        d = dict(d)
        for key, cls in [("target", TargetSpec), ("flow", FlowSpec),
                         ("train", TrainSpec), ("nuts", NUTSSpec),
                         ("smc", SMCSpec), ("adaptive", AdaptiveSpec),
                         ("mh", MHSpec), ("pt", PTSpec)]:
            if key in d:
                d[key] = build(cls, d[key])
        return build(RunConfig, d)

    @staticmethod
    def from_json(path: str) -> "RunConfig":
        with open(path) as f:
            return RunConfig.from_dict(json.load(f))
