"""Flow training: forward-KL / reverse-KL losses + the optimize loop.

Reference parity (SURVEY.md §2a row 5): AdaptiveFlows.jl src/optimize_flow.jl
  - `optimize_flow(smpls, flow, opt; loss, nbatches, nepochs, shuffle_samples)`
  - `optimize_flow_sequentially` (module-by-module training)
  - losses `negll_flow` (forward KL) / `mvnormal_negll_flow`
Zygote.gradient -> jax.value_and_grad; Optimisers.jl Adam -> optax.adam.

TPU design: the whole (epochs x batches) loop is ONE jitted `lax.scan` —
no host round-trips per step; per-epoch reshuffles happen inside the scan
via jax.random.permutation. Data-parallel training: pass `axis_name` when
running under shard_map — gradients and losses are pmean'd across the mesh
(the BASELINE.json:5 "psum collectives" requirement; wiring in
tpuflows.dist.collectives).
"""
from __future__ import annotations

from typing import Callable, Optional

import chex
import jax
import jax.numpy as jnp
import optax

from tpuflows.flows.core import Bijector, Chain
from tpuflows.targets.base import std_normal_logpdf
from tpuflows.util.pytree import pytree_dataclass


# ---------------------------------------------------------------------------
# Losses
# ---------------------------------------------------------------------------
def negll_flow_loss(flow: Bijector, x: jax.Array) -> jax.Array:
    """Forward KL: -E_x[ log N(f(x); 0, I) + ladj_f(x) ] (reference
    `negll_flow_loss`). x: (batch, d)."""
    z, ladj = flow.forward_and_ladj(x)
    return -jnp.mean(std_normal_logpdf(z) + ladj)


# The reference's std-normal-base specialization is the same computation here.
mvnormal_negll_flow = negll_flow_loss


def reverse_kl_loss(flow: Bijector, log_density: Callable, z: jax.Array):
    """Reverse KL (up to the base entropy constant):
    KL(q || p) = E_z[ -ladj_inv(z) - log p(f^-1(z)) ] + const,  z ~ N(0, I).

    This is also the negative ELBO for VI with the flow as variational
    family (SURVEY.md §2b row 17); reused verbatim by tpuflows.vi.elbo.
    """
    x, ladj = flow.inverse_and_ladj(z)
    return -jnp.mean(log_density(x) + ladj)


# ---------------------------------------------------------------------------
# Optimize loop
# ---------------------------------------------------------------------------
@pytree_dataclass
class TrainResult:
    result: Bijector  # trained flow (reference returns `(result, ...)`)
    optimizer_state: object
    loss_hist: jax.Array  # (nepochs * nbatches,)
    # with optimize_flow(val_frac > 0): per-epoch held-out loss and the
    # epoch index whose parameters `result` carries (early stopping —
    # round-5 finding: one-shot forward-KL fits overfit badly at high d,
    # e.g. train negll 398 vs 1717 on fresh draws at d=256;
    # docs/artifacts/evidence_production_dims.json diagnosis addendum)
    val_hist: object = None  # (nepochs,) or None
    best_epoch: object = None  # scalar int or None


def _pmean_if(axis_name, tree):
    if axis_name is None:
        return tree
    return jax.lax.pmean(tree, axis_name)


def _check_finite_loss(loss_hist) -> None:
    """Boundary sanitizer (SURVEY.md §5): a non-finite training loss is an
    engine failure — surface it at the subsystem boundary with the step
    index instead of letting NaN params poison downstream sampling. One
    host sync per training call (negligible; training is not a hot loop
    caller). Skipped when tracing (e.g. optimize_flow inside
    optimize_flow_dp's shard_map) — concrete values don't exist there."""
    import numpy as np

    if isinstance(loss_hist, jax.core.Tracer):
        return
    h = np.asarray(loss_hist)
    if not np.isfinite(h[-1]):
        bad = int(np.argmax(~np.isfinite(h)))
        raise FloatingPointError(
            f"flow training diverged: loss became non-finite at step {bad} "
            f"of {h.size} (loss_hist[-1]={h[-1]})"
        )


def make_train_step(
    optimizer: optax.GradientTransformation,
    loss_fn: Callable,
    axis_name: Optional[str] = None,
):
    """One SGD step: value_and_grad -> (optional) cross-device pmean -> update.

    `loss_fn(flow, batch)` must be a scalar. Under shard_map with
    `axis_name` set, this is the DP-allreduce of SURVEY.md §2c.
    """

    def step(flow, opt_state, batch):
        with jax.named_scope("train_step"):
            loss, grads = jax.value_and_grad(loss_fn)(flow, batch)
            grads = _pmean_if(axis_name, grads)
            loss = _pmean_if(axis_name, loss)
            updates, opt_state = optimizer.update(grads, opt_state, flow)
            flow = optax.apply_updates(flow, updates)
            return flow, opt_state, loss

    return step


def optimize_flow(
    key: jax.Array,
    samples: jax.Array,
    flow: Bijector,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss: Callable = negll_flow_loss,
    nbatches: int = 10,
    nepochs: int = 100,
    shuffle_samples: bool = True,
    axis_name: Optional[str] = None,
    opt_state=None,
    val_frac: float = 0.0,
) -> TrainResult:
    """Train `flow` on an (N, d) sample matrix by minibatch SGD.

    Signature mirrors the reference's optimize_flow (SURVEY.md §3.2); the
    entire nepochs x nbatches loop runs inside one jitted lax.scan.

    `val_frac > 0` enables EARLY STOPPING: that fraction of the samples
    is held out (never trained on), the held-out loss is evaluated once
    per epoch inside the scan, and `result` carries the parameters of
    the best-validation epoch (the final-epoch parameters remain
    reachable through `optimizer_state` continuation if needed;
    `val_hist`/`best_epoch` record the trajectory). Why: one-shot
    forward-KL fits can overfit catastrophically at high d — measured
    train negll 398 vs 1717 on fresh draws at d=256 (round-5 evidence
    diagnosis). val_frac=0 is bit-identical to the historical behavior.
    """
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    chex.assert_rank(samples, 2)  # (N, d) sample matrix
    use_val = val_frac > 0.0
    val = None
    if use_val:
        n_all = samples.shape[0]
        n_val = max(int(n_all * val_frac), 1)
        if n_val >= n_all:
            raise ValueError(f"val_frac={val_frac} leaves no training data")
        k_split, key = jax.random.split(key)
        perm0 = jax.random.permutation(k_split, n_all)
        val = samples[perm0[:n_val]]
        samples = samples[perm0[n_val:]]
    n = samples.shape[0]
    bs = n // nbatches
    if bs == 0:
        raise ValueError(f"{n} samples cannot form {nbatches} batches")
    n_used = bs * nbatches
    step = make_train_step(optimizer, loss, axis_name)

    if opt_state is None:
        opt_state = optimizer.init(flow)

    def epoch_body(carry, inp):
        epoch_idx, epoch_key = inp
        flow, opt_state, best_flow, best_vl, best_ep = carry
        if shuffle_samples:
            perm = jax.random.permutation(epoch_key, n)[:n_used]
        else:
            perm = jnp.arange(n_used)
        batches = samples[perm].reshape(nbatches, bs, -1)

        def batch_body(c, batch):
            f, s = c
            f, s, l = step(f, s, batch)
            return (f, s), l

        (flow, opt_state), losses = jax.lax.scan(
            batch_body, (flow, opt_state), batches
        )
        if use_val:
            vl = loss(flow, val)
            better = vl < best_vl
            best_flow = jax.tree_util.tree_map(
                lambda a, b: jnp.where(better, a, b), flow, best_flow)
            best_vl = jnp.where(better, vl, best_vl)
            best_ep = jnp.where(better, epoch_idx, best_ep)
        else:
            vl = jnp.asarray(jnp.nan)
        return (flow, opt_state, best_flow, best_vl, best_ep), (losses, vl)

    epoch_keys = jax.random.split(key, nepochs)

    @jax.jit
    def run(flow, opt_state, epoch_keys):
        init = (flow, opt_state, flow, jnp.asarray(jnp.inf),
                jnp.asarray(-1, jnp.int32))
        carry, (losses, vls) = jax.lax.scan(
            epoch_body, init, (jnp.arange(nepochs), epoch_keys)
        )
        flow, opt_state, best_flow, _, best_ep = carry
        return flow, opt_state, best_flow, best_ep, losses.reshape(-1), vls

    flow, opt_state, best_flow, best_ep, loss_hist, val_hist = run(
        flow, opt_state, epoch_keys)
    _check_finite_loss(loss_hist)
    if use_val:
        return TrainResult(result=best_flow, optimizer_state=opt_state,
                           loss_hist=loss_hist, val_hist=val_hist,
                           best_epoch=best_ep)
    return TrainResult(result=flow, optimizer_state=opt_state,
                       loss_hist=loss_hist)


def make_reverse_kl_trainer(
    log_density: Callable,
    dim: int,
    optimizer: optax.GradientTransformation,
    batch_size: int = 512,
    anneal_steps: int = 0,
    axis_name: Optional[str] = None,
    stl: bool = False,
    # chunk partitioning is bitwise result-invariant; 2000-step chunks are
    # ~0.2-1 s device programs (tunnel-safe) while 200-step chunks paid
    # ~100 ms per-call tunnel overhead 10x as often — measured 1.6k vs
    # 21.7k steps/s on the bench fit (bench.py TRAIN_CHUNK note)
    chunk_size: int = 2000,
):
    """Build a REUSABLE chunked reverse-KL trainer.

    Returns `train(key, flow, nsteps, opt_state=None) -> TrainResult`.
    All invocations share ONE jitted chunk program (compiled on first call),
    so a short priming call excludes compilation from timed runs without
    relying on the persistent compilation cache (whose keys are not stable
    across processes for fresh `jax.jit` lambdas — observed 4 s vs 225 s
    train time for identical bench runs before this factory existed)."""
    if stl:

        def loss_fn(f, z_and_beta):
            z, beta = z_and_beta
            x, _ = f.inverse_and_ladj(z)
            f_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, f)
            z_sg, ladj_fwd = f_sg.forward_and_ladj(x)
            log_q = std_normal_logpdf(z_sg) + ladj_fwd
            return -jnp.mean(beta * log_density(x) - log_q)

    else:

        def loss_fn(f, z_and_beta):
            z, beta = z_and_beta
            x, ladj = f.inverse_and_ladj(z)
            return -jnp.mean(beta * log_density(x) + ladj)

    step = make_train_step(optimizer, loss_fn, axis_name)

    def body(carry, inp):
        f, s = carry
        k, i = inp
        if anneal_steps > 0:
            beta = jnp.clip(
                0.2 + 0.8 * i.astype(jnp.float32) / anneal_steps, 0.2, 1.0
            )
        else:
            beta = jnp.asarray(1.0, jnp.float32)
        z = jax.random.normal(k, (batch_size, dim), jnp.float32)
        f, s, l = step(f, s, (z, beta))
        return (f, s), l

    chunk_run = jax.jit(lambda flow, opt_state, keys, idxs: jax.lax.scan(
        body, (flow, opt_state), (keys, idxs)))

    def train(key, flow, nsteps, opt_state=None) -> TrainResult:
        if opt_state is None:
            opt_state = optimizer.init(flow)
        keys = jax.random.split(key, nsteps)
        idxs = jnp.arange(nsteps)
        hists = []
        carry = (flow, opt_state)
        for lo in range(0, nsteps, chunk_size):
            hi = min(lo + chunk_size, nsteps)
            carry, losses = chunk_run(carry[0], carry[1], keys[lo:hi],
                                      idxs[lo:hi])
            hists.append(losses)
        loss_hist = jnp.concatenate(hists)
        _check_finite_loss(loss_hist)
        return TrainResult(result=carry[0], optimizer_state=carry[1],
                           loss_hist=loss_hist)

    return train


def optimize_flow_reverse_kl(
    key: jax.Array,
    log_density: Callable,
    flow: Bijector,
    dim: int,
    optimizer: Optional[optax.GradientTransformation] = None,
    batch_size: int = 512,
    nsteps: int = 1000,
    anneal_steps: int = 0,
    axis_name: Optional[str] = None,
    opt_state=None,
    stl: bool = False,
    chunk_size: Optional[int] = None,
) -> TrainResult:
    """Reverse-KL (self-sampling) training against `log_density` —
    config 2 (BASELINE.json:8) and the VI path (SURVEY.md §2b row 17).
    Fresh base draws every step, all inside one jitted lax.scan.

    `chunk_size` splits the nsteps scan into several device programs of at
    most that many steps (state carried on host). The compiled program then
    depends on chunk_size, not nsteps — one cache entry serves any length,
    and a 1-chunk priming call excludes compilation from timed runs
    (bench.py). Results are identical to the unchunked run (same per-step
    keys and anneal schedule).

    `anneal_steps` > 0 enables temperature annealing: the target is
    p(x)^beta with beta ramping 0.2 -> 1 over the first `anneal_steps`
    steps. Tempered targets are WIDER, so q spreads before sharpening —
    the standard counter to reverse-KL's mode-seeking collapse.

    `stl` enables the sticking-the-landing estimator (Roeder et al. 2017):
    log q(x) is evaluated through a stop-gradient copy of the flow, which
    drops the score term from the pathwise gradient. The estimator's
    variance vanishes as q -> p (the plain estimator's does not), at the
    cost of one extra forward pass per step."""
    if optimizer is None:
        optimizer = optax.adam(1e-3)

    if stl:

        def loss_fn(f, z_and_beta):
            z, beta = z_and_beta
            x, _ = f.inverse_and_ladj(z)
            f_sg = jax.tree_util.tree_map(jax.lax.stop_gradient, f)
            z_sg, ladj_fwd = f_sg.forward_and_ladj(x)
            log_q = std_normal_logpdf(z_sg) + ladj_fwd
            return -jnp.mean(beta * log_density(x) - log_q)

    else:

        def loss_fn(f, z_and_beta):
            z, beta = z_and_beta
            x, ladj = f.inverse_and_ladj(z)
            return -jnp.mean(beta * log_density(x) + ladj)

    step = make_train_step(optimizer, loss_fn, axis_name)
    if opt_state is None:
        opt_state = optimizer.init(flow)

    def body(carry, inp):
        f, s = carry
        k, i = inp
        if anneal_steps > 0:
            beta = jnp.clip(
                0.2 + 0.8 * i.astype(jnp.float32) / anneal_steps, 0.2, 1.0
            )
        else:
            beta = jnp.asarray(1.0, jnp.float32)
        z = jax.random.normal(k, (batch_size, dim), jnp.float32)
        f, s, l = step(f, s, (z, beta))
        return (f, s), l

    keys = jax.random.split(key, nsteps)
    idxs = jnp.arange(nsteps)

    if chunk_size is None:
        @jax.jit
        def run(flow, opt_state, keys, idxs):
            (flow, opt_state), losses = jax.lax.scan(
                body, (flow, opt_state), (keys, idxs)
            )
            return flow, opt_state, losses

        flow, opt_state, loss_hist = run(flow, opt_state, keys, idxs)
        return TrainResult(result=flow, optimizer_state=opt_state,
                           loss_hist=loss_hist)

    chunk_run = jax.jit(lambda flow, opt_state, keys, idxs: jax.lax.scan(
        body, (flow, opt_state), (keys, idxs)))
    hists = []
    carry = (flow, opt_state)
    for lo in range(0, nsteps, chunk_size):
        hi = min(lo + chunk_size, nsteps)
        carry, losses = chunk_run(carry[0], carry[1], keys[lo:hi], idxs[lo:hi])
        hists.append(losses)
    flow, opt_state = carry
    return TrainResult(result=flow, optimizer_state=opt_state,
                       loss_hist=jnp.concatenate(hists))


def _freeze_all_but(chain: Chain, i: int) -> Chain:
    """stop_gradient every module except the i-th (sequential training)."""
    ts = tuple(
        t if j == i else jax.tree_util.tree_map(jax.lax.stop_gradient, t)
        for j, t in enumerate(chain.transforms)
    )
    return Chain(transforms=ts)


def optimize_flow_sequentially(
    key: jax.Array,
    samples: jax.Array,
    flow: Chain,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss: Callable = negll_flow_loss,
    nbatches: int = 10,
    nepochs: int = 100,
    shuffle_samples: bool = True,
) -> TrainResult:
    """Train module-by-module, freezing the rest (reference
    `optimize_flow_sequentially`, SURVEY.md §2a row 5). Returns the flow with
    every module updated and the concatenated loss history."""
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    hists = []
    keys = jax.random.split(key, len(flow.transforms))
    for i in range(len(flow.transforms)):
        seq_loss = lambda f, x, _i=i: loss(_freeze_all_but(f, _i), x)
        res = optimize_flow(
            keys[i], samples, flow, optimizer,
            loss=seq_loss, nbatches=nbatches, nepochs=nepochs,
            shuffle_samples=shuffle_samples,
        )
        flow = res.result
        hists.append(res.loss_hist)
    return TrainResult(
        result=flow,
        optimizer_state=res.optimizer_state,
        loss_hist=jnp.concatenate(hists),
    )
