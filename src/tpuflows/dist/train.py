"""Data-parallel flow training over the worker mesh.

Reference parity (SURVEY.md §2c "flow training goes data-parallel"):
per-shard value_and_grad -> pmean over `workers` -> replicated adam update
(BASELINE.json:5 "psum/all-gather collectives"). The inner loop IS
flows/train.optimize_flow with axis_name set — the algorithm does not
change with host count, only throughput (SURVEY.md §7 hard part 5).
"""
from __future__ import annotations

from typing import Callable, Optional

import jax
import optax
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from tpuflows.dist.mesh import WORKERS, replicated, row_sharded
from tpuflows.flows.core import Bijector
from tpuflows.flows.train import TrainResult, negll_flow_loss, optimize_flow


def optimize_flow_dp(
    key: jax.Array,
    samples: jax.Array,
    flow: Bijector,
    mesh: Mesh,
    optimizer: Optional[optax.GradientTransformation] = None,
    loss: Callable = negll_flow_loss,
    nbatches: int = 10,
    nepochs: int = 100,
) -> TrainResult:
    """optimize_flow with the (N, d) sample matrix row-sharded over `mesh`.

    Each shard trains on its local rows; gradients/losses are pmean'd every
    step, so the result is a true large-batch DP fit. N must divide evenly
    by (n_devices * nbatches). The per-shard shuffle uses a key folded with
    the shard index (decorrelated local minibatch order).
    """
    if optimizer is None:
        optimizer = optax.adam(1e-3)
    n_dev = len(mesh.devices.flat)
    n = samples.shape[0]
    if n % n_dev != 0:
        raise ValueError(f"{n} samples not divisible by {n_dev} devices")

    samples = jax.device_put(samples, row_sharded(mesh))
    flow = jax.device_put(flow, replicated(mesh))

    def local_run(key, shard, flow):
        idx = jax.lax.axis_index(WORKERS)
        res = optimize_flow(
            jax.random.fold_in(key, idx),
            shard,
            flow,
            optimizer,
            loss=loss,
            nbatches=nbatches,
            nepochs=nepochs,
            axis_name=WORKERS,
        )
        # loss_hist is already pmean'd per step inside make_train_step
        return res.result, res.loss_hist

    sharded = jax.jit(
        shard_map(
            local_run,
            mesh=mesh,
            in_specs=(P(), P(WORKERS), P()),
            out_specs=(P(), P()),
            check_vma=False,
        )
    )
    trained, loss_hist = sharded(key, samples, flow)
    return TrainResult(result=trained, optimizer_state=None,
                       loss_hist=loss_hist)
