from tpuflows.flows.core import (
    Bijector,
    Chain,
    Identity,
    Inverted,
    ScannedRepeat,
    inverse,
    with_logabsdet_jacobian,
)
from tpuflows.flows.affine import AffineCoupling, Standardize, Whiten
from tpuflows.flows.coupling import RQSCouplingBlock, rqs_coupling_module
from tpuflows.flows.build import build_flow
from tpuflows.flows.nets import MLP
from tpuflows.flows.train import (
    TrainResult,
    make_train_step,
    mvnormal_negll_flow,
    negll_flow_loss,
    optimize_flow,
    make_reverse_kl_trainer,
    optimize_flow_reverse_kl,
    optimize_flow_sequentially,
    reverse_kl_loss,
)

__all__ = [
    "Bijector", "Chain", "Identity", "Inverted", "ScannedRepeat",
    "inverse", "with_logabsdet_jacobian",
    "AffineCoupling", "Standardize", "Whiten",
    "RQSCouplingBlock", "rqs_coupling_module", "build_flow", "MLP",
    "TrainResult", "make_train_step", "negll_flow_loss",
    "mvnormal_negll_flow", "reverse_kl_loss", "optimize_flow",
    "optimize_flow_reverse_kl", "make_reverse_kl_trainer", "optimize_flow_sequentially",
]
