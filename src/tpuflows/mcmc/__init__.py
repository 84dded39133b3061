from tpuflows.mcmc.hmc import HMCInfo, PhasePoint, kinetic, leapfrog, make_hmc_kernel
from tpuflows.mcmc.nuts import NUTSInfo, make_nuts_kernel
from tpuflows.mcmc.dual_averaging import (
    DualAveragingState,
    WelfordState,
    da_init,
    da_step_size,
    da_update,
    welford_init,
    welford_merge,
    welford_update_batch,
    welford_variance,
)
from tpuflows.mcmc.sample import (MCMCResult, NUTSDriver, NUTSState,
                                  nuts_draws, nuts_warmup, run_nuts)
from tpuflows.mcmc.mh import (
    MHInfo,
    MHResult,
    make_flow_imh_kernel,
    make_rwmh_kernel,
    run_flow_imh,
    run_rwmh,
)
from tpuflows.mcmc.ensemble import EnsembleResult, run_ensemble
from tpuflows.mcmc.tempering import (
    PTInfo,
    PTResult,
    geometric_betas,
    run_parallel_tempering,
)
from tpuflows.mcmc.preconditioned import (
    flow_reparameterized,
    to_data_space,
    to_latent_space,
)

__all__ = [
    "HMCInfo", "PhasePoint", "kinetic", "leapfrog", "make_hmc_kernel",
    "NUTSInfo", "make_nuts_kernel",
    "DualAveragingState", "WelfordState", "da_init", "da_step_size",
    "da_update", "welford_init", "welford_merge", "welford_update_batch",
    "welford_variance",
    "MCMCResult", "run_nuts", "NUTSState", "NUTSDriver", "nuts_warmup",
    "nuts_draws",
    "MHInfo", "MHResult", "make_rwmh_kernel", "run_rwmh",
    "make_flow_imh_kernel", "run_flow_imh",
    "EnsembleResult", "run_ensemble",
    "PTInfo", "PTResult", "geometric_betas", "run_parallel_tempering",
    "flow_reparameterized", "to_data_space", "to_latent_space",
]
