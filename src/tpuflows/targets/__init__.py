from tpuflows.targets.base import Target, logdensityof, std_normal_logpdf
from tpuflows.targets.gaussian import StandardNormal, DiagNormal
from tpuflows.targets.correlated import CorrelatedGaussian
from tpuflows.targets.mixture import GaussianMixture
from tpuflows.targets.funnel import NealsFunnel
from tpuflows.targets.hierarchical import HierarchicalGaussian
from tpuflows.targets.banana import Banana, Rosenbrock
from tpuflows.targets.cauchy import MultimodalCauchy
from tpuflows.targets.posterior import (
    Beta,
    Exponential,
    HalfNormal,
    IndependentPrior,
    LogNormal,
    Normal,
    Posterior,
    Uniform,
    find_mode,
)

__all__ = [
    "Target",
    "logdensityof",
    "std_normal_logpdf",
    "StandardNormal",
    "DiagNormal",
    "CorrelatedGaussian",
    "GaussianMixture",
    "NealsFunnel",
    "HierarchicalGaussian",
    "Banana",
    "Rosenbrock",
    "MultimodalCauchy",
    "IndependentPrior",
    "Posterior",
    "Normal",
    "LogNormal",
    "Exponential",
    "HalfNormal",
    "Uniform",
    "Beta",
    "find_mode",
]
