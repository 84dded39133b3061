from tpuflows.targets.base import Target, logdensityof, std_normal_logpdf
from tpuflows.targets.gaussian import StandardNormal, DiagNormal
from tpuflows.targets.correlated import CorrelatedGaussian
from tpuflows.targets.mixture import GaussianMixture
from tpuflows.targets.funnel import NealsFunnel
from tpuflows.targets.hierarchical import HierarchicalGaussian
from tpuflows.targets.banana import Banana, Rosenbrock
from tpuflows.targets.cauchy import MultimodalCauchy

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
]
