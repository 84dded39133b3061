"""tpuflows — TPU-native adaptively-trained normalizing-flow inference engine.

A from-scratch JAX/XLA/Pallas rebuild of the capability set of
bat/AdaptiveFlows.jl and its BAT-ecosystem stack (see SURVEY.md):
flows (affine + RQ-spline couplings with analytic fwd/inv/ladj), flow
training (forward/reverse KL), flow-preconditioned HMC/NUTS, VI, SMC with
flow bridges, the adaptive train-sample-retrain loop, diagnostics, and a
multi-host distributed runtime on jax.sharding meshes.
"""

__version__ = "0.1.0"
