"""friedrich-tpu: a TPU-native exact Gaussian-process inference engine.

A from-scratch JAX/XLA/Pallas re-design covering the full capability surface
of the reference library (nestordemeure/friedrich, a pure-Rust CPU GP crate):
builder-pattern GP definition, exact posterior mean/variance/covariance,
posterior sampling, O(n^2) incremental add-samples, marginal-likelihood
hyperparameter fitting — plus TPU-first extensions: multi-chip sharding of
the kernel matrix and Cholesky over a device mesh, NUTS/HMC hyperparameter
posteriors with chains sharded across hosts, Pallas fused covariance
kernels, and float32/bfloat16 performance paths.

Public surface mirrors the reference's re-exports (``lib.rs:39-45``):
kernels, priors, the GP + builder, and the posterior sampler.
"""

from . import kernels, priors
from .config import enable_compile_cache, enable_x64, matmul_precision
from .models import (
    GaussianProcess,
    GaussianProcessBuilder,
    GPState,
    MultivariateNormal,
)
from .utils.errors import CholeskyError, ConfigError, FriedrichError, ShapeError

__version__ = "0.1.0"

__all__ = [
    "kernels",
    "priors",
    "GaussianProcess",
    "GaussianProcessBuilder",
    "GPState",
    "MultivariateNormal",
    "CholeskyError",
    "ConfigError",
    "FriedrichError",
    "ShapeError",
    "enable_x64",
    "enable_compile_cache",
    "matmul_precision",
]
