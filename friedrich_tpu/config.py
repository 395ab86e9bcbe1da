"""Global configuration and dtype policy.

The reference is f64-only (nalgebra ``DMatrix<f64>``). On TPU, f64 is
software-emulated, so the dtype is a first-class knob here:

- parity paths (tests comparing against the reference's math at 1e-6) enable
  x64 and run in float64;
- performance paths default to float32 (with f32 MXU accumulation), the
  TPU-native sweet spot.

``default_dtype()`` resolves to float64 when ``jax_enable_x64`` is active and
float32 otherwise, so a single code path serves both.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

#: Default number of ADAM iterations for hyperparameter fitting
#: (reference ``builder.rs:76``).
DEFAULT_MAX_ITER = 100

#: Default convergence fraction for the multiplicative ADAM stop rule
#: (reference ``builder.rs:77``).
DEFAULT_CONVERGENCE_FRACTION = 0.05

#: Default wall-clock limit for fitting, seconds (reference ``builder.rs:78``:
#: one hour).
DEFAULT_MAX_TIME = 3600.0

#: Capacity growth factor for incremental training buffers (reference
#: ``extendable_matrix.rs:38,86``: 1.5x amortized growth).
GROWTH_FACTOR = 1.5


def enable_x64() -> None:
    """Enable float64 globally (needed for 1e-6 parity with the reference)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype() -> jnp.dtype:
    """float64 under x64, float32 otherwise."""
    return jnp.float64 if x64_enabled() else jnp.float32
