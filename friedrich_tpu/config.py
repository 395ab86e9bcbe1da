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


def honor_platform_env() -> None:
    """Pin jax's platform to ``$JAX_PLATFORMS`` when set.

    Some TPU images register their PJRT plugin from ``sitecustomize`` at
    interpreter start, which wins over the environment variable; scripts
    that support CPU smoke runs (CI, no-chip machines) call this right
    after importing jax so ``JAX_PLATFORMS=cpu python script.py`` means
    what it says.
    """
    import os

    env = os.environ.get("JAX_PLATFORMS")
    if env:
        jax.config.update("jax_platforms", env)


def enable_compile_cache(path: str = "/tmp/friedrich_jax_cache") -> None:
    """Enable JAX's persistent compilation cache at ``path``.

    TPU programs here are large (trace-time-unrolled panel chains) and the
    remote compile helper makes first compiles minutes-long; the
    persistent cache makes every later process load them in seconds.
    Measured on the axon TPU platform: a fresh process re-running a cached
    program pays ~0.9 s instead of the full compile. Scripts and
    benchmarks call this before building models; it never affects
    numerics (the cache key includes program, flags, and platform).
    """
    # one cache dir per backend: entries are keyed by program+platform,
    # but XLA:CPU AOT results additionally bake the compile machine's CPU
    # features — sharing a dir across backends makes the loader warn
    # about (and risk) feature mismatches
    jax.config.update(
        "jax_compilation_cache_dir", f"{path}-{jax.default_backend()}"
    )
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)


def enable_x64() -> None:
    """Enable float64 globally (needed for 1e-6 parity with the reference)."""
    jax.config.update("jax_enable_x64", True)


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype() -> jnp.dtype:
    """float64 under x64, float32 otherwise."""
    return jnp.float64 if x64_enabled() else jnp.float32


#: MXU matmul precision modes (see :func:`matmul_precision`).
MATMUL_PRECISION_MODES = {
    "bf16": "bfloat16",   # 1 MXU pass: operands rounded to bfloat16
    "f32x3": "high",      # 3 passes: bf16x3 compensation, near-f32
    "f32": "highest",     # 6 passes: true f32 products
}


def matmul_precision(mode: str):
    """Context manager pinning the MXU precision of EVERY matmul in the
    library (covariance builds, factorization downdates, triangular
    solves, predict GEMMs) for ops traced inside the scope.

    On TPU, an unannotated float32 ``dot`` runs the MXU in its fastest
    mode — operands rounded to bfloat16 per pass, float32 accumulation —
    which is the ambient JAX/XLA default and what this library's
    performance numbers are measured at. Users needing true-f32 products
    wrap model construction and use in ``matmul_precision("f32")``
    (measured cost/accuracy ladder: BASELINE.md "Matmul precision on
    TPU"). f64 parity paths are unaffected in substance: x64 math does
    not route through the single-pass bf16 MXU mode.

    Entering a different mode re-traces jitted programs (the ambient
    precision is part of the jit cache key) — expect a one-off
    recompile per mode.
    """
    if mode not in MATMUL_PRECISION_MODES:
        raise ValueError(
            f"mode must be one of {sorted(MATMUL_PRECISION_MODES)}, "
            f"got {mode!r}"
        )
    return jax.default_matmul_precision(MATMUL_PRECISION_MODES[mode])
