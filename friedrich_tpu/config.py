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


# -- device-memory policy ---------------------------------------------------
#
# Every single-chip capacity constant in the library (panel-inverse cache
# cap, frontier predict chunking, dense/streamed dispatch thresholds, MCMC
# chain envelope) was MEASURED on a 16 GB v5e. Those numbers are wrong on a
# 32 GB v5p or 95 GB v6e chip, so they are derived at first use from the
# runtime device's actual HBM size (``memory_stats()["bytes_limit"]``),
# falling back to the measured-reference 16 GB when the backend does not
# report memory (CPU, some plugins). Users can pin any derived value with
# :func:`set_memory_policy`.

#: HBM size of the chip the library's capacity constants were measured on
#: (16 GB v5e — BASELINE.md rounds 1-4).
REFERENCE_HBM_BYTES = 16 * 2**30

_hbm_bytes_cache: int | None = None
_memory_policy_overrides: dict = {}

#: Names accepted by :func:`set_memory_policy` (documented at their
#: consumer sites: ``models/gp.py``, ``models/api.py``, ``mcmc/nuts.py``).
MEMORY_POLICY_KNOBS = (
    "panel_inverse_cap",      # models/gp.py — cached panel-inverse stack
    "frontier_capacity",      # models/api.py — predict-batch chunk cliff
    "auto_large_threshold",   # models/gp.py — dense->streamed dispatch
    "chain_envelope",         # mcmc/nuts.py — chains x n per program
    "scan_work_budget",       # mcmc/nuts.py — work units per scan program
)


def device_hbm_bytes() -> int:
    """The accelerator's per-device memory budget in bytes.

    Reads ``memory_stats()["bytes_limit"]`` from the first local device
    (cached — devices do not change size mid-process); falls back to
    :data:`REFERENCE_HBM_BYTES` when the backend reports nothing (CPU
    virtual meshes report host RAM or nothing; the policy constants were
    measured on the 16 GB reference chip, so that is the honest default).
    """
    global _hbm_bytes_cache
    if _hbm_bytes_cache is None:
        bytes_limit = None
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                bytes_limit = stats.get("bytes_limit")
        except Exception:  # noqa: BLE001 — any backend without stats
            bytes_limit = None
        if not bytes_limit or jax.default_backend() == "cpu":
            # CPU reports host RAM; the measured policy numbers assume the
            # reference accelerator, and tests pin them — use the default
            bytes_limit = REFERENCE_HBM_BYTES
        _hbm_bytes_cache = int(bytes_limit)
    return _hbm_bytes_cache


def memory_scale() -> float:
    """``device_hbm_bytes() / REFERENCE_HBM_BYTES`` — the factor by which
    the running chip's HBM exceeds the chip the policy constants were
    measured on. Capacity thresholds whose footprint is O(cap^2) scale by
    ``sqrt(memory_scale())``; per-program state budgets scale linearly."""
    return device_hbm_bytes() / REFERENCE_HBM_BYTES


def set_memory_policy(**knobs) -> None:
    """Pin one or more derived capacity constants, overriding the
    device-scaled defaults. ``set_memory_policy(panel_inverse_cap=90_000)``;
    pass ``None`` to restore a knob's derived default. Valid names:
    :data:`MEMORY_POLICY_KNOBS`."""
    for name, value in knobs.items():
        if name not in MEMORY_POLICY_KNOBS:
            raise ValueError(
                f"unknown memory-policy knob {name!r}; valid: "
                f"{MEMORY_POLICY_KNOBS}"
            )
        if value is None:
            _memory_policy_overrides.pop(name, None)
        else:
            _memory_policy_overrides[name] = value


def memory_policy_override(name: str):
    """The pinned value for ``name``, or None when derived (internal)."""
    return _memory_policy_overrides.get(name)


def _reset_memory_policy_for_testing(hbm_bytes=None) -> None:
    """Reset caches and optionally mock the device HBM size (tests only)."""
    global _hbm_bytes_cache
    _hbm_bytes_cache = hbm_bytes
    _memory_policy_overrides.clear()


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
