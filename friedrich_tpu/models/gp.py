"""Functional GP core: the model state pytree and pure jittable operations.

TPU-native redesign of the reference's ``GaussianProcess`` struct and methods
(``gaussian_process/mod.rs:59-446``). The model is an immutable pytree
:class:`GPState`; every operation is a pure function of the state, so the
whole library composes with ``jit`` / ``vmap`` / ``shard_map``.

**Static shapes, dynamic n.** Training buffers are capacity-padded (the
analogue of the reference's ``EMatrix``/``EVector`` amortized x1.5 growth,
``extendable_matrix.rs:15-112``) and the live count ``n`` is a traced scalar.
The covariance is padded with the identity outside the live block (see
``ops/covariance.py``), which makes Cholesky, triangular solves, and all
reductions exact without recompilation as samples are added.

State contents mirror the reference struct (``mod.rs:59-79``): prior, kernel,
noise, cholesky_epsilon, training inputs, training outputs **stored as prior
residuals** (``mod.rs:156``), and the Cholesky factor of the training
covariance.
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, NamedTuple, Optional

import jax

import jax.numpy as jnp
from flax import struct
from jax import lax
from jax.scipy.linalg import cho_solve, solve_triangular

from ..ops.cholesky import cholesky_append_padded, factor
from ..ops.covariance import (
    cross_covariance,
    cross_covariance_train_padded,
    kernel_diag,
    train_covariance_padded,
)

Array = jnp.ndarray

LOG_2PI = math.log(2.0 * math.pi)


@struct.dataclass
class GPState:
    """Immutable GP model state (padded, jit-stable).

    Reference struct: ``gaussian_process/mod.rs:59-79``.
    """

    x: Array  # (cap, d) padded training inputs
    resid: Array  # (cap,) padded prior residuals y - prior(x)
    l: Array  # (cap, cap) padded Cholesky factor (identity in dead block)
    n: Array  # () int32 live row count
    noise: Any  # () observation-noise std
    kernel: Any  # kernel pytree
    prior: Any  # prior pytree
    # -- static (non-pytree) config --
    eps: Optional[float] = struct.field(pytree_node=False, default=None)
    method: str = struct.field(pytree_node=False, default="gram")
    # "dense": materialize K then factor (small/medium n);
    # "streamed": fused build+factor, K never materialized (memory-bound n);
    # "tiled": in-place MAC-optimal tiled factorization;
    # "hybrid": half-split streamed+TRSM+SYRK+tiled (fastest large n)
    backend: str = struct.field(pytree_node=False, default="dense")
    # factor STORAGE dtype: None (input dtype) or "bf16" (bfloat16 factor,
    # f32 compute — halves factor HBM; streamed backend only). See
    # ops/streamed.streamed_cholesky_factor.
    storage: Optional[str] = struct.field(pytree_node=False, default=None)
    # streamed-backend panel width; None = the tuned auto policy
    # (ops/partition.auto_panel_block: block ~ cap/10, the measured
    # headline optimum — see BASELINE.md)
    block: Optional[int] = struct.field(pytree_node=False, default=None)
    # MXU matmul precision for factorizations (streamed backend):
    # None (ambient = single-pass bf16 operands), "bf16", "f32x3", "f32".
    # The heuristic lengthscale makes K densely correlated at large n
    # (top eigenvalue ~ 0.6 n ampl^2), where the default bf16 operand
    # rounding swamps small noise pivots — cholesky_epsilon or a
    # multi-pass precision is then required (BASELINE.md round 3).
    precision: Optional[str] = struct.field(pytree_node=False, default=None)

    @property
    def capacity(self) -> int:
        return self.x.shape[0]

    @property
    def input_dim(self) -> int:
        return self.x.shape[1]


# ---------------------------------------------------------------------------
# Construction
# ---------------------------------------------------------------------------


def pad_capacity(x: Array, y_resid: Array, cap: int) -> tuple[Array, Array]:
    """Zero-pad live data to a static capacity."""
    n, d = x.shape
    x_pad = jnp.zeros((cap, d), dtype=x.dtype).at[:n].set(x)
    r_pad = jnp.zeros((cap,), dtype=y_resid.dtype).at[:n].set(y_resid)
    return x_pad, r_pad


#: "auto" backend switches from dense to the large-n factorizer here
#: (measured on the 16 GB reference chip; see :func:`auto_large_threshold`
#: for the device-scaled value actually consulted).
_AUTO_LARGE_THRESHOLD = 8192


def auto_large_threshold() -> int:
    """Device-scaled dense->streamed dispatch capacity.

    The dense backend materializes the cap^2 covariance and factor as
    whole-array programs — an O(cap^2)-HBM footprint — so the measured
    16 GB-chip threshold (:data:`_AUTO_LARGE_THRESHOLD` = 8192) scales
    with sqrt(HBM). Pin with
    ``config.set_memory_policy(auto_large_threshold=...)``.
    """
    from .. import config

    override = config.memory_policy_override("auto_large_threshold")
    if override is not None:
        return int(override)
    return int(_AUTO_LARGE_THRESHOLD * config.memory_scale() ** 0.5)


def _build_factor(kernel, x_pad, n_arr, noise, eps, method, backend,
                  l0=None, storage=None, block=None, precision=None,
                  unroll=None):
    with jax.named_scope(f"gp/build_factor[{backend}]"):
        return _build_factor_impl(
            kernel, x_pad, n_arr, noise, eps, method, backend, l0, storage,
            block, precision, unroll,
        )


def _build_factor_impl(kernel, x_pad, n_arr, noise, eps, method, backend,
                       l0=None, storage=None, block=None, precision=None,
                       unroll=None):
    if backend == "auto":
        # Above the dense threshold the trace-time-unrolled streamed
        # factorizer wins on both FLOPs (~0.39 n^3 vs hybrid's ~0.65 n^3)
        # and peak HBM (single L buffer) — see ops/streamed.py.
        backend = "streamed" if x_pad.shape[0] > auto_large_threshold() else "dense"
    if storage is not None and backend != "streamed":
        from ..utils.errors import ConfigError

        raise ConfigError(
            f"factor storage {storage!r} requires the 'streamed' backend "
            f"(got {backend!r})"
        )
    if precision is not None and backend != "streamed":
        from ..utils.errors import ConfigError

        raise ConfigError(
            f"factor precision {precision!r} requires the 'streamed' "
            f"backend (got {backend!r}); other backends inherit the "
            f"ambient config.matmul_precision scope"
        )
    if backend == "streamed":
        from ..ops.streamed import streamed_cholesky_factor

        return streamed_cholesky_factor(
            kernel, x_pad, n_arr, noise, eps=eps, method=method, l0=l0,
            storage=storage, block=block, precision=precision,
            unroll=unroll,
        )
    if backend == "tiled":
        from ..ops.tiled import tiled_cholesky_factor

        return tiled_cholesky_factor(
            kernel, x_pad, n_arr, noise, eps=eps, method=method
        )
    if backend == "hybrid":
        from ..ops.hybrid import hybrid_cholesky_factor

        return hybrid_cholesky_factor(
            kernel, x_pad, n_arr, noise, eps=eps, method=method
        )
    k_pad = train_covariance_padded(kernel, x_pad, n_arr, noise, method=method)
    return factor(k_pad, eps)


def _make_state_fused_body(kernel, prior, x, y, n_arr, noise, l0, *, cap,
                           eps, method, backend, storage, block, precision):
    """Fused state construction (see :func:`make_state`): one dispatch."""
    resid = y - prior.mean(x)
    x_pad, r_pad = pad_capacity(x, resid, cap)
    l_pad, ok = _build_factor(
        kernel, x_pad, n_arr, noise, eps, method, backend, l0=l0,
        storage=storage, block=block, precision=precision,
    )
    return x_pad, r_pad, l_pad, ok


_FUSED_STATICS = (
    "cap", "eps", "method", "backend", "storage", "block", "precision",
)
#: Streamed variant: the caller allocates the (cap, cap) zeros workspace
#: and DONATES it, so the factor's unrolled update-slice chain aliases
#: that buffer (single-factor HBM discipline — without donation a second
#: live L OOMs a 16 GB chip at n=50k f32, measured round 2/4).
_make_state_fused_streamed = partial(
    jax.jit, static_argnames=_FUSED_STATICS, donate_argnums=(6,)
)(_make_state_fused_body)
#: Dense variant: no workspace (the monolithic cholesky sizes itself).
_make_state_fused_dense = partial(
    jax.jit, static_argnames=_FUSED_STATICS
)(_make_state_fused_body)

#: (cap, backend, storage, precision) configs whose fused construction
#: the compile stack rejected this process — later constructions use the
#: eager composition directly.
_FUSED_CONSTRUCT_UNAVAILABLE: set = set()


class _FusedConstructSkip(Exception):
    """Internal: route a memoized fused-construction failure to the
    eager path without re-attempting the compile."""


def make_state(
    kernel,
    prior,
    noise,
    x: Array,
    y: Array,
    eps: Optional[float] = None,
    method: str = "gram",
    cap: Optional[int] = None,
    backend: str = "dense",
    storage: Optional[str] = None,
    block: Optional[int] = None,
    precision: Optional[str] = None,
) -> tuple[GPState, Array]:
    """Build a trained state from live data (``GaussianProcess::new``,
    ``mod.rs:142-167``): residualize against the prior, build the padded
    covariance, factor it.

    Returns ``(state, ok)``; ``ok`` is False if the factorization produced
    non-finite values (caller raises ``CholeskyError``).
    """
    n, _ = x.shape
    cap = cap or n
    if cap < n:
        from ..utils.errors import ConfigError

        raise ConfigError(
            f"capacity {cap} is smaller than the number of training "
            f"samples {n}"
        )
    n_arr = jnp.asarray(n, dtype=jnp.int32)
    # static jit args must hash: scalar eps -> float, list schedule -> tuple
    eps = float(eps) if eps is not None else None
    if isinstance(block, list):
        block = tuple(block)
    resolved = backend
    if resolved == "auto":
        resolved = "streamed" if cap > auto_large_threshold() else "dense"
    if resolved in ("dense", "streamed"):
        # ONE program for residualize + pad + build + factor: each eager
        # dispatch is a full runtime round trip (expensive over a remote
        # TPU link). The streamed variant threads a DONATED zeros
        # workspace to the factor chain (see _make_state_fused_streamed).
        noise_arr = jnp.asarray(noise, dtype=x.dtype)
        fused_key = (cap, resolved, storage, precision)
        try:
            if fused_key in _FUSED_CONSTRUCT_UNAVAILABLE:
                raise _FusedConstructSkip()
            if resolved == "streamed":
                from ..ops.streamed import STORAGE_DTYPES

                l0 = jnp.zeros(
                    (cap, cap), dtype=STORAGE_DTYPES[storage] or x.dtype
                )
                x_pad, r_pad, l_pad, ok = _make_state_fused_streamed(
                    kernel, prior, x, y, n_arr, noise_arr, l0,
                    cap=cap, eps=eps, method=method, backend=resolved,
                    storage=storage, block=block, precision=precision,
                )
            else:
                x_pad, r_pad, l_pad, ok = _make_state_fused_dense(
                    kernel, prior, x, y, n_arr, noise_arr, None,
                    cap=cap, eps=eps, method=method, backend=resolved,
                    storage=storage, block=block, precision=precision,
                )
        except Exception as e:  # noqa: BLE001
            # at frontier sizes the single fused program can exceed what
            # the compile stack accepts (measured: n=80k bf16 overflows
            # HBM by ~340 MB at compile while the eager donate path
            # fits) — fall back to the eager composition; memoize per
            # configuration so later constructions skip the attempt
            skip = isinstance(e, _FusedConstructSkip)
            if not skip and not any(
                s in str(e)
                for s in ("remote_compile", "RESOURCE_EXHAUSTED",
                          "Ran out of memory")
            ):
                raise
            if not skip:
                import warnings

                warnings.warn(
                    "fused state construction failed to compile "
                    f"({str(e)[:120]}...); falling back to eager "
                    "construction",
                    RuntimeWarning,
                    stacklevel=2,
                )
                _FUSED_CONSTRUCT_UNAVAILABLE.add(fused_key)
            resid = y - prior.mean(x)
            x_pad, r_pad = pad_capacity(x, resid, cap)
            l_pad, ok = _build_factor(
                kernel, x_pad, n_arr, noise, eps, method, resolved,
                storage=storage, block=block, precision=precision,
            )
    else:
        resid = y - prior.mean(x)
        x_pad, r_pad = pad_capacity(x, resid, cap)
        l_pad, ok = _build_factor(
            kernel, x_pad, n_arr, noise, eps, method, backend,
            storage=storage, block=block, precision=precision,
        )
    state = GPState(
        x=x_pad,
        resid=r_pad,
        l=l_pad,
        n=n_arr,
        noise=jnp.asarray(noise, dtype=x.dtype),
        kernel=kernel,
        prior=prior,
        eps=eps,
        method=method,
        backend=backend,
        storage=storage,
        block=block,
        precision=precision,
    )
    return state, ok


def rebuild_cholesky(state: GPState,
                     reuse_buffer: bool = False,
                     unroll=None) -> tuple[GPState, Array]:
    """Re-factor the training covariance for the current hyperparameters
    (the per-iteration rebuild at ``optimizer.rs:133-136,267-270``).

    ``reuse_buffer=True`` donates the CURRENT factor's buffer as the new
    factor's workspace on host-level streamed-unrolled rebuilds (the old
    ``state`` must not be used afterwards) — avoids holding old + new L
    at once, which would double peak HBM at large n.

    ``unroll``: streamed-backend program-shape override (see
    ``ops/streamed.streamed_cholesky_factor``) — ``False`` selects the
    constant-program-size fori factorizer; callers embedding the rebuild
    in larger fused programs use it to stay inside the remote compiler's
    program-size envelope."""
    l_pad, ok = _build_factor(
        state.kernel, state.x, state.n, state.noise, state.eps, state.method,
        state.backend,
        l0=state.l if reuse_buffer else None,
        storage=state.storage,
        block=state.block,
        precision=state.precision,
        unroll=unroll,
    )
    return state.replace(l=l_pad), ok


def grow_capacity(state: GPState, new_cap: int,
                  copy_factor: bool = True) -> GPState:
    """Host-side capacity growth (recompile boundary): zero-pad data, extend
    the Cholesky factor with the identity. Mirrors ``EMatrix`` x1.5 growth
    (``extendable_matrix.rs:30-49``).

    ``copy_factor=False`` skips copying the old factor into the enlarged
    buffer (it stays the bare identity) — for callers that immediately
    REBUILD (the bf16-storage append): saves a cap^2 copy and lets the
    rebuild donate the fresh buffer."""
    cap = state.capacity
    if new_cap <= cap:
        return state
    d = state.input_dim
    x = jnp.zeros((new_cap, d), dtype=state.x.dtype).at[:cap].set(state.x)
    r = jnp.zeros((new_cap,), dtype=state.resid.dtype).at[:cap].set(state.resid)
    l_new = jnp.eye(new_cap, dtype=state.l.dtype)
    if copy_factor:
        l_new = l_new.at[:cap, :cap].set(state.l)
    return state.replace(x=x, resid=r, l=l_new)


# ---------------------------------------------------------------------------
# Incremental update (``add_samples``, ``mod.rs:173-190``)
# ---------------------------------------------------------------------------


def add_samples_padded(state: GPState, x_new: Array, y_new: Array) -> GPState:
    """Append ``k`` samples in O(n^2 k) via the blocked Cholesky append.

    Requires capacity >= n + k (the OO wrapper grows first). Matches
    ``add_samples`` (``mod.rs:173-190``): residualize against the CURRENT
    prior, grow buffers, rank-update the factor.
    """
    k = x_new.shape[0]
    r_new = y_new - state.prior.mean(x_new)
    zero = jnp.zeros_like(state.n)
    x_pad = lax.dynamic_update_slice(state.x, x_new, (state.n, zero))
    r_pad = lax.dynamic_update_slice(state.resid, r_new, (state.n,))
    l_pad = cholesky_append_padded(
        state.l,
        state.kernel,
        x_pad,
        state.n,
        k,
        state.noise,
        eps=state.eps,
        method=state.method,
    )
    return state.replace(x=x_pad, resid=r_pad, l=l_pad, n=state.n + k)


def add_samples_rebuild(state: GPState, x_new: Array, y_new: Array,
                        reuse_buffer: bool = False) -> tuple[GPState, Array]:
    """Append samples by FULL refactorization — the bf16-STORAGE append.

    The O(n^2 k) rank-update solves ``S = L^-1 K12`` against the stored
    factor; with ``storage="bf16"`` that factor carries ~2^-8 relative
    rounding which amplifies through ``S^T S`` and routinely drives the
    appended Schur complement ``K22 - S^T S`` indefinite (measured: fails
    at n=500, noise=0.1 where the f32-stored rank-update succeeds). So
    bf16-stored models append by updating the data buffers and
    refactorizing — O(n^3), but atomic and exact-to-storage. Memory is
    safe wherever the f32 model would have fit: the transient old+new
    bf16 factors together cost exactly one f32 factor.

    ``reuse_buffer=True`` DONATES the current factor's buffer as the new
    factor's workspace — only safe when that buffer is disposable (e.g. a
    just-grown ``grow_capacity(copy_factor=False)`` identity, where losing
    atomicity costs nothing because the old factor lives elsewhere).

    Returns ``(state, ok)`` like :func:`make_state`.
    """
    k = x_new.shape[0]
    r_new = y_new - state.prior.mean(x_new)
    zero = jnp.zeros_like(state.n)
    x_pad = lax.dynamic_update_slice(state.x, x_new, (state.n, zero))
    r_pad = lax.dynamic_update_slice(state.resid, r_new, (state.n,))
    state = state.replace(x=x_pad, resid=r_pad, n=state.n + k)
    return rebuild_cholesky(state, reuse_buffer=reuse_buffer)


# ---------------------------------------------------------------------------
# Prediction (``mod.rs:226-350``)
# ---------------------------------------------------------------------------


#: Above this capacity, predict-path triangular solves use the loop-blocked
#: sweeps (XLA's monolithic solve with a wide RHS breaks the compiler there).
_BLOCKED_SOLVE_THRESHOLD = 16384


def _use_blocked(state: GPState) -> bool:
    """Blocked sweeps above the compiler threshold — and for EVERY bf16
    STORAGE factor: the panel sweeps read bf16 natively (GEMMs promote
    into f32 accumulation, diagonal blocks invert in f32), whereas XLA's
    monolithic ``solve_triangular`` would need a full-factor f32 cast
    materialized PER predict batch."""
    return (
        state.capacity > _BLOCKED_SOLVE_THRESHOLD
        or state.l.dtype == jnp.bfloat16
    )


def _solve_lower(
    state: GPState, c: Array, diag_inv: Optional[Array] = None
) -> Array:
    if _use_blocked(state):
        from ..ops.blocked_solve import blocked_solve_lower

        return blocked_solve_lower(state.l, c, diag_inv=diag_inv)
    return solve_triangular(state.l, c, lower=True)


def _solve_lower_t(
    state: GPState, c: Array, diag_inv: Optional[Array] = None
) -> Array:
    if _use_blocked(state):
        from ..ops.blocked_solve import blocked_solve_lower_t

        return blocked_solve_lower_t(state.l, c, diag_inv=diag_inv)
    return solve_triangular(state.l, c, lower=True, trans=1)


def _cho_solve(state: GPState, c: Array) -> Array:
    if _use_blocked(state):
        from ..ops.blocked_solve import blocked_cho_solve

        return blocked_cho_solve(state.l, c)
    return cho_solve((state.l, True), c)


def _train_cross(state: GPState, xq: Array) -> Array:
    return cross_covariance_train_padded(
        state.kernel, state.x, state.n, xq, method=state.method
    )


class PredictWeights(NamedTuple):
    """Query-independent solves against the trained factor, derived once
    per (factor, residuals) pair and reused across predict batches.

    The reference re-solves the training system on every predict call
    (``mod.rs:226-244``: ``cho_solve`` per query batch). Precomputing

      ``beta  = L^-1 resid``      (one forward sweep)
      ``alpha = L^-T beta = K^-1 resid``  (one backward sweep)

    makes the posterior mean a single GEMM (``prior + c^T alpha``, zero
    triangular sweeps) and mean+variance a single forward sweep
    (``kl = L^-1 c``; ``mean = prior + kl^T beta``) instead of the
    two-sweep ``cho_solve`` — at n=50k the sweeps are the entire predict
    cost, so this doubles steady-state serving throughput (BASELINE.md).
    """

    beta: Array  # (cap,) L^-1 resid (zero in the dead block)
    alpha: Array  # (cap,) K^-1 resid (zero in the dead block)
    #: stacked diagonal-panel inverses for the blocked sweeps (None below
    #: the blocked-solve threshold): makes every per-batch sweep pure
    #: GEMM — the per-call panel TRSMs were the measured reason solve
    #: throughput FELL with panel size (BASELINE.md round-2 predict)
    diag_inv: Optional[Array] = None


#: Above this capacity the cached panel-inverse stack is skipped: at the
#: single-chip frontier the factor occupies most of HBM and the inverse
#: stack + its build temporaries push past it (measured: n=80k bf16,
#: 12.8 GB factor + 1.28 GB inverses -> compile OOM by 1.16 GB on the
#: 16 GB reference chip). The sweeps then use per-panel TRSMs — the
#: round-3-proven frontier path. :func:`panel_inverse_cap` is the
#: device-scaled value actually consulted.
PANEL_INVERSE_CAP = 60_000


def panel_inverse_cap() -> int:
    """Device-scaled capacity limit for the cached panel-inverse stack.

    The contested resource is HBM beside the O(cap^2) factor, so the
    measured 16 GB-chip cap (:data:`PANEL_INVERSE_CAP` = 60k) scales with
    sqrt(HBM) — a 64 GB chip keeps the fast pure-GEMM sweeps to cap~120k.
    Pin with ``config.set_memory_policy(panel_inverse_cap=...)``.
    """
    from .. import config

    override = config.memory_policy_override("panel_inverse_cap")
    if override is not None:
        return int(override)
    return int(PANEL_INVERSE_CAP * config.memory_scale() ** 0.5)


def derive_weights(state: GPState) -> PredictWeights:
    """Compute :class:`PredictWeights` (two m=1 sweeps + the panel
    inverses, O(n^2) + O(n b^2 /2) — amortized across predict batches)."""
    with jax.named_scope("gp/derive_weights"):
        diag_inv = None
        if _use_blocked(state) and state.capacity <= panel_inverse_cap() \
                and state.l.dtype in (jnp.float32, jnp.bfloat16):
            from ..ops.blocked_solve import panel_inverses

            diag_inv = panel_inverses(state.l)
        beta = _solve_lower(state, state.resid, diag_inv)
        alpha = _solve_lower_t(state, beta, diag_inv)
    return PredictWeights(beta=beta, alpha=alpha, diag_inv=diag_inv)


def predict_mean(
    state: GPState, xq: Array, weights: Optional[PredictWeights] = None
) -> Array:
    """Posterior mean: ``prior + K(xq, X) K^-1 resid`` (``mod.rs:226-244``).

    With ``weights`` (see :func:`derive_weights`) the solve drops out
    entirely: one covariance strip + one GEMM against ``alpha``."""
    with jax.named_scope("gp/predict_mean"):
        c = _train_cross(state, xq)
        if weights is not None:
            return state.prior.mean(xq) + c.T @ weights.alpha
        w = _cho_solve(state, c)
        return state.prior.mean(xq) + w.T @ state.resid


def predict_variance(
    state: GPState, xq: Array, weights: Optional[PredictWeights] = None
) -> Array:
    """Latent predictive variance — observation noise NOT added back,
    matching ``mod.rs:248-273`` (see ``:266-269``)."""
    with jax.named_scope("gp/predict_variance"):
        c = _train_cross(state, xq)
        kl = _solve_lower(
            state, c, weights.diag_inv if weights is not None else None
        )
        base = kernel_diag(state.kernel, xq)
        return base - jnp.sum(kl * kl, axis=0)


def predict_mean_variance(
    state: GPState, xq: Array, weights: Optional[PredictWeights] = None
) -> tuple[Array, Array]:
    """Shared-weights mean+variance (``mod.rs:290-326``).

    With ``weights``: ONE forward sweep (``kl``) serves both the mean
    (``kl^T beta``) and the variance (``sum kl^2``), halving the
    per-batch solve cost vs the two-sweep ``cho_solve`` form."""
    with jax.named_scope("gp/predict_mean_variance"):
        c = _train_cross(state, xq)
        base = kernel_diag(state.kernel, xq)
        if weights is not None:
            kl = _solve_lower(state, c, weights.diag_inv)
            mean = state.prior.mean(xq) + kl.T @ weights.beta
            return mean, base - jnp.sum(kl * kl, axis=0)
        w = _cho_solve(state, c)
        mean = state.prior.mean(xq) + w.T @ state.resid
        var = base - jnp.sum(c * w, axis=0)  # column-dot form of mod.rs:314-319
        return mean, var


def predict_covariance(state: GPState, xq: Array) -> Array:
    """Full posterior covariance ``Kqq - (L^-1 Kq)^T (L^-1 Kq)``
    (``mod.rs:329-350``)."""
    c = _train_cross(state, xq)
    kl = _solve_lower(state, c)
    kqq = cross_covariance(state.kernel, xq, xq, method=state.method)
    return kqq - kl.T @ kl


def posterior(
    state: GPState, xq: Array, weights: Optional[PredictWeights] = None
) -> tuple[Array, Array]:
    """(mean, covariance) of the posterior at ``xq`` — the ``sample_at``
    computation (``mod.rs:371-392``), which uses ``Kq^T K^-1 Kq`` rather
    than the triangular form.

    With ``weights``: one forward sweep; the covariance uses the
    (equivalent, PSD-by-construction) triangular form ``kl^T kl``."""
    c = _train_cross(state, xq)
    kqq = cross_covariance(state.kernel, xq, xq, method=state.method)
    if weights is not None:
        kl = _solve_lower(state, c, weights.diag_inv)
        cov = kqq - kl.T @ kl
        mean = state.prior.mean(xq) + kl.T @ weights.beta
        return mean, cov
    w = _cho_solve(state, c)
    cov = kqq - c.T @ w
    mean = state.prior.mean(xq) + w.T @ state.resid
    return mean, cov


# ---------------------------------------------------------------------------
# Model-selection scores (``mod.rs:196-220``)
# ---------------------------------------------------------------------------


def likelihood(
    state: GPState, weights: Optional[PredictWeights] = None
) -> Array:
    """The reference's ``likelihood()`` — REPLICATED APPROXIMATION.

    Its complexity penalty sums ``ln|k(x_i, x_i) + noise^2|`` over training
    points (``mod.rs:208-213``), which is NOT the true log-determinant; the
    exact score is :func:`log_marginal_likelihood`. Replicated verbatim for
    parity (``mod.rs:196-220``). ``weights.beta`` (if given) IS the
    forward solve ``L^-1 resid`` — the sweep is skipped.
    """
    ol = weights.beta if weights is not None else _solve_lower(
        state, state.resid
    )
    data_fit = jnp.sum(ol * ol)
    diag = kernel_diag(state.kernel, state.x) + state.noise * state.noise
    live = jnp.arange(state.capacity) < state.n
    complexity = jnp.sum(jnp.where(live, jnp.log(jnp.abs(diag)), 0.0))
    norm = state.n.astype(diag.dtype) * LOG_2PI
    return -(data_fit + complexity + norm) / 2.0


def log_marginal_likelihood(
    state: GPState, weights: Optional[PredictWeights] = None
) -> Array:
    """Exact log marginal likelihood (corrected variant):
    ``-1/2 (r^T K^-1 r + ln|K| + n ln 2pi)`` with ``ln|K| = 2 sum ln L_ii``."""
    ol = weights.beta if weights is not None else _solve_lower(
        state, state.resid
    )
    data_fit = jnp.sum(ol * ol)
    diag_l = jnp.diagonal(state.l).astype(data_fit.dtype)
    live = jnp.arange(state.capacity) < state.n
    logdet = 2.0 * jnp.sum(jnp.where(live, jnp.log(diag_l), 0.0))
    norm = state.n.astype(data_fit.dtype) * LOG_2PI
    return -(data_fit + logdet + norm) / 2.0
