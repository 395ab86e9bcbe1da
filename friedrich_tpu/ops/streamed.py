"""Streamed (never-materialize-K) blocked Cholesky factorization.

The TPU-native answer to the reference's ``make_cholesky_cov_matrix``
(``algebra/mod.rs:59-92``) at large n. Instead of building the full n x n
covariance and handing it to a monolithic factorization, each column panel
of K is GENERATED from the training inputs on the fly (one MXU cross-
covariance strip), immediately downdated against previously factored panels
(left-looking), and factored:

    for panel j:
        S   = K(X, X_j)  - sum_{i<j} L[:, i] @ L[j, i]^T     (streamed build)
        Ld  = chol(S[j])            (with optional per-pivot eps substitute)
        L[:, j] = [0; Ld; S_below @ Ld^-T]

Why this shape:
- **Memory**: only L (n^2) plus one (n, B) strip live in HBM — K itself is
  never stored. n=50k f32 fits a single 16 GB chip.
- **Compile**: the program is one small ``fori_loop`` body (three GEMM-sized
  ops), constant size in n — compiles in seconds where XLA's unrolled
  Cholesky at n=50k crashes the compiler.
- **MXU**: all heavy work is (n, B) x (B, B) GEMMs.
- The same panel loop is the template for the mesh-distributed version
  (``parallel/distributed_cholesky.py``).

The inner-panel downdate loop has a traced trip count (``fori_loop(0, j)``),
costing ~3x the theoretical n^3/3 Cholesky FLOPs in exchange for static
shapes; the panel GEMMs run at MXU speed so this wins wall-clock at scale.
"""

from __future__ import annotations

import contextlib
import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .cholesky import (
    blocked_diag_cholesky, cholesky_with_substitute, rsolve_lower_t,
    rsolve_lower_t_blocked,
)
from .covariance import cross_covariance, kernel_diag

Array = jnp.ndarray

DEFAULT_PANEL = 1024

#: MXU precision modes for the factorization's matmuls (downdate GEMMs,
#: panel solves, diagonal-block factorizations). On TPU an UNANNOTATED
#: f32 ``dot`` runs the MXU in its fastest mode — operands rounded to
#: bfloat16, f32 accumulation (measured: identical error to an explicit
#: bf16 operand cast; see BASELINE.md "Matmul precision on TPU").
#: ``"bf16"`` pins that behavior explicitly; ``"f32x3"`` is the 3-pass
#: bf16x3 compensation (near-f32 products); ``"f32"`` is true f32
#: (6-pass). ``None`` inherits the ambient
#: ``jax.default_matmul_precision`` (i.e. bf16 unless the user set it,
#: e.g. via ``friedrich_tpu.config.matmul_precision``).
from ..config import MATMUL_PRECISION_MODES as PRECISION_MODES  # noqa: E402


def _precision_scope(precision):
    if precision is None:
        return contextlib.nullcontext()
    return jax.default_matmul_precision(PRECISION_MODES[precision])


def _train_cov_panel(kernel, x_pad, xj, j0, n, noise, block, method):
    """One (cap, B) column strip of the padded training covariance:
    kernel evals + noise^2 diagonal on the live block, identity padding.
    The diagonal is set from the ANALYTIC per-row kernel diagonal
    (distance exactly zero), not the pairwise tile — see
    ``train_covariance_padded``."""
    cap = x_pad.shape[0]
    k = cross_covariance(kernel, x_pad, xj, method=method)
    kd = kernel_diag(kernel, xj) + noise * noise
    rows = jnp.arange(cap)[:, None]
    cols = j0 + jnp.arange(block)[None, :]
    diag = rows == cols
    k = jnp.where(diag, kd[None, :], k)
    live = (rows < n) & (cols < n)
    eye = jnp.where(diag, 1.0, 0.0).astype(k.dtype)
    return jnp.where(live, k, eye)


@functools.partial(
    jax.jit,
    static_argnames=("treedef", "block", "method", "eps", "precision"),
)
def _streamed_cholesky_impl(
    leaves, treedef, x_pad, n, noise, eps, block, method, precision=None
):
    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    with _precision_scope(precision):
        return _fori_body(
            kernel, x_pad, n, noise, eps, block, method
        )


def _fori_body(kernel, x_pad, n, noise, eps, block, method):
    cap, d = x_pad.shape
    num_panels = cap // block
    dtype = x_pad.dtype
    rows_all = jnp.arange(cap)[:, None]

    def panel_step(j, l_acc):
        j0 = j * block
        xj = lax.dynamic_slice(x_pad, (j0, 0), (block, d))
        s = _train_cov_panel(kernel, x_pad, xj, j0, n, noise, block, method)

        def downdate(i, s_acc):
            i0 = i * block
            l_strip = lax.dynamic_slice(l_acc, (0, i0), (cap, block))
            l_rows = lax.dynamic_slice(l_acc, (j0, i0), (block, block))
            return s_acc - jnp.dot(
                l_strip, l_rows.T, preferred_element_type=dtype
            )

        s = lax.fori_loop(0, j, downdate, s)

        diag_blk = lax.dynamic_slice(s, (j0, 0), (block, block))
        if eps is None:
            ld = jnp.linalg.cholesky(diag_blk)
        else:
            # blocked pivot substitution (128-wide inner loops; the
            # bulk of the panel stays in MXU GEMMs)
            ld = cholesky_with_substitute(diag_blk, eps, block=128)
        t = rsolve_lower_t(ld, s)  # (cap, block); f32: inverse-GEMM
        strip = lax.dynamic_update_slice(t, ld, (j0, 0))
        strip = jnp.where(rows_all < j0, 0.0, strip)
        return lax.dynamic_update_slice(l_acc, strip, (0, j0))

    l_init = jnp.zeros((cap, cap), dtype=dtype)
    l_mat = lax.fori_loop(0, num_panels, panel_step, l_init)
    ok = jnp.isfinite(jnp.sum(l_mat))  # whole factor, no temp: see ops/cholesky.factor
    return l_mat, ok


def _train_cov_panel_tail(kernel, x_tail, xj, j0, n, noise, block, method):
    """The (cap - j0, B) TAIL of a training-covariance column strip (rows
    j0..cap): kernel evals + noise^2 diagonal on the live block, identity
    padding.  ``j0`` is a static trace-time offset.  Diagonal from the
    analytic per-row kernel diagonal (see ``train_covariance_padded``)."""
    rest = x_tail.shape[0]
    k = cross_covariance(kernel, x_tail, xj, method=method)
    kd = kernel_diag(kernel, xj) + noise * noise
    rows = j0 + jnp.arange(rest)[:, None]
    cols = j0 + jnp.arange(block)[None, :]
    diag = rows == cols
    k = jnp.where(diag, kd[None, :], k)
    live = (rows < n) & (cols < n)
    eye = jnp.where(diag, 1.0, 0.0).astype(k.dtype)
    return jnp.where(live, k, eye)


@functools.partial(
    jax.jit,
    static_argnames=(
        "treedef", "block", "method", "eps", "fused", "precision", "storage",
        "solve_blocks", "diag_blocks",
    ),
)
def _streamed_unrolled_impl(
    leaves, treedef, x_pad, n, noise, eps, block, method, fused=False,
    precision=None, storage=None, solve_blocks=1, diag_blocks=1, l0=None,
):
    """FLOP-optimal fused build+factor: the panel loop unrolls at TRACE
    time, so every column strip has a STATIC height ``cap - j0``.

    Two wins over the ``fori_loop`` version above, both direct
    consequences of static triangular shapes:

    - **FLOPs**: downdates touch only rows at/below the panel —
      sum_j (cap - jB) * B * jB = n^3/6 MACs, the Cholesky optimum (the
      fori version's fixed full-height strips cost 3x that). Total with
      the panel solves ~0.39 n^3 FLOPs vs optimal 0.33 n^3.
    - **Memory**: the (cap, cap) factor is never carried by a ``while``
      loop — it flows through a chain of static-offset
      ``dynamic_update_slice`` ops (aliased in place by XLA) and is read
      as a loop invariant by the inner downdate loops. Peak HBM = L + one
      tail strip. The fori variants keep a second live copy of the factor
      at loop boundaries, which is exactly what pushed the 2x-L hybrid
      past a 16 GB chip at n=50k f32.

    Program size grows linearly with cap/block (one body per panel);
    callers cap the panel count (``MAX_UNROLL_PANELS``) to keep the
    remote TPU compiler comfortable.
    """
    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    # ``l0``: workspace buffer threaded from an OUTER jit whose top-level
    # signature donates it (e.g. the fused state constructor) — the
    # update-slice chain then aliases that buffer instead of forcing XLA
    # to keep a second live factor (which OOMs a 16 GB chip at n=50k f32;
    # see _streamed_unrolled_donate). Must be (cap, cap) zeros in the
    # storage dtype with a zero strict upper triangle.
    store_dtype = STORAGE_DTYPES[storage] or x_pad.dtype
    if l0 is not None and l0.dtype != store_dtype:
        raise ValueError(
            f"workspace buffer dtype {l0.dtype} does not match the factor "
            f"storage dtype {store_dtype}"
        )
    l_full = l0 if l0 is not None else jnp.zeros(
        (x_pad.shape[0],) * 2, dtype=store_dtype
    )
    with _precision_scope(precision):
        return _unrolled_body(
            kernel, x_pad, n, noise, eps, block, method, l_full, fused,
            solve_blocks, diag_blocks,
        )


@functools.partial(
    jax.jit,
    static_argnames=(
        "treedef", "block", "method", "eps", "fused", "precision",
        "solve_blocks", "diag_blocks",
    ),
    donate_argnums=(8,),
)
def _streamed_unrolled_donate(
    leaves, treedef, x_pad, n, noise, eps, block, method, l0, fused=False,
    precision=None, solve_blocks=1, diag_blocks=1,
):
    # storage dtype rides on l0 (the caller allocates/donates the buffer)
    """Host-level entry: the caller allocates the (cap, cap) zeros buffer
    and DONATES it, so the returned factor aliases that buffer. Without
    donation XLA materializes the update-slice chain's result into a
    separate output buffer — a second live L that OOMs a 16 GB chip at
    n=50k f32 (measured; the fori_loop program's while-carry does get
    output-aliased, the unrolled chain's result does not)."""
    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    with _precision_scope(precision):
        return _unrolled_body(
            kernel, x_pad, n, noise, eps, block, method, l0, fused,
            solve_blocks, diag_blocks,
        )


def _unrolled_body(kernel, x_pad, n, noise, eps, block, method, l_full,
                   fused=False, solve_blocks=1, diag_blocks=1):
    cap, d = x_pad.shape
    # ``block`` may be a single width or a per-panel width schedule
    # (tuple summing to cap) — uneven panels let the solve-heavy early
    # panels run narrow and the downdate-heavy late panels run wide.
    widths = (block,) * (cap // block) if isinstance(block, int) else block
    dtype = x_pad.dtype  # COMPUTE dtype; l_full.dtype may be bf16 storage
    if fused:
        from .pallas.panel_fused import fused_panel_strip

    j0 = 0
    for j, block in enumerate(widths):  # trace-time unroll: static shapes
        rest = cap - j0
        xj = lax.slice(x_pad, (j0, 0), (j0 + block, d))
        x_tail = lax.slice(x_pad, (j0, 0), (cap, d))
        if fused:
            # one Pallas call: kernel-map strip + fat-K downdate, each
            # output tile written exactly once (ops/pallas/panel_fused.py)
            strip = fused_panel_strip(
                kernel, x_tail, xj, l_full, n, noise, j0, block
            )
        else:
            strip = _train_cov_panel_tail(
                kernel, x_tail, xj, j0, n, noise, block, method
            )

        if j > 0 and not fused:
            # one fat-K GEMM per panel: S -= L[j0:, :j0] @ L[j0:j0+B, :j0]^T
            # (static offsets — the factored prefix streams through the MXU
            # once, vs j chunked GEMMs each re-reading and rewriting the
            # (rest, B) accumulator strip in HBM)
            l_tail = lax.slice(l_full, (j0, 0), (cap, j0))
            l_rows = lax.slice(l_full, (j0, 0), (j0 + block, j0))
            # precision=None: inherits the enclosing _precision_scope
            # (or the ambient jax.default_matmul_precision)
            strip = strip - jax.lax.dot_general(
                l_tail, l_rows,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=dtype,
            )

        diag_blk = lax.slice(strip, (0, 0), (block, block))
        if eps is None:
            ld = blocked_diag_cholesky(diag_blk, diag_blocks)
        else:
            ld = cholesky_with_substitute(diag_blk, eps, block=128)
        if rest > block:
            below = rsolve_lower_t_blocked(
                ld, lax.slice(strip, (block, 0), (rest, block)),
                solve_blocks,
            )
            panel_out = jnp.concatenate([ld, below], axis=0)
        else:
            panel_out = ld
        # bf16-STORAGE mode: panels are computed in f32 (builds, diagonal
        # factorizations, solves, GEMM accumulation) and rounded only when
        # written back — the MXU already rounds f32 GEMM operands to bf16
        # per pass (BASELINE.md "Matmul precision on TPU"), so the stored
        # factor halves HBM at near-zero extra rounding, and the next
        # panel's EXACT residual downdate absorbs the storage rounding of
        # earlier panels (left-looking self-correction).
        l_full = lax.dynamic_update_slice(
            l_full, panel_out.astype(l_full.dtype), (j0, j0)
        )
        j0 += block

    # finiteness probe over the whole factor, no temp (see ops/cholesky.
    # factor); accumulate bf16 storage in f32
    acc = jnp.float32 if l_full.dtype == jnp.bfloat16 else l_full.dtype
    ok = jnp.isfinite(jnp.sum(l_full, dtype=acc))
    return l_full, ok


# Above this many panels the unrolled program is large enough to stress the
# remote TPU compiler; fall back to the constant-size fori_loop program.
MAX_UNROLL_PANELS = 64


#: Factor STORAGE dtypes (compute stays in the input dtype): ``None``
#: stores L in the compute dtype; ``"bf16"`` stores it in bfloat16 —
#: halves factor HBM (n=80k fits one 16 GB chip) at near-zero extra
#: rounding in the default MXU mode, which already reads f32 GEMM
#: operands at bfloat16 precision.
STORAGE_DTYPES = {None: None, "bf16": jnp.bfloat16}


def streamed_cholesky_factor(
    kernel,
    x_pad: Array,
    n,
    noise,
    eps: Optional[float] = None,
    block: Optional[int] = None,
    method: str = "gram",
    unroll: Optional[bool] = None,
    l0: Optional[Array] = None,
    fused: Optional[bool] = None,
    precision: Optional[str] = None,
    storage: Optional[str] = None,
    solve_blocks: Optional[int] = None,
    diag_blocks: Optional[int] = None,
) -> tuple[Array, Array]:
    """Covariance build + Cholesky fused, K never materialized.

    Drop-in for ``train_covariance_padded`` + ``factor``; requires
    ``capacity % block == 0`` (callers pick block accordingly; any block
    that divides capacity works, smaller than 128 wastes the MXU).
    ``block=None`` (default) applies the TUNED policy
    (``ops/partition.auto_panel_block``): block ~ cap/10 — the measured
    headline optimum — with ``diag_blocks`` raised automatically when the
    panel exceeds the compile-safe monolithic-diagonal width. ``block``
    may instead be a per-panel width SCHEDULE (tuple/list summing to
    capacity, unrolled path only): uneven panels let the solve-heavy
    early panels run narrow and the late panels run wide — a headline-op
    tuning knob (see BASELINE.md).

    ``unroll=None`` (default) picks the trace-time-unrolled FLOP-optimal
    program when the panel count permits (:data:`MAX_UNROLL_PANELS`),
    else the constant-size ``fori_loop`` program; pass True/False to
    force.

    ``l0``: optional (cap, cap) buffer to DONATE as the factor's
    workspace on host-level unrolled calls (e.g. the previous factor
    during a hyperparameter-fit rebuild — every lower-triangle entry is
    overwritten and the strict upper triangle must already be zero, which
    holds for any factor this function produced). The caller must not use
    the donated array afterwards. Avoids holding old + new L at once
    (2x10 GB at n=50k f32).

    ``fused``: use the Pallas build+downdate megakernel for each panel
    strip (``ops/pallas/panel_fused.py``) — one HBM write per strip
    element, kernel map fused into the downdate GEMM pipeline. Only
    valid on the unrolled path (f32, ``block`` a multiple of 512
    dividing capacity). Default OFF: measured 1.136 s vs 0.769 s for
    the XLA fat-K path at n=50k on a v5e chip — XLA's GEMM pipelining
    beats the hand tiling here; the kernel is kept as an opt-in
    experiment (see BASELINE.md "Pallas megakernel A/B").

    ``storage``: factor STORAGE dtype (:data:`STORAGE_DTYPES`). ``"bf16"``
    stores L in bfloat16 while every panel is still COMPUTED in the input
    dtype (f32 strip builds, f32 diagonal factorization, f32-accumulated
    GEMMs) — the only extra rounding vs the default mode is the write-back
    of each panel, because the MXU already rounds f32 GEMM operands to
    bfloat16 per pass. Halves factor memory: exact GP at n~80k on one
    16 GB chip (f32 storage caps at n~60k). Requires the unrolled path,
    f32 inputs, ``fused=False``, and ``precision`` None/"bf16" (the
    multi-pass modes exist to RECOVER f32 operand precision, which bf16
    storage has already discarded). Accuracy ladder in BASELINE.md.

    **Validity envelope** (BASELINE.md "bf16 factor storage"): the
    prefix's storage rounding accumulates in the downdates and the
    trailing Schur complement goes indefinite when the noise floor is too
    small — measured boundary ``noise^2 >~ n * 2^-15 * ampl^2``
    (SquaredExp, unit lengthscale; n=4096 needs noise >~ 0.4). Failures
    are DETECTED (``ok=False`` -> ``CholeskyError``); remedies: more
    noise, ``cholesky_epsilon``, or f32 storage (optionally with a
    multi-pass ``precision`` mode, which f32 storage keeps available).

    ``solve_blocks``: sub-blocking factor for each panel's trailing
    solve on the unrolled f32 path (``rsolve_lower_t_blocked``) — >1
    replaces the dense inverse-GEMM (m*B^2 MACs) with blocked forward
    substitution (m*B^2*(k+1)/(2k) MACs) at the cost of a k-step
    sequential chain per panel. ``None`` (default) applies the TUNED
    policy (``ops/partition.auto_solve_blocks``: ~1024-wide steps, the
    measured optimum — 0.567 s vs 0.675 s at the n=50k headline);
    1 keeps the single-GEMM solve; must divide ``block``.
    ``diag_blocks`` follows the same policy for the panel DIAGONAL
    factorizations (``auto_diag_blocks``, which also enforces the
    compile-safe monolithic-diagonal ceiling). Per-panel width
    SCHEDULES default both to 1.

    ``precision``: MXU matmul precision for the WHOLE factorization
    (downdate GEMMs, panel solves, diagonal-block factorizations) —
    ``None`` (default, inherit the ambient
    ``jax.default_matmul_precision``), ``"bf16"``, ``"f32x3"``, or
    ``"f32"`` (:data:`PRECISION_MODES`). On TPU the ambient default IS
    single-pass bf16 — f32 operands are rounded to bfloat16 per MXU
    pass with f32 accumulation — so ``None`` and ``"bf16"`` coincide
    unless the caller set the ambient config; users needing true-f32
    GEMMs must ask for ``"f32"`` explicitly. Measured ladder (time at
    n=50k/B=5000 on a v5e, accuracy vs a float64 host factorization at
    n=8192) in BASELINE.md "Matmul precision on TPU".
    """
    from .partition import (
        auto_diag_blocks, auto_panel_block, auto_solve_blocks, pick_block,
    )
    from .pallas.panel_fused import fused_supported

    cap = x_pad.shape[0]
    if block is None:
        block = auto_panel_block(cap)
    if isinstance(block, (tuple, list)):
        # per-panel width SCHEDULE: only the trace-time-unrolled program
        # supports uneven panels (the fori body needs one static width)
        widths = tuple(int(w) for w in block)
        if any(w <= 0 for w in widths) or sum(widths) != cap:
            raise ValueError(
                f"panel width schedule must be positive and sum to the "
                f"capacity {cap}, got {widths}"
            )
        if unroll is False:
            raise ValueError("a panel width schedule requires unroll=True")
        unroll = True
        block = widths
        supported = False
    else:
        block = pick_block(cap, block)
        if unroll is None:
            unroll = cap // block <= MAX_UNROLL_PANELS
        supported = unroll and fused_supported(cap, block, x_pad.dtype)
    # tuned sub-blocking defaults (None = policy); schedules and the
    # fori program run un-sub-blocked
    single_width = isinstance(block, int)
    if solve_blocks is None:
        solve_blocks = (
            auto_solve_blocks(block) if unroll and single_width else 1
        )
    if diag_blocks is None:
        diag_blocks = (
            auto_diag_blocks(block) if unroll and single_width else 1
        )
    if fused is None:
        fused = False
    elif fused and not supported:
        raise ValueError(
            "fused=True requires the unrolled path, f32, and a block "
            f"multiple of 512 dividing capacity (got cap={cap}, "
            f"block={block}, dtype={x_pad.dtype})"
        )
    if precision is not None and precision not in PRECISION_MODES:
        raise ValueError(
            f"precision must be None or one of "
            f"{sorted(PRECISION_MODES)}, got {precision!r}"
        )
    if storage not in STORAGE_DTYPES:
        raise ValueError(
            f"storage must be None or one of "
            f"{sorted(k for k in STORAGE_DTYPES if k)}, got {storage!r}"
        )
    if storage == "bf16":
        if not unroll or fused:
            raise ValueError(
                "storage='bf16' requires the unrolled path (fused=False)"
            )
        if x_pad.dtype != jnp.float32:
            raise ValueError(
                f"storage='bf16' requires float32 inputs, got {x_pad.dtype}"
            )
        if precision not in (None, "bf16"):
            raise ValueError(
                f"storage='bf16' is incompatible with precision="
                f"{precision!r}: multi-pass modes recover f32 operand "
                "precision that bf16 storage has already discarded"
            )
    if solve_blocks > 1:
        for w in block if isinstance(block, tuple) else (block,):
            if w % solve_blocks != 0:
                raise ValueError(
                    f"solve_blocks={solve_blocks} must divide every panel "
                    f"width (got {w})"
                )
    if diag_blocks > 1:
        if not unroll:
            raise ValueError("diag_blocks>1 requires the unrolled path")
        for w in block if isinstance(block, tuple) else (block,):
            if w % diag_blocks != 0:
                raise ValueError(
                    f"diag_blocks={diag_blocks} must divide every panel "
                    f"width (got {w})"
                )
    store_dtype = STORAGE_DTYPES[storage] or x_pad.dtype
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    args = (
        tuple(leaves), treedef, x_pad, jnp.asarray(n, jnp.int32),
        jnp.asarray(noise, x_pad.dtype), eps, block, method,
    )
    if not unroll:
        return _streamed_cholesky_impl(*args, precision=precision)
    if any(
        isinstance(a, jax.core.Tracer) for a in (x_pad, noise, *leaves)
    ) or isinstance(n, jax.core.Tracer):
        # inside an outer jit/vmap (ANY traced operand — e.g. an MCMC
        # density traces noise/kernel params while the inputs stay closure
        # constants) the call inlines. A traced ``l0`` threads through as
        # the chain's workspace so an outer jit that DONATES it at its own
        # top level (the fused state constructor) keeps the single-factor
        # HBM discipline; without one the result is a temp whose aliasing
        # is up to XLA (fine for small/medium n, OOMs at n=50k f32).
        return _streamed_unrolled_impl(
            *args, fused=fused, precision=precision, storage=storage,
            solve_blocks=solve_blocks, diag_blocks=diag_blocks,
            l0=l0 if isinstance(l0, jax.core.Tracer) else None,
        )
    if l0 is None or isinstance(l0, jax.core.Tracer):
        l0 = jnp.zeros((cap, cap), dtype=store_dtype)
    elif l0.dtype != store_dtype:
        raise ValueError(
            f"donated buffer dtype {l0.dtype} does not match the factor "
            f"storage dtype {store_dtype}"
        )
    return _streamed_unrolled_donate(
        *args, l0, fused=fused, precision=precision,
        solve_blocks=solve_blocks, diag_blocks=diag_blocks,
    )
