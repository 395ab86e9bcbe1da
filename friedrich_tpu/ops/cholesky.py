"""Cholesky factorizations: fast XLA path, epsilon-substitute path, and the
blocked rank-k append for incremental training.

Replaces the nalgebra calls in the reference:

- ``covmatrix.cholesky()`` (``algebra/mod.rs:90``) -> :func:`cholesky`
  (XLA's native factorization + a non-finite failure flag instead of a
  panic);
- ``Cholesky::new_with_substitute`` (``algebra/mod.rs:83``) ->
  :func:`cholesky_with_substitute`, a blocked right-looking factorization
  whose inner unblocked step substitutes ``eps`` for any pivot that is not
  strictly positive — per-pivot substitution semantics matching nalgebra
  ("used in place of the diagonal term if and only if the decomposition
  would otherwise fail", ``gaussian_process/mod.rs:67-73``). The bulk of
  the work is MXU GEMM (panel solve + trailing SYRK update); only the
  128-wide diagonal blocks run the scalar pivot loop.
- ``Cholesky::insert_column`` one column at a time (``algebra/mod.rs:124``,
  O(n^2) each) -> :func:`cholesky_append_padded`, a single blocked rank-k
  append: ``L21 = L^-1 K12`` (one triangular solve) and
  ``L22 = chol(K22 - L21^T L21)`` — same O(n^2 k) total cost, one MXU pass.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .covariance import (
    cross_covariance, cross_covariance_train_padded, kernel_diag,
)

Array = jnp.ndarray

DEFAULT_BLOCK = 128


def lower_inverse(ld: Array) -> Array:
    """Explicit inverse of a small lower-triangular block (one TRSM against
    the identity). bf16 STORAGE blocks (``ops/streamed`` ``storage="bf16"``)
    are inverted in float32 — the inverse feeds f32-accumulated sweep GEMMs.
    """
    if ld.dtype == jnp.bfloat16:
        ld = ld.astype(jnp.float32)
    b = ld.shape[0]
    return solve_triangular(ld, jnp.eye(b, dtype=ld.dtype), lower=True)


def rsolve_lower_t(ld: Array, s: Array) -> Array:
    """``s @ Ld^-T`` for a (m, b) strip against a (b, b) lower factor.

    TPU TRSM runs ~6x slower than a same-shape GEMM (measured v5e, f32:
    13.9 vs 166 TFLOP/s at b=2500 — BASELINE.md round-2 diagnostics), so
    the float32 PERFORMANCE path inverts the diagonal block once (one
    small TRSM) and applies it with a GEMM; the float64 PARITY path keeps
    back-substitution (bit-stable vs the dense reference oracles). The
    diagonal blocks are noise-regularized covariance factors, so the
    inverse-multiply's conditioning penalty is benign at f32.
    """
    if s.dtype == jnp.float32:
        return jnp.dot(s, lower_inverse(ld).T, preferred_element_type=s.dtype)
    return solve_triangular(ld, s.T, lower=True).T


def rsolve_lower_t_blocked(ld: Array, s: Array, sub: int) -> Array:
    """``s @ Ld^-T`` via ``sub`` column sub-blocks of the (b, b) factor.

    The plain inverse-GEMM (:func:`rsolve_lower_t`) applies a DENSE
    (b, b) inverse — m*b^2 MACs, half of them against structural zeros.
    Blocked forward substitution over ``sub`` column blocks costs
    m*b^2*(sub+1)/(2*sub) MACs (down to half at large ``sub``) at the
    price of a ``sub``-step sequential chain; the streamed factorizer
    threads this through as a headline-op tuning knob
    (``solve_blocks``). Static shapes throughout — callers pass
    trace-time ``sub`` dividing ``b``.
    """
    if sub <= 1 or ld.shape[0] % sub != 0 or s.dtype != jnp.float32:
        return rsolve_lower_t(ld, s)
    b = ld.shape[0]
    m = s.shape[0]
    w = b // sub
    out = jnp.zeros_like(s)
    for j in range(sub):
        c = lax.slice(s, (0, j * w), (m, (j + 1) * w))
        if j > 0:
            prefix = lax.slice(out, (0, 0), (m, j * w))
            l_rows = lax.slice(ld, (j * w, 0), ((j + 1) * w, j * w))
            c = c - jax.lax.dot_general(
                prefix, l_rows,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=s.dtype,
            )
        ljj = lax.slice(ld, (j * w, j * w), ((j + 1) * w, (j + 1) * w))
        blk = jnp.dot(c, lower_inverse(ljj).T, preferred_element_type=s.dtype)
        out = lax.dynamic_update_slice(out, blk, (0, j * w))
    return out


def solve_lower_blockdiag(ld: Array, r: Array) -> Array:
    """``Ld^-1 r`` for a (b, m) block against a (b, b) lower factor — same
    dtype-gated inverse-GEMM trick as :func:`rsolve_lower_t`."""
    if r.dtype == jnp.float32:
        return jnp.dot(lower_inverse(ld), r, preferred_element_type=r.dtype)
    return solve_triangular(ld, r, lower=True)


def blocked_diag_cholesky(a: Array, sub: int) -> Array:
    """Cholesky of a (b, b) panel-diagonal block via ``sub`` trace-time-
    unrolled column blocks — left-looking, GEMM-dominated.

    XLA's monolithic ``jnp.linalg.cholesky`` at headline panel widths
    (b=5000) schedules its own internal loop with narrow (128-wide)
    TRSMs; splitting the block here turns ~(1 - 1/sub²) of its FLOPs
    into fat-K downdate GEMMs + inverse-GEMM panel solves (the same
    structure as the outer unrolled factorizer,
    ``ops/streamed._unrolled_body``), leaving only ``sub`` small
    (b/sub)² native factorizations. float32 only — the f64 parity paths
    keep the native factorization.
    """
    if sub <= 1 or a.shape[0] % sub != 0 or a.dtype != jnp.float32:
        return jnp.linalg.cholesky(a)
    b = a.shape[0]
    w = b // sub
    l = jnp.zeros_like(a)
    j0 = 0
    for j in range(sub):
        rest = b - j0
        s = lax.slice(a, (j0, j0), (b, j0 + w))
        if j > 0:
            l_tail = lax.slice(l, (j0, 0), (b, j0))
            l_rows = lax.slice(l, (j0, 0), (j0 + w, j0))
            s = s - lax.dot_general(
                l_tail, l_rows,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=a.dtype,
            )
        ld = jnp.linalg.cholesky(lax.slice(s, (0, 0), (w, w)))
        if rest > w:
            below = rsolve_lower_t(ld, lax.slice(s, (w, 0), (rest, w)))
            panel = jnp.concatenate([ld, below], axis=0)
        else:
            panel = ld
        l = lax.dynamic_update_slice(l, panel, (j0, j0))
        j0 += w
    return l


def cholesky(k_mat: Array) -> tuple[Array, Array]:
    """Fast path: XLA-native Cholesky + an ``ok`` flag (finite diagonal).

    The caller raises :class:`~friedrich_tpu.utils.errors.CholeskyError` on
    a False flag — structured error instead of the reference's panic
    (``algebra/mod.rs:90``).
    """
    l_mat = jnp.linalg.cholesky(k_mat)
    ok = jnp.isfinite(jnp.sum(l_mat))
    return l_mat, ok


def _unblocked_cholesky_substitute(a: Array, eps) -> Array:
    """Right-looking unblocked Cholesky of a small block with per-pivot
    epsilon substitution (nalgebra ``new_with_substitute`` semantics)."""
    b = a.shape[0]
    idx = jnp.arange(b)

    def col_step(j, m):
        d = m[j, j]
        d_eff = jnp.where(d > 0, d, eps)
        ljj = jnp.sqrt(d_eff)
        below = jnp.where(idx > j, m[:, j] / ljj, 0.0)
        newcol = below + jnp.where(idx == j, ljj, 0.0)
        m = m.at[:, j].set(newcol)
        m = m - jnp.outer(below, below)
        return m

    m = lax.fori_loop(0, b, col_step, a)
    return jnp.tril(m)


@partial(jax.jit, static_argnames=("block",))
def cholesky_with_substitute(k_mat: Array, eps, block: int = DEFAULT_BLOCK) -> Array:
    """Blocked right-looking Cholesky with epsilon pivot substitution.

    Each panel step: (1) factor the diagonal block with the substituting
    unblocked routine, (2) TRSM the full column strip against L11^T (MXU),
    (3) rank-``block`` SYRK trailing update (MXU). Pivot-level substitution
    is preserved because failures only surface in step (1).
    """
    n = k_mat.shape[0]
    nb = -(-n // block) * block  # round up to a multiple of the block size
    if nb != n:
        # identity padding keeps the factorization exact in the live block
        pad = nb - n
        k_mat = jnp.block(
            [
                [k_mat, jnp.zeros((n, pad), k_mat.dtype)],
                [jnp.zeros((pad, n), k_mat.dtype), jnp.eye(pad, dtype=k_mat.dtype)],
            ]
        )
    num_panels = nb // block
    rows = jnp.arange(nb)[:, None]

    def panel_step(t, m):
        j0 = t * block
        strip = lax.dynamic_slice(m, (0, j0), (nb, block))
        diag = lax.dynamic_slice(strip, (j0, 0), (block, block))
        l11 = _unblocked_cholesky_substitute(diag, eps)
        # full-strip TRSM: S = strip @ L11^-T  (rows above j0 discarded below)
        s = rsolve_lower_t(l11, strip)
        strip_new = lax.dynamic_update_slice(s, l11, (j0, 0))
        strip_new = jnp.where(rows < j0, 0.0, strip_new)
        below = jnp.where(rows < j0 + block, 0.0, strip_new)
        m = lax.dynamic_update_slice(m, strip_new, (0, j0))
        m = m - jnp.dot(below, below.T, preferred_element_type=m.dtype)
        return m

    l_mat = lax.fori_loop(0, num_panels, panel_step, k_mat)
    l_mat = jnp.tril(l_mat)
    return l_mat[:n, :n] if nb != n else l_mat


def factor(k_mat: Array, eps=None, block: int = DEFAULT_BLOCK) -> tuple[Array, Array]:
    """Dispatch: plain Cholesky when ``eps`` is None, substituting blocked
    factorization otherwise (mirrors the two arms of
    ``make_cholesky_cov_matrix``, ``algebra/mod.rs:81-91``).

    Returns ``(L, ok)``; with substitution ``ok`` is True whenever eps > 0.
    """
    if eps is None:
        return cholesky(k_mat)
    l_mat = cholesky_with_substitute(k_mat, eps, block=block)
    # check the WHOLE factor: a heavily indefinite matrix can overflow the
    # substitute cascade (each eps pivot divides its column by sqrt(eps),
    # the trailing update squares it) into NaN in OFF-diagonal entries
    # while the diagonal stays finite — nalgebra returns the same garbage
    # silently; here it surfaces as ok=False -> CholeskyError. The check is
    # a fused SUM reduction (NaN/inf-propagating), NOT jnp.all(isfinite(L)),
    # whose (cap, cap) bool temp costs 2.5 GB at n=50k.
    return l_mat, jnp.isfinite(jnp.sum(l_mat))


def cholesky_append_padded(
    l_pad: Array,
    kernel,
    x_pad: Array,
    n_old,
    k_new: int,
    noise,
    eps=None,
    method: str = "gram",
) -> Array:
    """Blocked rank-k append of ``k_new`` rows to a padded Cholesky factor.

    Replaces the reference's per-row ``Cholesky::insert_column`` loop
    (``algebra/mod.rs:97-126``) with one blocked update:

        C   = K(X_old, X_new)            (cap x k, dead rows zeroed)
        S   = L^-1 C                     (one triangular solve, MXU)
        L22 = chol(K_new + noise^2 I - S^T S)
        L  <- rows [n_old, n_old+k) := [S^T with L22 at column n_old]

    ``n_old`` may be traced; ``k_new`` is static (shape). The caller
    guarantees capacity >= n_old + k_new (growth handled host-side with the
    reference's 1.5x policy).

    Deviation (improvement): when ``eps`` is set, the new diagonal block
    uses the substituting factorization; the reference silently ignores
    ``cholesky_epsilon`` in ``add_rows_cholesky_cov_matrix``.
    """
    if l_pad.dtype == jnp.bfloat16:
        # rank-updating a bf16-STORED factor solves against ROUNDED data:
        # the ~2^-8 storage error amplifies through S^T S and drives the
        # appended Schur complement indefinite (measured at n=500,
        # noise=0.1). Both facades route bf16 states to a rebuild
        # (models/gp.add_samples_rebuild); direct core callers get a clear
        # error instead of a silent 2x-L cast + numerical failure.
        raise ValueError(
            "bf16-stored factors cannot be rank-updated; use "
            "models.gp.add_samples_rebuild (the facades do this "
            "automatically)"
        )
    cap, d = x_pad.shape
    x_new = lax.dynamic_slice(x_pad, (n_old, jnp.zeros_like(n_old)), (k_new, d))
    c = cross_covariance_train_padded(kernel, x_pad, n_old, x_new, method=method)
    from ..models.gp import auto_large_threshold

    if cap > auto_large_threshold():
        # the monolithic (cap, cap) TRSM is the op the remote TPU
        # compiler rejects at frontier capacities (HTTP 500 at cap~50k —
        # BASELINE.md round 4 "Incremental add_samples"); the blocked
        # panel sweep is the same math with a compiler-friendly program
        # (the identical sweep already compiles and runs at cap=50k in
        # every predict path)
        from .blocked_solve import blocked_solve_lower

        s = blocked_solve_lower(l_pad, c)  # (cap, k) — zero in dead rows
    else:
        s = solve_triangular(l_pad, c, lower=True)  # (cap, k)
    k22 = cross_covariance(kernel, x_new, x_new, method=method)
    # analytic diagonal: see ops/covariance.train_covariance_padded
    kd = kernel_diag(kernel, x_new) + noise * noise
    idx = jnp.arange(k_new)
    k22 = jnp.where(idx[:, None] == idx[None, :], kd[:, None], k22)
    m22 = k22 - jnp.dot(s.T, s, preferred_element_type=s.dtype)
    if eps is None:
        l22 = jnp.linalg.cholesky(m22)
    else:
        l22 = _unblocked_cholesky_substitute(m22, eps)
    new_rows = s.T  # (k, cap); columns >= n_old are zero
    new_rows = lax.dynamic_update_slice(new_rows, l22, (jnp.zeros_like(n_old), n_old))
    return lax.dynamic_update_slice(l_pad, new_rows, (n_old, jnp.zeros_like(n_old)))
