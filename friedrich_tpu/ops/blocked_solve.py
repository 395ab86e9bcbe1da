"""Loop-blocked triangular solves (compiler-friendly at large n).

XLA's monolithic ``solve_triangular`` with a large triangular factor AND a
wide right-hand side produces a huge unrolled program that crashes the
remote TPU compiler (same failure mode as the monolithic Cholesky at
n=50k). Two program shapes, both sweeping fixed-size row panels:

  forward :  y_j = Ld_j^-1 (c_j - L[j, :j] y[:j])
  backward:  x_j = Ld_j^-T (c_j - L[j+1:, j]^T x[j+1:])

- ``fori_loop`` version: constant program size; the off-panel contraction
  uses masked full-width GEMMs (2x theoretical FLOPs for static shapes).
- Trace-time-UNROLLED version (default when the panel count permits,
  mirroring ``ops/streamed._streamed_unrolled_impl``): every off-panel
  contraction has a STATIC triangular width, hitting the theoretical
  n^2 m MAC count, and the f32 path replaces each diagonal TRSM with one
  small inverse + GEMM (TPU TRSM is ~6x slower than a same-shape GEMM —
  BASELINE.md round-2 diagnostics). f64 keeps back-substitution for
  bit-stable parity with the reference oracles.

Used by the hybrid factorizer and the large-n predict paths.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .partition import pick_block as _pick_block

Array = jnp.ndarray

#: Above this many panels the unrolled program is large enough to stress
#: the remote TPU compiler; fall back to the fori_loop program.
MAX_UNROLL_PANELS = 64


@functools.partial(jax.jit, static_argnames=("block", "transposed"))
def _blocked_solve(l_mat: Array, c: Array, block: int, transposed: bool) -> Array:
    n = l_mat.shape[0]
    m = c.shape[1]
    num = n // block
    cols = jnp.arange(n)[None, :]
    dtype = c.dtype

    if not transposed:

        def panel(j, y):
            j0 = j * block
            z = jnp.zeros_like(j0)
            l_rows = lax.dynamic_slice(l_mat, (j0, z), (block, n))
            l_left = jnp.where(cols < j0, l_rows, 0.0)
            rhs = lax.dynamic_slice(c, (j0, z), (block, m)) - jnp.dot(
                l_left, y, preferred_element_type=dtype
            )
            ld = lax.dynamic_slice(l_rows, (z, j0), (block, block))
            yj = solve_triangular(ld.astype(dtype), rhs, lower=True)
            return lax.dynamic_update_slice(y, yj, (j0, z))

        return lax.fori_loop(0, num, panel, jnp.zeros((n, m), dtype))

    def panel(t, y):
        j = num - 1 - t
        j0 = j * block
        z = jnp.zeros_like(j0)
        # L[:, j0:j0+b]^T restricted to rows below the panel
        l_colpanel = lax.dynamic_slice(l_mat, (z, j0), (n, block))
        rows = jnp.arange(n)[:, None]
        l_below = jnp.where(rows >= j0 + block, l_colpanel, 0.0)
        rhs = lax.dynamic_slice(c, (j0, z), (block, m)) - jnp.dot(
            l_below.T, y, preferred_element_type=dtype
        )
        ld = lax.dynamic_slice(l_mat, (j0, j0), (block, block))
        xj = solve_triangular(ld.astype(dtype), rhs, lower=True, trans=1)
        return lax.dynamic_update_slice(y, xj, (j0, z))

    return lax.fori_loop(0, num, panel, jnp.zeros((n, m), dtype))


@functools.partial(jax.jit, static_argnames=("block",))
def panel_inverses(l_mat: Array, block: int = 2048) -> Array:
    """Stacked inverses of the factor's diagonal panels, ``(num, b, b)``.

    The unrolled f32 sweeps replace each diagonal TRSM with ``inv @ rhs``
    GEMMs; computing the inverses is itself a TRSM per panel
    (O(n b^2 / 2) total) that a repeated-predict caller pays on EVERY
    batch. Precomputing them once (e.g. into the facade's
    ``PredictWeights`` cache) makes the per-batch sweep pure GEMM —
    measured: the recomputed inverses were why solve throughput *fell*
    with larger panels (b^2 per-panel TRSM growth, BASELINE.md round-2
    predict table). Memory: ``n*b`` floats (400 MB at n=50k, b=2000).
    """
    n = l_mat.shape[0]
    b = _pick_block(n, block)
    from .cholesky import lower_inverse

    starts = jnp.arange(n // b) * b
    blocks = jax.vmap(
        lambda j0: lax.dynamic_slice(l_mat, (j0, j0), (b, b))
    )(starts)
    return jax.vmap(lower_inverse)(blocks)


@functools.partial(jax.jit, static_argnames=("block", "transposed"))
def _blocked_solve_unrolled(
    l_mat: Array, c: Array, block: int, transposed: bool,
    diag_inv: Optional[Array] = None,
) -> Array:
    """Trace-time-unrolled panel sweep: static triangular widths (the
    theoretical MAC count) and, on f32, inverse-GEMM diagonal solves
    (precomputed via :func:`panel_inverses` when ``diag_inv`` is given)."""
    from .cholesky import lower_inverse

    n = l_mat.shape[0]
    m = c.shape[1]
    num = n // block
    dtype = c.dtype
    f32 = dtype == jnp.float32

    def diag_solve(ld, rhs, trans, j):
        if f32:
            inv = lower_inverse(ld) if diag_inv is None else diag_inv[j]
            a = inv.T if trans else inv
            return jnp.dot(a, rhs, preferred_element_type=dtype)
        return solve_triangular(ld, rhs, lower=True, trans=1 if trans else 0)

    y = jnp.zeros((n, m), dtype)
    if not transposed:
        for j in range(num):  # trace-time unroll: all offsets static
            j0 = j * block
            rhs = lax.slice(c, (j0, 0), (j0 + block, m))
            if j > 0:
                l_left = lax.slice(l_mat, (j0, 0), (j0 + block, j0))
                y_done = lax.slice(y, (0, 0), (j0, m))
                rhs = rhs - jnp.dot(
                    l_left, y_done, preferred_element_type=dtype
                )
            ld = lax.slice(l_mat, (j0, j0), (j0 + block, j0 + block))
            yj = diag_solve(ld, rhs, trans=False, j=j)
            y = lax.dynamic_update_slice(y, yj, (j0, 0))
        return y

    for t in range(num):
        j = num - 1 - t
        j0 = j * block
        rhs = lax.slice(c, (j0, 0), (j0 + block, m))
        if j < num - 1:
            b0 = j0 + block
            l_below = lax.slice(l_mat, (b0, j0), (n, j0 + block))
            x_done = lax.slice(y, (b0, 0), (n, m))
            rhs = rhs - jnp.dot(
                l_below.T, x_done, preferred_element_type=dtype
            )
        ld = lax.slice(l_mat, (j0, j0), (j0 + block, j0 + block))
        xj = diag_solve(ld, rhs, trans=True, j=j)
        y = lax.dynamic_update_slice(y, xj, (j0, 0))
    return y


def _solve(l_mat: Array, c: Array, block: int, transposed: bool,
           unroll: Optional[bool], diag_inv: Optional[Array]) -> Array:
    c2 = c if c.ndim == 2 else c[:, None]
    if diag_inv is not None:
        # the cache fixes the panel size; ignore the block argument
        b = diag_inv.shape[1]
        if b * diag_inv.shape[0] != l_mat.shape[0]:
            raise ValueError(
                f"diag_inv {diag_inv.shape} does not tile factor of size "
                f"{l_mat.shape[0]}"
            )
    else:
        b = _pick_block(l_mat.shape[0], block)
    if unroll is None:
        unroll = l_mat.shape[0] // b <= MAX_UNROLL_PANELS
    if unroll:
        y = _blocked_solve_unrolled(l_mat, c2, b, transposed, diag_inv)
    else:
        y = _blocked_solve(l_mat, c2, b, transposed)
    return y if c.ndim == 2 else y[:, 0]


def blocked_solve_lower(l_mat: Array, c: Array, block: int = 2048,
                        unroll: Optional[bool] = None,
                        diag_inv: Optional[Array] = None) -> Array:
    """Solve ``L y = c`` (lower-triangular L) with panel sweeps.

    ``diag_inv``: precomputed :func:`panel_inverses` — removes the
    per-call diagonal TRSMs (f32 unrolled path only)."""
    return _solve(l_mat, c, block, False, unroll, diag_inv)


def blocked_solve_lower_t(l_mat: Array, c: Array, block: int = 2048,
                          unroll: Optional[bool] = None,
                          diag_inv: Optional[Array] = None) -> Array:
    """Solve ``L^T x = c`` with panel sweeps."""
    return _solve(l_mat, c, block, True, unroll, diag_inv)


def blocked_cho_solve(l_mat: Array, c: Array, block: int = 2048,
                      unroll: Optional[bool] = None,
                      diag_inv: Optional[Array] = None) -> Array:
    """``(L L^T)^-1 c`` via the two sweeps."""
    return blocked_solve_lower_t(
        l_mat, blocked_solve_lower(l_mat, c, block, unroll, diag_inv),
        block, unroll, diag_inv,
    )
