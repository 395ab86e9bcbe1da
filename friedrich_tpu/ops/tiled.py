"""In-place tiled right-looking Cholesky (MAC-optimal large-n path).

Complement to ``ops/streamed.py``: the streamed left-looking factorization
never materializes K but pays ~3x the theoretical FLOPs (full-height panel
downdates). This version materializes K ONCE (one buffer, transformed into
L in place by the loop carry — no separate L allocation) and factors it
with tile-granular loops at the optimal n^3/3 FLOP count:

    for panel j:   Ld = chol(K[j,j])
    for i > j:     L[i,j] = K[i,j] Ld^-T           (TRSM tile)
    for i > j >= k: K[i,k] -= L[i,j] L[k,j]^T       (SYRK tile, lower only)

All loops are ``fori_loop`` with traced bounds over fixed (B, B) tiles, so
the compiled program is tiny regardless of n, every tile op is an MXU GEMM
at arithmetic intensity ~B/6 flops/byte (compute-bound for B >= 1024), and
XLA keeps the carry in place.

Pick: streamed when HBM cannot hold K at all or the build should fuse with
the factorization; tiled when one (n, n) buffer fits and FLOPs dominate.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .cholesky import cholesky_with_substitute, lower_inverse

Array = jnp.ndarray

DEFAULT_TILE = 2048


def region_cholesky_inplace(m: Array, base: int, nb: int, block: int,
                            eps: Optional[float], mirror_diag: bool) -> Array:
    """Right-looking tiled Cholesky of the ``nb*block``-sized region of
    ``m`` starting at static offset (base, base), in place.

    The shared tile loop behind both the whole-matrix ``tiled`` backend
    (base=0) and the hybrid factorizer's S22 region (base=cap/2).
    ``mirror_diag`` reconstructs symmetric diagonal tiles from their lower
    half (for callers that store region strips lower-only)."""
    dtype = m.dtype

    def panel(j, k):
        j0 = base + j * block
        diag = lax.dynamic_slice(k, (j0, j0), (block, block))
        if mirror_diag:
            # XLA's cholesky symmetrizes input; zero upper would halve the
            # off-diagonal entries
            diag = jnp.tril(diag) + jnp.tril(diag, -1).T
        if eps is None:
            ld = jnp.linalg.cholesky(diag)
        else:
            ld = cholesky_with_substitute(diag, eps, block=128)
        k = lax.dynamic_update_slice(k, ld, (j0, j0))

        # f32 perf path: invert the diagonal block ONCE and turn every
        # TRSM tile in this panel into a GEMM (TPU TRSM is ~6x slower
        # than GEMM; see ops/cholesky.rsolve_lower_t). f64 keeps TRSM.
        ld_inv_t = lower_inverse(ld).T if dtype == jnp.float32 else None

        def trsm(i, k):
            i0 = base + i * block
            a = lax.dynamic_slice(k, (i0, j0), (block, block))
            if ld_inv_t is None:
                lij = solve_triangular(ld, a.T, lower=True).T
            else:
                lij = jnp.dot(a, ld_inv_t, preferred_element_type=dtype)
            return lax.dynamic_update_slice(k, lij, (i0, j0))

        k = lax.fori_loop(j + 1, nb, trsm, k)

        def syrk_i(i, k):
            i0 = base + i * block
            lij = lax.dynamic_slice(k, (i0, j0), (block, block))

            def syrk_k(kk, k):
                k0 = base + kk * block
                lkj = lax.dynamic_slice(k, (k0, j0), (block, block))
                a = lax.dynamic_slice(k, (i0, k0), (block, block))
                a = a - jnp.dot(lij, lkj.T, preferred_element_type=dtype)
                return lax.dynamic_update_slice(k, a, (i0, k0))

            return lax.fori_loop(j + 1, i + 1, syrk_k, k)

        return lax.fori_loop(j + 1, nb, syrk_i, k)

    return lax.fori_loop(0, nb, panel, m)


@functools.partial(jax.jit, static_argnames=("block", "eps"), donate_argnums=(0,))
def tiled_cholesky_inplace(k_mat: Array, eps: Optional[float] = None,
                           block: int = DEFAULT_TILE) -> tuple[Array, Array]:
    """Factor a (cap, cap) SPD matrix in place; cap % block == 0.

    Returns (L, ok). The input buffer is donated (transformed into L).
    """
    cap = k_mat.shape[0]
    num_panels = cap // block
    dtype = k_mat.dtype

    k_mat = region_cholesky_inplace(k_mat, 0, num_panels, block, eps, False)
    # mask the stale upper triangle in place (elementwise select aliases the
    # loop carry buffer; jnp.tril at this size would double peak HBM)
    rows = lax.broadcasted_iota(jnp.int32, (cap, 1), 0)
    cols = lax.broadcasted_iota(jnp.int32, (1, cap), 1)
    l_mat = jnp.where(rows >= cols, k_mat, jnp.zeros((), dtype))
    ok = jnp.isfinite(jnp.sum(l_mat))  # whole factor, no temp: see ops/cholesky.factor
    return l_mat, ok


@functools.partial(jax.jit, static_argnames=("treedef", "block", "method"))
def _build_cov_strips(leaves, treedef, x_pad, n, noise, block, method):
    """Build the padded training covariance strip-by-strip into one buffer.

    Peak memory = K + one (cap, B) strip — unlike the whole-matrix builder,
    whose sqdist intermediate doubles the footprint (fatal at n=50k f32 on
    a 16 GB chip)."""
    from ..ops.streamed import _train_cov_panel

    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    cap, d = x_pad.shape
    num_panels = cap // block

    def panel(j, k):
        j0 = j * block
        xj = lax.dynamic_slice(x_pad, (j0, jnp.zeros_like(j0)), (block, d))
        strip = _train_cov_panel(kernel, x_pad, xj, j0, n, noise, block, method)
        return lax.dynamic_update_slice(k, strip, (jnp.zeros_like(j0), j0))

    k0 = jnp.zeros((cap, cap), dtype=x_pad.dtype)
    return lax.fori_loop(0, num_panels, panel, k0)


def tiled_cholesky_factor(kernel, x_pad: Array, n, noise,
                          eps: Optional[float] = None,
                          block: int = DEFAULT_TILE,
                          method: str = "gram") -> tuple[Array, Array]:
    """Covariance build (strip-wise, low-peak-memory) + in-place tiled
    factorization."""
    from .partition import pick_block

    cap = x_pad.shape[0]
    b = pick_block(cap, block)
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    k_mat = _build_cov_strips(
        tuple(leaves), treedef, x_pad, jnp.asarray(n, jnp.int32),
        jnp.asarray(noise, x_pad.dtype), b, method,
    )
    return tiled_cholesky_inplace(k_mat, eps=eps, block=b)
