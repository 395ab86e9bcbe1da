"""Hybrid split Cholesky (superseded at large n by the trace-time-unrolled
streamed factorizer, ``ops/streamed.py:_streamed_unrolled_impl``, which
reaches ~0.39 n^3 FLOPs with a single-L-buffer peak — this module's split
approach tops out at ~0.65 n^3 with a 2x-L peak that exceeds a 16 GB chip
at n=50k f32; kept for the mid-size regime and as the `hybrid` backend).

The flat fori_loop streamed factorization pays ~3x the
theoretical FLOPs for static shapes. Splitting the matrix at the top
recovers most of that; recursion (``levels``) splits the leading block
again:

    [region 0:h)    streamed panels (leaf) or recursive hybrid split
    L21 = K21 L11^-T      per-strip sweep against the leading region
    S22 = K22 - L21 L21^T strip-built, slice-wise downdate, in place
    L22 = right-looking tiled factorization of the S22 region IN PLACE

FLOPs ~0.8 n^3 at levels=1, ~0.65 n^3 at levels=2 (optimal n^3/3; flat
streamed is 2 n^3). Rules learned the hard way at n=50k on a 16 GB chip
with a remote compiler:

- **No monolithic large ops**: XLA's n-sized Cholesky or a TRSM with a
  wide RHS crashes the compiler; every step is a fixed-size-panel
  ``fori_loop`` (constant program size).
- **One big buffer, factored IN REGION**: the (cap, cap) factor is the
  only O(n^2) allocation. Since round 2 the leading block is factored
  *inside* ``l_full`` (the round-1 version built a separate (h, h)
  ``l11`` and copied it in, holding both alive — a 2.5 GB overlap at
  n=50k that, together with the f32 inverse-GEMM buffers, pushed the
  peak past 16 GB). K21/K22 strips are generated from the inputs and
  consumed immediately: peak HBM ~= L + strips.
- **Lower-triangle discipline**: region strips store only their lower
  part (diagonal tiles are mirrored before factorization since XLA's
  cholesky symmetrizes input), so no final full-matrix mask (which would
  double peak memory) is needed.
- f32 panel solves use the inverse-GEMM path (``ops/cholesky``): the
  leading region's diagonal-block inverses are computed once per level
  and reused across every L21 row panel.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray


def _streamed_region(kernel, x_pad, n, noise, eps, block, method, l_full, size):
    """Left-looking streamed factorization of K(x_pad[:size]) written into
    ``l_full[:size, :size]`` (row/col indices are absolute; no separate
    (size, size) buffer). Mirrors ``ops/streamed._streamed_cholesky_impl``."""
    from jax.scipy.linalg import solve_triangular

    from .cholesky import cholesky_with_substitute, rsolve_lower_t
    from .streamed import _train_cov_panel

    d = x_pad.shape[1]
    dtype = x_pad.dtype
    x_head = lax.slice(x_pad, (0, 0), (size, d))
    num_panels = size // block
    rows_head = jnp.arange(size)[:, None]

    def panel_step(j, l_full):
        j0 = j * block
        xj = lax.dynamic_slice(x_head, (j0, 0), (block, d))
        s = _train_cov_panel(kernel, x_head, xj, j0, n, noise, block, method)

        def downdate(i, s_acc):
            i0 = i * block
            l_strip = lax.dynamic_slice(l_full, (0, i0), (size, block))
            l_rows = lax.dynamic_slice(l_full, (j0, i0), (block, block))
            return s_acc - jnp.dot(
                l_strip, l_rows.T, preferred_element_type=dtype
            )

        s = lax.fori_loop(0, j, downdate, s)

        diag_blk = lax.dynamic_slice(s, (j0, 0), (block, block))
        if eps is None:
            ld = jnp.linalg.cholesky(diag_blk)
        else:
            ld = cholesky_with_substitute(diag_blk, eps, block=128)
        t = rsolve_lower_t(ld, s)  # (size, block); f32: inverse-GEMM
        strip = lax.dynamic_update_slice(t, ld, (j0, 0))
        strip = jnp.where(rows_head < j0, 0.0, strip)
        return lax.dynamic_update_slice(l_full, strip, (0, j0))

    return lax.fori_loop(0, num_panels, panel_step, l_full)


def _hybrid_region(kernel, x_pad, n, noise, eps, block, method, levels, h,
                   l_full, size):
    """Factor K(x_pad[:size]) into ``l_full[:size, :size]`` with a split at
    row ``h``; the leading [0, h) region recurses (or streams at the leaf)."""
    from jax.scipy.linalg import solve_triangular

    from .covariance import cross_covariance, kernel_diag

    d = x_pad.shape[1]
    dtype = x_pad.dtype
    h2 = size - h
    x1 = lax.slice(x_pad, (0, 0), (h, d))
    x2 = lax.slice(x_pad, (h, 0), (size, d))

    # leading region: recurse (levels unroll at trace time) or stream
    if levels > 1 and h % 2 == 0 and (h // 2) % block == 0:
        l_full = _hybrid_region(
            kernel, x_pad, n, noise, eps, block, method, levels - 1,
            h // 2, l_full, h,
        )
    else:
        l_full = _streamed_region(
            kernel, x_pad, n, noise, eps, block, method, l_full, h
        )

    cols1 = jnp.arange(h)[None, :]
    num_panels2 = h2 // block
    num_panels1 = h // block

    # f32 perf path: invert the leading region's diagonal blocks ONCE
    # (h/B small TRSMs), so every forward-sweep step across ALL h2/B row
    # panels is a GEMM — TPU TRSM is ~6x slower than a same-shape GEMM
    # (ops/cholesky.rsolve_lower_t).
    if dtype == jnp.float32:
        from .cholesky import lower_inverse

        def inv_blk(jj, acc):
            j0 = jj * block
            ld = lax.dynamic_slice(l_full, (j0, j0), (block, block))
            return lax.dynamic_update_slice(
                acc, lower_inverse(ld), (j0, jnp.zeros_like(j0))
            )

        inv_diag = lax.fori_loop(
            0, num_panels1, inv_blk, jnp.zeros((h, block), dtype)
        )
    else:
        inv_diag = None

    def l21_panel(j, l_full):
        r0 = j * block
        z = jnp.zeros_like(r0)
        xj = lax.dynamic_slice(x2, (r0, z), (block, d))
        strip = cross_covariance(kernel, xj, x1, method=method)  # (B, h)
        rows = h + r0 + jnp.arange(block)[:, None]
        rhs = jnp.where((rows < n) & (cols1 < n), strip, 0.0).T  # (h, B)

        # forward substitution: L11 Y = rhs, L11 read panel-wise from l_full
        def fwd(jj, y):
            j0 = jj * block
            zz = jnp.zeros_like(j0)
            l_rows = lax.dynamic_slice(l_full, (j0, zz), (block, h))
            l_left = jnp.where(jnp.arange(h)[None, :] < j0, l_rows, 0.0)
            r = lax.dynamic_slice(rhs, (j0, zz), (block, block)) - jnp.dot(
                l_left, y, preferred_element_type=dtype
            )
            if inv_diag is None:
                ld = lax.dynamic_slice(l_rows, (zz, j0), (block, block))
                yj = solve_triangular(ld, r, lower=True)
            else:
                inv_jj = lax.dynamic_slice(inv_diag, (j0, zz), (block, block))
                yj = jnp.dot(inv_jj, r, preferred_element_type=dtype)
            return lax.dynamic_update_slice(y, yj, (j0, zz))

        y = lax.fori_loop(0, num_panels1, fwd, jnp.zeros((h, block), dtype))
        return lax.dynamic_update_slice(l_full, y.T, (h + r0, z))

    l_full = lax.fori_loop(0, num_panels2, l21_panel, l_full)

    # S22 = K22 (+noise^2 I / identity padding) - L21 L21^T, column strips
    # written DIRECTLY into l_full[h:size, h:size]; the downdate contracts
    # small slices of L21 from l_full.
    rows2 = h + jnp.arange(h2)[:, None]

    def s22_panel(j, l_full):
        c0 = j * block
        z = jnp.zeros_like(c0)
        xj = lax.dynamic_slice(x2, (c0, z), (block, d))
        strip = cross_covariance(kernel, x2, xj, method=method)  # (h2, B)
        cols = h + c0 + jnp.arange(block)[None, :]
        diag = rows2 == cols
        # analytic diagonal: see ops/covariance.train_covariance_padded
        kd = kernel_diag(kernel, xj) + noise * noise
        strip = jnp.where(diag, kd[None, :], strip)
        live = (rows2 < n) & (cols < n)
        strip = jnp.where(live, strip, jnp.where(diag, 1.0, 0.0).astype(dtype))

        def downdate(kk, acc):
            k0 = kk * block
            l_all_k = lax.dynamic_slice(l_full, (h, k0), (h2, block))
            l_cols_k = lax.dynamic_slice(l_full, (h + c0, k0), (block, block))
            return acc - jnp.dot(
                l_all_k, l_cols_k.T, preferred_element_type=dtype
            )

        strip = lax.fori_loop(0, num_panels1, downdate, strip)
        # write only the lower part of the region column strip: the later
        # in-place factorization touches lower tiles only, and this keeps
        # l_full exactly lower-triangular without a final full-matrix mask
        # (which would double peak HBM)
        strip = jnp.where(rows2 >= cols, strip, 0.0)
        return lax.dynamic_update_slice(l_full, strip, (h, h + c0))

    l_full = lax.fori_loop(0, num_panels2, s22_panel, l_full)

    # L22: MAC-optimal tiled factorization of the S22 region IN PLACE
    # (shared tile loop with the `tiled` backend; mirror_diag because the
    # region strips store the lower half only).
    from .tiled import region_cholesky_inplace

    return region_cholesky_inplace(l_full, h, h2 // block, block, eps, True)


@functools.partial(
    jax.jit,
    static_argnames=("treedef", "eps", "block", "method", "levels", "h"),
)
def _hybrid_impl(leaves, treedef, x_pad, n, noise, eps, block, method,
                 levels=1, h=None):
    """Memory-disciplined layout: ONE (cap, cap) buffer holds the factor
    end to end (leading region factored in place — no separate l11);
    K21/K22 are built strip-by-strip from the inputs and consumed
    immediately, so peak HBM ~= L + strips — n=50k f32 fits a 16 GB chip.

    ``h`` is the static split point (first-block rows; default cap/2); both
    ``h`` and ``cap - h`` must be multiples of ``block``."""
    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    cap = x_pad.shape[0]
    if h is None:
        h = cap // 2
    l_full = jnp.zeros((cap, cap), dtype=x_pad.dtype)
    l_full = _hybrid_region(
        kernel, x_pad, n, noise, eps, block, method, levels, h, l_full, cap
    )
    ok = jnp.isfinite(jnp.sum(l_full))  # whole factor, no temp
    return l_full, ok


def hybrid_cholesky_factor(
    kernel,
    x_pad: Array,
    n,
    noise,
    eps: Optional[float] = None,
    block: int = 2048,
    method: str = "gram",
    levels: int = 1,
    split: float = 0.5,
) -> tuple[Array, Array]:
    """Fused covariance build + split hybrid factorization.

    ``split`` sets the streamed-leaf fraction (default half; both blocks
    must be divisible by the panel size — the split point is rounded to a
    block boundary). ``levels > 1`` recursively hybrid-splits the leading
    block too.
    """
    cap = x_pad.shape[0]
    if cap % 2:
        raise ValueError("hybrid factorization needs even capacity")
    from .partition import pick_block

    b = pick_block(cap // 2, block)
    h = max(b, min(cap - b, int(round(cap * split / b)) * b))
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    return _hybrid_impl(
        tuple(leaves), treedef, x_pad, jnp.asarray(n, jnp.int32),
        jnp.asarray(noise, x_pad.dtype), eps, b, method, levels, h,
    )
