"""Loop-blocked triangular solves (compiler-friendly at large n).

XLA's monolithic ``solve_triangular`` with a large triangular factor AND a
wide right-hand side produces a huge unrolled program that crashes the
remote TPU compiler (same failure mode as the monolithic Cholesky at
n=50k). These versions sweep fixed-size row panels inside a ``fori_loop``
— constant program size, all work in MXU GEMMs:

  forward :  y_j = Ld_j^-1 (c_j - L[j, :j] y[:j])
  backward:  x_j = Ld_j^-T (c_j - L[j+1:, j]^T x[j+1:])

The off-panel contraction uses masked full-width GEMMs (2x theoretical
FLOPs for static shapes — same trade as the streamed factorization).
Used by the hybrid factorizer and the large-n predict paths.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.scipy.linalg import solve_triangular

from .partition import pick_block as _pick_block

Array = jnp.ndarray


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
            yj = solve_triangular(ld, rhs, lower=True)
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
        xj = solve_triangular(ld, rhs, lower=True, trans=1)
        return lax.dynamic_update_slice(y, xj, (j0, z))

    return lax.fori_loop(0, num, panel, jnp.zeros((n, m), dtype))


def blocked_solve_lower(l_mat: Array, c: Array, block: int = 2048) -> Array:
    """Solve ``L y = c`` (lower-triangular L) with panel sweeps."""
    c2 = c if c.ndim == 2 else c[:, None]
    b = _pick_block(l_mat.shape[0], block)
    y = _blocked_solve(l_mat, c2, b, False)
    return y if c.ndim == 2 else y[:, 0]


def blocked_solve_lower_t(l_mat: Array, c: Array, block: int = 2048) -> Array:
    """Solve ``L^T x = c`` with panel sweeps."""
    c2 = c if c.ndim == 2 else c[:, None]
    b = _pick_block(l_mat.shape[0], block)
    y = _blocked_solve(l_mat, c2, b, True)
    return y if c.ndim == 2 else y[:, 0]


def blocked_cho_solve(l_mat: Array, c: Array, block: int = 2048) -> Array:
    """``(L L^T)^-1 c`` via the two sweeps."""
    return blocked_solve_lower_t(l_mat, blocked_solve_lower(l_mat, c, block), block)
