"""Hybrid half-split Cholesky: the fast large-n single-chip factorization.

The flat streamed factorization (``ops/streamed.py``) pays ~3x the
theoretical FLOPs for static shapes. Splitting the matrix once at the top
recovers most of that with three large static ops:

    L11 = streamed_factor(X_1)                   (kernel-built, n/2)
    L21 = K21 L11^-T                             (one TRSM, MXU)
    S22 = K22 - L21 L21^T                        (one SYRK, MXU)
    L22 = tiled_inplace(S22)                     (MAC-optimal, n/2)

FLOPs ~ 0.67 n^3 vs 2 n^3 flat-streamed (optimal is n^3/3); every op is
either a huge GEMM-family XLA op at half size (which compiles fine where
the monolithic n-sized Cholesky crashes the compiler) or an existing
streamed/tiled loop. K is never fully materialized; blocks are built from
the inputs with the same live/identity masking as the padded builders.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
from .streamed import _streamed_cholesky_impl
from .tiled import tiled_cholesky_inplace

Array = jnp.ndarray


@functools.partial(
    jax.jit, static_argnames=("treedef", "eps", "block", "method")
)
def _hybrid_impl(leaves, treedef, x_pad, n, noise, eps, block, method):
    from .covariance import cross_covariance

    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    cap, d = x_pad.shape
    h = cap // 2
    dtype = x_pad.dtype

    x1 = x_pad[:h]
    x2 = x_pad[h:]

    # L11: streamed factor of the top-left block (live count clamped)
    n1 = jnp.minimum(n, h)
    l11, ok1 = _streamed_cholesky_impl(
        leaves, treedef, x1, n1, noise, eps, block, method
    )

    # K21 with live masking (off-diagonal: dead entries are plain zero)
    rows2 = h + jnp.arange(h)[:, None]
    cols1 = jnp.arange(h)[None, :]
    k21 = cross_covariance(kernel, x2, x1, method=method)
    k21 = jnp.where((rows2 < n) & (cols1 < n), k21, 0.0)

    # L21 = K21 L11^-T — loop-blocked TRSM (a monolithic solve_triangular
    # with an h-wide RHS crashes the remote compiler at this size)
    from .blocked_solve import _blocked_solve

    l21 = _blocked_solve(l11, k21.T, block, False).T

    # S22 = K22 + noise^2 I (live) / identity (dead)  -  L21 L21^T
    k22 = cross_covariance(kernel, x2, x2, method=method)
    cols2 = h + jnp.arange(h)[None, :]
    diag2 = rows2 == cols2
    k22 = k22 + jnp.where(diag2, noise * noise, 0.0)
    live2 = (rows2 < n) & (cols2 < n)
    k22 = jnp.where(live2, k22, jnp.where(diag2, 1.0, 0.0).astype(dtype))
    s22 = k22 - jnp.dot(l21, l21.T, preferred_element_type=dtype)

    # L22: MAC-optimal in-place tiled factorization of the downdated block
    l22, ok2 = tiled_cholesky_inplace(s22, eps=eps, block=min(block, h))

    l_full = jnp.zeros((cap, cap), dtype=dtype)
    l_full = lax.dynamic_update_slice(l_full, l11, (0, 0))
    l_full = lax.dynamic_update_slice(l_full, l21, (h, 0))
    l_full = lax.dynamic_update_slice(l_full, l22, (h, h))
    return l_full, ok1 & ok2


def hybrid_cholesky_factor(
    kernel,
    x_pad: Array,
    n,
    noise,
    eps: Optional[float] = None,
    block: int = 2048,
    method: str = "gram",
) -> tuple[Array, Array]:
    """Fused covariance build + half-split hybrid factorization.

    Requires even capacity with both halves divisible by a usable panel
    size (handled by block shrinking, like the other factorizers).
    """
    cap = x_pad.shape[0]
    if cap % 2:
        raise ValueError("hybrid factorization needs even capacity")
    h = cap // 2
    b = min(block, h)
    while h % b:
        b -= 1
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    return _hybrid_impl(
        tuple(leaves), treedef, x_pad, jnp.asarray(n, jnp.int32),
        jnp.asarray(noise, x_pad.dtype), eps, b, method,
    )
