"""Streamed covariance / gradient-covariance matrix-vector products.

For large n, the optimizer's gradient terms need products with the
(cap, cap) gradient matrices dK/dtheta_p (reference materializes them:
``algebra/mod.rs:129-155`` — infeasible at n=50k+). These helpers stream
panels of dK (or K) generated directly from the inputs, accumulating
``dK @ V`` without ever materializing the matrix: memory is one
(cap, B) strip; compute is MXU GEMMs.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from .distance import diag_features, pairwise_features

Array = jnp.ndarray


@functools.partial(jax.jit, static_argnames=("treedef", "block", "method"))
def _grad_matvec_impl(leaves, treedef, x_pad, n, v, block, method):
    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    cap, d = x_pad.shape
    m = v.shape[1]
    p = kernel.nb_params
    num_panels = cap // block
    rows = jnp.arange(cap)[:, None]

    def panel(j, acc):
        j0 = j * block
        xj = lax.dynamic_slice(x_pad, (j0, jnp.zeros_like(j0)), (block, d))
        feats = pairwise_features(x_pad, xj, kernel.needs, method=method)
        grads = kernel.pointwise_grads(feats)  # p x (cap, block)
        # analytic diagonal (distance exactly zero): see
        # ops/covariance.gradient_covariances_padded
        dgrads = kernel.pointwise_grads(diag_features(xj, kernel.needs))
        cols = j0 + jnp.arange(block)[None, :]
        diag = rows == cols
        grads = [
            jnp.where(diag, dg[None, :], g)
            for g, dg in zip(grads, dgrads)
        ]
        live = (rows < n) & (cols < n)
        vj = lax.dynamic_slice(v, (j0, jnp.zeros_like(j0)), (block, m))
        out = jnp.stack(
            [
                jnp.dot(
                    jnp.where(live, g, 0.0), vj,
                    preferred_element_type=x_pad.dtype,
                )
                for g in grads
            ]
        )  # (p, cap, m)
        return acc + out

    acc0 = jnp.zeros((p, cap, m), dtype=x_pad.dtype)
    return lax.fori_loop(0, num_panels, panel, acc0)


def streamed_grad_matvec(
    kernel, x_pad: Array, n, v: Array, block: int = 1024, method: str = "gram"
) -> Array:
    """(p, cap, m) = stack_p [ dK_p @ V ], dK never materialized.

    Dead rows/cols of dK are zero (matching
    ``gradient_covariances_padded``), so products over the full buffer
    equal the live ones.
    """
    from .partition import pick_block

    cap = x_pad.shape[0]
    b = pick_block(cap, block)
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    v2 = v if v.ndim == 2 else v[:, None]
    out = _grad_matvec_impl(
        tuple(leaves), treedef, x_pad, jnp.asarray(n, jnp.int32), v2, b, method
    )
    return out if v.ndim == 2 else out[..., 0]
