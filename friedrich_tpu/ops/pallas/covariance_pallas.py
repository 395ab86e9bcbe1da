"""Pallas TPU kernel: fused covariance-matrix build.

The XLA path (``ops/covariance.py``) materializes the (n, m) squared
distance matrix in HBM, then the kernel map, then the masked result —
three HBM round-trips for one output. This kernel fuses, per (128-aligned)
tile: the distance Gram (one MXU matmul on the tile's rows), the kernel's
scalar map (VPU), the noise/identity diagonal handling, and the live-region
masking — writing each output tile exactly once.

Supported kernels: any whose pointwise map depends only on sqdist/dist/dot
(all nine reference kernels); the map is traced INTO the Pallas kernel body,
so Sum/Prod compositions fuse too.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..distance import DIST, DOT, SQDIST

Array = jnp.ndarray

TILE = 256  # 2x MXU tile; good VMEM/compute balance for f32


def _feats_tile(kernel, x1_tile, x2_tile, dtype):
    """Pairwise features for one (TILE, d) x (TILE, d) pair of row blocks."""
    needs = kernel.needs
    feats = {}
    dot = None
    if DOT in needs or SQDIST in needs or DIST in needs:
        dot = jax.lax.dot_general(
            x1_tile,
            x2_tile,
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
        )
    if DOT in needs:
        feats[DOT] = dot
    if SQDIST in needs or DIST in needs:
        n1 = jnp.sum(x1_tile * x1_tile, axis=1, keepdims=True)
        n2 = jnp.sum(x2_tile * x2_tile, axis=1, keepdims=True)
        sq = jnp.maximum(n1 + n2.T - 2.0 * dot, 0.0)
        feats[SQDIST] = sq
        if DIST in needs:
            feats[DIST] = jnp.sqrt(sq)
    return feats


def _cov_kernel_body(
    x1_ref, x2_ref, n_ref, noise_ref, params_ref, out_ref, *, treedef, n_leaves,
    train_mode,
):
    """One (TILE, TILE) output tile: features -> pointwise map -> mask.

    Kernel hyperparameters arrive as an SMEM vector (``params_ref``) and are
    unflattened back into the kernel pytree inside the body, so the scalar
    map fuses with the distance Gram without captured constants.
    """
    i = pl.program_id(0)
    j = pl.program_id(1)
    dtype = out_ref.dtype
    kernel = jax.tree_util.tree_unflatten(
        treedef, [params_ref[t] for t in range(n_leaves)]
    )
    x1 = x1_ref[:]
    x2 = x2_ref[:]
    feats = _feats_tile(kernel, x1, x2, dtype)
    k = kernel.pointwise(feats).astype(dtype)

    if train_mode:
        n = n_ref[0]
        noise = noise_ref[0].astype(dtype)
        rows = i * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        cols = j * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 1)
        live = (rows < n) & (cols < n)
        diag = rows == cols
        # analytic diagonal (distance exactly zero), not the gram tile's
        # cancellation-prone value: see ops/covariance.train_covariance_padded
        dfeats = {}
        if DOT in kernel.needs:
            dfeats[DOT] = jnp.sum(x2 * x2, axis=1)
        if SQDIST in kernel.needs:
            dfeats[SQDIST] = jnp.zeros((TILE,), dtype=dtype)
        if DIST in kernel.needs:
            dfeats[DIST] = jnp.zeros((TILE,), dtype=dtype)
        kd = kernel.pointwise(dfeats).astype(dtype) + noise * noise
        k = jnp.where(diag, kd[None, :], k)
        eye = jnp.where(diag, 1.0, 0.0).astype(dtype)
        k = jnp.where(live, k, eye)
    else:
        n = n_ref[0]
        rows = i * TILE + jax.lax.broadcasted_iota(jnp.int32, (TILE, TILE), 0)
        k = jnp.where(rows < n, k, 0.0)

    out_ref[:] = k


@functools.partial(jax.jit, static_argnames=("treedef", "train_mode"))
def _cov_pallas(x1, x2, n, noise, leaves, treedef, train_mode):
    m1, m2 = x1.shape[0], x2.shape[0]
    grid = (m1 // TILE, m2 // TILE)
    params = jnp.stack([jnp.asarray(v, x1.dtype) for v in leaves])
    body = functools.partial(
        _cov_kernel_body,
        treedef=treedef,
        n_leaves=len(leaves),
        train_mode=train_mode,
    )
    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((m1, m2), x1.dtype),
        grid=grid,
        in_specs=[
            pl.BlockSpec((TILE, x1.shape[1]), lambda i, j: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((TILE, x2.shape[1]), lambda i, j: (j, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec((TILE, TILE), lambda i, j: (i, j),
                               memory_space=pltpu.VMEM),
    )(
        x1,
        x2,
        jnp.asarray([n], jnp.int32),
        jnp.reshape(noise, (1,)).astype(x1.dtype),
        params,
    )


def train_covariance_pallas(kernel, x_pad: Array, n, noise) -> Array:
    """Fused padded training covariance (drop-in for
    ``train_covariance_padded``). Requires capacity % TILE == 0 for the
    fully-tiled fast path; otherwise falls back to the XLA builder."""
    cap = x_pad.shape[0]
    if cap % TILE != 0:
        from ..covariance import train_covariance_padded

        return train_covariance_padded(kernel, x_pad, n, noise)
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    return _cov_pallas(x_pad, x_pad, n, noise, tuple(leaves), treedef, True)


def cross_covariance_train_pallas(kernel, x_pad: Array, n, xq: Array) -> Array:
    """Fused K(X_train_pad, Xq) with dead rows zeroed (drop-in for
    ``cross_covariance_train_padded``)."""
    cap, m = x_pad.shape[0], xq.shape[0]
    if cap % TILE != 0 or m % TILE != 0:
        from ..covariance import cross_covariance_train_padded

        return cross_covariance_train_padded(kernel, x_pad, n, xq)
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    return _cov_pallas(
        x_pad, xq, n, jnp.zeros((), x_pad.dtype), tuple(leaves), treedef, False
    )
