"""Pallas TPU megakernel: fused covariance-strip build + left-looking
downdate for the streamed Cholesky panel loop.

For panel ``j`` of the unrolled streamed factorizer
(``ops/streamed.py:_unrolled_body``), the pre-factor strip is

    S = K(x_tail, x_j) [+ noise^2 diag, identity padding]   (VPU: exp/...)
        - L[j0:, :j0] @ L[j0:j0+B, :j0]^T                   (MXU: fat-K GEMM)

The XLA path materializes the kernel strip in HBM, then runs ``j``
chunked (rest, B) @ (B, B) downdate GEMMs, each reading and rewriting
the (rest, B) accumulator strip in HBM. This kernel produces each
(TM, TN) output tile in VMEM in one visit: the kernel map (pointwise
eval of any of the nine reference kernels or their Sum/Prod
compositions, traced into the body exactly like
``covariance_pallas._cov_kernel_body``) runs on the tile's first grid
step, and the downdate accumulates over the K dimension in TK slabs —
one HBM write per output element, no intermediate strip traffic, and
the VPU transcendental work rides inside the MXU pipeline instead of
serializing as a separate XLA op.

Reference slot: the covariance assembly of ``make_cholesky_cov_matrix``
(``algebra/mod.rs:59-92``) fused with the trailing-update step of the
blocked factorization that replaces nalgebra's dense Cholesky.

Alignment contract (checked by the caller): ``rest % TM == 0``,
``B % TN == 0``, ``P % TK == 0`` where ``P = j0`` is the factored-prefix
width. ``ops/streamed.py`` guarantees this by requiring
``block % LCM(TM, TN, TK) == 0`` for the fused path.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..distance import DIST, DOT, SQDIST
from .covariance_pallas import _feats_tile

Array = jnp.ndarray

TM = 256  # strip-row tile
TN = 256  # panel-column tile
TK = 512  # downdate contraction slab


def _fused_body(
    x1_ref, x2_ref, a_ref, b_ref, n_ref, noise_ref, params_ref, out_ref,
    *, treedef, n_leaves, j0, tiles_k,
):
    """One (TM, TN) strip tile: kernel map once (k == 0), then a TK-slab
    downdate per grid step along k."""
    i = pl.program_id(0)
    j = pl.program_id(1)
    k = pl.program_id(2) if tiles_k > 0 else 0
    dtype = out_ref.dtype

    @pl.when(k == 0)
    def _init():
        kernel = jax.tree_util.tree_unflatten(
            treedef, [params_ref[t] for t in range(n_leaves)]
        )
        feats = _feats_tile(kernel, x1_ref[:], x2_ref[:], dtype)
        kv = kernel.pointwise(feats).astype(dtype)
        n = n_ref[0]
        noise = noise_ref[0].astype(dtype)
        rows = j0 + i * TM + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 0)
        cols = j0 + j * TN + jax.lax.broadcasted_iota(jnp.int32, (TM, TN), 1)
        diag = rows == cols
        live = (rows < n) & (cols < n)
        # analytic diagonal (distance exactly zero): see
        # ops/covariance.train_covariance_padded
        x2t = x2_ref[:]
        dfeats = {}
        if DOT in kernel.needs:
            dfeats[DOT] = jnp.sum(x2t * x2t, axis=1)
        if SQDIST in kernel.needs:
            dfeats[SQDIST] = jnp.zeros((TN,), dtype=dtype)
        if DIST in kernel.needs:
            dfeats[DIST] = jnp.zeros((TN,), dtype=dtype)
        kd = kernel.pointwise(dfeats).astype(dtype) + noise * noise
        kv = jnp.where(diag, kd[None, :], kv)
        eye = jnp.where(diag, 1.0, 0.0).astype(dtype)
        out_ref[:] = jnp.where(live, kv, eye)

    if tiles_k > 0:
        out_ref[:] = out_ref[:] - jax.lax.dot_general(
            a_ref[:],
            b_ref[:],
            dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=dtype,
        )


@functools.partial(
    jax.jit, static_argnames=("treedef", "j0", "rest", "block")
)
def _fused_panel_strip_impl(
    leaves, treedef, x_tail, xj, l_full, n, noise, j0, rest, block
):
    cap = l_full.shape[0]
    d = x_tail.shape[1]
    dtype = x_tail.dtype
    tiles_k = j0 // TK
    params = jnp.stack([jnp.asarray(v, dtype) for v in leaves])
    body = functools.partial(
        _fused_body,
        treedef=treedef,
        n_leaves=len(leaves),
        j0=j0,
        tiles_k=tiles_k,
    )
    # row/col block offsets into l_full are baked into the index maps
    # (j0 is static), so the factored prefix is read straight out of the
    # full factor buffer — no slice copies.
    row0 = j0 // TM

    in_specs = [
        pl.BlockSpec((TM, d), lambda i, j, k: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TN, d), lambda i, j, k: (j, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TM, TK), lambda i, j, k, row0=row0: (row0 + i, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((TN, TK), lambda i, j, k, row0=row0: (row0 + j, k),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
        pl.BlockSpec(memory_space=pltpu.SMEM),
    ]
    operands = [
        x_tail,
        xj,
        l_full,
        l_full,
        jnp.asarray([n], jnp.int32),
        jnp.reshape(noise, (1,)).astype(dtype),
        params,
    ]
    if tiles_k == 0:
        # first panel: no factored prefix — drop the downdate operands
        del in_specs[2:4], operands[2:4]

        def body(x1, x2, n_r, noise_r, p_r, o_r):  # noqa: F811
            _fused_body(
                x1, x2, None, None, n_r, noise_r, p_r, o_r,
                treedef=treedef, n_leaves=len(leaves), j0=j0, tiles_k=0,
            )

        grid = (rest // TM, block // TN)
        in_specs[0] = pl.BlockSpec((TM, d), lambda i, j: (i, 0),
                                   memory_space=pltpu.VMEM)
        in_specs[1] = pl.BlockSpec((TN, d), lambda i, j: (j, 0),
                                   memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((TM, TN), lambda i, j: (i, j),
                                memory_space=pltpu.VMEM)
        dim_sem = ("parallel", "parallel")
    else:
        grid = (rest // TM, block // TN, tiles_k)
        out_spec = pl.BlockSpec((TM, TN), lambda i, j, k: (i, j),
                                memory_space=pltpu.VMEM)
        dim_sem = ("parallel", "parallel", "arbitrary")

    return pl.pallas_call(
        body,
        out_shape=jax.ShapeDtypeStruct((rest, block), dtype),
        grid=grid,
        in_specs=in_specs,
        out_specs=out_spec,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=dim_sem,
        ),
    )(*operands)


def fused_panel_strip(
    kernel, x_tail: Array, xj: Array, l_full: Array, n, noise,
    j0: int, block: int,
) -> Array:
    """Fused downdated training-covariance strip for panel ``j0 // block``.

    Returns the (rest, block) strip ``S`` described in the module
    docstring, where ``rest = cap - j0``. ``l_full`` is the full (cap,
    cap) factor buffer; only its first ``j0`` columns (rows ``j0:``) are
    read. ``j0`` and ``block`` must be static Python ints satisfying the
    alignment contract.
    """
    cap = l_full.shape[0]
    rest = cap - j0
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    return _fused_panel_strip_impl(
        tuple(leaves), treedef, x_tail, xj, l_full,
        jnp.asarray(n, jnp.int32), jnp.asarray(noise, x_tail.dtype),
        j0, rest, block,
    )


def fused_supported(cap: int, block: int, dtype) -> bool:
    """Alignment/dtype gate for the fused panel path."""
    return (
        dtype == jnp.float32
        and cap % block == 0
        and block % TM == 0
        and block % TN == 0
        and block % TK == 0
    )
