"""Distributed streamed Cholesky over a device mesh (shard_map + collectives).

The large-n replacement for nalgebra's single-thread factorization
(``algebra/mod.rs:83-90``), built as the SPMD version of
``ops/streamed.py``'s left-looking panel algorithm:

- Training inputs and the output factor L are **row-sharded** across all
  mesh devices (mesh axes flattened into one linear rank axis). Contiguous
  row sharding is load-BALANCED here because every left-looking panel
  touches all rows — unlike right-looking trailing updates, where early
  rows go idle.
- Per panel j, each device: (1) builds its rows of the covariance strip
  K(X_local, X_j) directly from inputs (K is never materialized), (2)
  downdates against previously factored panels using its local L rows plus
  the panel-owner's B x cap row strip — the ONE collective per panel (a
  ``psum`` broadcast that rides ICI), (3) redundantly factors the B x B
  diagonal block (cheap), (4) solves its rows of the panel locally (MXU
  TRSM).
- Communication: cap x B floats per panel = cap^2 total — the size of L,
  streamed once over ICI; compute per device is the full panel GEMM chain,
  so compute:comm ratio grows linearly with B.

Constraints: capacity % n_devices == 0 and local_rows % block == 0 (panels
never straddle device boundaries — keeps ownership tests trivial).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
from jax import lax
try:  # jax >= 0.8: top-level shard_map, check_rep renamed check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.scipy.linalg import solve_triangular
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.cholesky import _unblocked_cholesky_substitute, rsolve_lower_t
from ..ops.covariance import cross_covariance, kernel_diag

Array = jnp.ndarray


from ..ops.partition import pick_block as _pick_block

import functools


@functools.lru_cache(maxsize=64)
def _build_factor_program(mesh, treedef, num_leaves, cap, d, block, eps,
                          method, storage=None):
    """Build + jit the shard_map factorization ONCE per (mesh, shapes,
    statics) — repeated calls (e.g. every fit iteration) reuse the
    compiled program instead of re-tracing the panel loops."""
    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    local_rows = cap // n_dev
    num_panels = cap // block

    def body(x_local, n_arr, noise_arr, *kleaves):
        kern = jax.tree_util.tree_unflatten(treedef, kleaves)
        dtype = x_local.dtype  # COMPUTE dtype; the factor may store bf16
        n_live = n_arr[0]
        noise_v = noise_arr[0]
        rank = lax.axis_index(axes)
        row0 = rank * local_rows
        rows_global = row0 + jnp.arange(local_rows)

        # bf16 STORAGE (mirrors ops/streamed storage="bf16"): panels are
        # computed in f32 and rounded at write-back. On a mesh this also
        # HALVES the one psum broadcast per panel (the (B, cap) owner row
        # strip — cap^2 bytes total over ICI become cap^2/2)
        store_dtype = jnp.bfloat16 if storage == "bf16" else dtype
        l_local = jnp.zeros((local_rows, cap), dtype=store_dtype)

        def owner_bcast(arr_local, off, owned, shape):
            """Extract ``shape`` rows at local offset ``off`` on the owner,
            broadcast to all devices via psum."""
            zeros = tuple(jnp.zeros_like(off) for _ in range(arr_local.ndim - 1))
            sl = lax.dynamic_slice(
                arr_local, (off,) + zeros,
                (shape[0],) + arr_local.shape[1:],
            )
            sl = jnp.where(owned, sl, jnp.zeros_like(sl))
            return lax.psum(sl, axes)

        def panel_step(j, l_local):
            j0 = j * block
            owned = (j0 >= row0) & (j0 < row0 + local_rows)
            off = jnp.clip(j0 - row0, 0, local_rows - block)

            # panel inputs X_j, broadcast from the owner
            xj = owner_bcast(x_local, off, owned, (block, d))

            # local rows of the covariance strip (streamed build)
            s = cross_covariance(kern, x_local, xj, method=method)
            # analytic diagonal: see ops/covariance.train_covariance_padded
            kd = kernel_diag(kern, xj) + noise_v * noise_v
            cols = j0 + jnp.arange(block)[None, :]
            diag = rows_global[:, None] == cols
            s = jnp.where(diag, kd[None, :], s)
            live = (rows_global[:, None] < n_live) & (cols < n_live)
            eye = jnp.where(diag, 1.0, 0.0).astype(dtype)
            s = jnp.where(live, s, eye)

            # the one collective: panel-owner's previously-factored rows
            l_jrows = owner_bcast(l_local, off, owned, (block, cap))

            def downdate(i, s_acc):
                i0 = i * block
                l_strip = lax.dynamic_slice(l_local, (jnp.zeros_like(i0), i0), (local_rows, block))
                l_jr = lax.dynamic_slice(l_jrows, (jnp.zeros_like(i0), i0), (block, block))
                return s_acc - jnp.dot(l_strip, l_jr.T, preferred_element_type=dtype)

            s = lax.fori_loop(0, j, downdate, s)

            # diagonal block: owner's rows of s, broadcast, factored everywhere
            diag_blk = owner_bcast(s, off, owned, (block, block))
            if eps is None:
                ld = jnp.linalg.cholesky(diag_blk)
            else:
                ld = _unblocked_cholesky_substitute(diag_blk, eps)

            t_local = rsolve_lower_t(ld, s)
            # owner substitutes the factored diagonal block for its rows
            t_owner = lax.dynamic_update_slice(
                t_local, ld, (off, jnp.zeros_like(off))
            )
            t_local = jnp.where(owned, t_owner, t_local)
            # rows above the panel are zero in a lower factor
            t_local = jnp.where(rows_global[:, None] < j0, 0.0, t_local)
            return lax.dynamic_update_slice(
                l_local, t_local.astype(l_local.dtype),
                (jnp.zeros_like(j0), j0),
            )

        l_local = lax.fori_loop(0, num_panels, panel_step, l_local)
        # whole local factor (see ops/cholesky.factor: the substitute
        # cascade can NaN off-diagonals while the diagonal stays finite);
        # fused sum reduction — no (rows, cap) bool temp
        ok_local = jnp.isfinite(jnp.sum(
            l_local, dtype=dtype if store_dtype != dtype else None
        ))
        ok = lax.pmin(ok_local.astype(jnp.int32), axes)
        return l_local, ok[None]

    spec_rows = P(axes if len(axes) > 1 else axes[0])
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_rows, P(), P()) + tuple(P() for _ in range(num_leaves)),
        out_specs=(spec_rows, P()),
        check_rep=False,
    )
    return jax.jit(fn)


def distributed_cholesky_factor(
    mesh: Mesh,
    kernel,
    x_pad: Array,
    n,
    noise,
    eps: Optional[float] = None,
    block: int = 512,
    method: str = "gram",
    storage: Optional[str] = None,
) -> tuple[Array, Array]:
    """Fused covariance build + Cholesky, row-sharded over the whole mesh.

    Returns (L, ok) with L row-sharded; callers can keep it sharded for
    distributed solves or gather it.

    ``storage="bf16"`` stores L in bfloat16 (f32 compute, rounded
    write-back — the mesh analogue of ``ops/streamed``'s storage mode):
    halves each device's factor HBM (double the per-chip capacity) AND
    halves the per-panel psum broadcast of owner row strips (cap^2 bytes
    over ICI become cap^2/2). Requires float32 inputs. The distributed
    sweeps (``distributed_solve``) read the bf16 factor natively.
    """
    n_dev = mesh.size
    cap, d = x_pad.shape
    if cap % n_dev:
        raise ValueError(f"capacity {cap} not divisible by {n_dev} devices")
    if storage not in (None, "bf16"):
        raise ValueError(f"storage must be None or 'bf16', got {storage!r}")
    if storage == "bf16" and x_pad.dtype != jnp.float32:
        raise ValueError(
            f"storage='bf16' requires float32 inputs, got {x_pad.dtype}"
        )
    block = _pick_block(cap // n_dev, block)
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    fn = _build_factor_program(
        mesh, treedef, len(leaves), cap, d, block, eps, method, storage
    )
    l_mat, ok = fn(
        x_pad,
        jnp.asarray([n], jnp.int32),
        jnp.asarray([noise], x_pad.dtype),
        *[jnp.asarray(v, x_pad.dtype) for v in leaves],
    )
    return l_mat, ok[0] > 0
