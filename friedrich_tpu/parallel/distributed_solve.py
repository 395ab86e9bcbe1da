"""Distributed triangular solves against a row-sharded Cholesky factor.

Completes the large-n predict path (BASELINE config 5): with L row-sharded
from ``distributed_cholesky_factor``, the predict paths need

    kl = L^-1 C          (variance;  ``gaussian_process/mod.rs:260-263``)
    w  = L^-T kl         (mean/weights; ``mod.rs:235``)

Both are blocked substitution sweeps over the same panel structure as the
factorization. The collectives carry only SOLUTION blocks — (B, m)
psums — never factor rows, so per-sweep ICI traffic is cap x m floats
forward / 2 cap x m backward (round 4; the round-3 sweeps broadcast the
owner's (B, cap) L strip every panel, cap^2 per sweep — pinned now by
``tests/test_comm_volume.py``):

- Forward sweep (lower), RIGHT-LOOKING: the panel owner solves its
  (B, B) diagonal block against its locally-downdated rhs rows and
  psum-broadcasts the solved (B, m) block; every device then downdates
  its OWN future rhs rows with its local L columns — the downdate GEMM
  ((local_rows, B) @ (B, m)) is the dominant work and is perfectly
  row-balanced. One (B, m) psum per panel.
- Backward sweep (lower^T), LEFT-LOOKING: the contribution
  ``sum_{r>panel} L[r, j0:j0+B]^T x_r`` is computed shard-locally over
  each device's rows and psum-reduced ((B, m)); the owner solves its
  local (B, B) diagonal block transposed and the solved block is
  psum-broadcast ((B, m)). Two (B, m) psums per panel.

The (B, B) diagonal solves run replicated on every device against the
owner's masked block (garbage elsewhere, discarded by the ownership
mask before the psum) — redundant O(B^2 m) work instead of a (B, cap)
broadcast.
"""

from __future__ import annotations

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

Array = jnp.ndarray


def distributed_solve_lower(
    mesh: Mesh, l_local_rows: Array, c: Array, block: int = 512
) -> Array:
    """Solve L y = C with L row-sharded over the mesh; C replicated.

    Returns y replicated on all devices (shape (cap, m)).
    """
    return _solve(mesh, l_local_rows, c, block, transposed=False)


def distributed_solve_lower_t(
    mesh: Mesh, l_local_rows: Array, c: Array, block: int = 512
) -> Array:
    """Solve L^T x = C with L row-sharded; C replicated. Returns x
    replicated."""
    return _solve(mesh, l_local_rows, c, block, transposed=True)


import functools


@functools.lru_cache(maxsize=128)
def _build_solve_program(mesh, cap, m, b, transposed, rhs_sharded=False):
    """Build + jit the shard_map sweep ONCE per (mesh, shapes, direction) —
    repeated solves reuse the compiled program.

    ``rhs_sharded``: the right-hand side arrives ROW-SHARDED like L (each
    device holds its cap/D rows) instead of replicated; the panel owner
    broadcasts its rhs block alongside its L rows. Lets callers build
    covariance strips shard-local (n*m/D work per device) instead of
    replicated."""
    if transposed and rhs_sharded:
        raise ValueError(
            "sharded-rhs is only supported on the forward sweep (the "
            "backward sweep reads the replicated forward solution)"
        )
    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    local_rows = cap // n_dev
    num_panels = cap // b

    def body(l_local, c_in):
        # compute dtype rides on the RHS: a bf16-STORAGE factor
        # (distributed_cholesky_factor storage="bf16") is read natively by
        # the panel GEMMs (promoted into f32 accumulation) while diagonal
        # solves and the solution stay f32
        dtype = c_in.dtype
        rank = lax.axis_index(axes)
        row0 = rank * local_rows
        rows_global = row0 + jnp.arange(local_rows)

        def local_diag(j0, off):
            """The (b, b) diagonal block, sliced from each device's LOCAL
            rows (real on the owner, garbage elsewhere — masked before the
            psum). Replaces the round-3 (b, cap) owner-row broadcast."""
            return lax.dynamic_slice(
                l_local, (jnp.asarray(off, j0.dtype), j0), (b, b)
            )

        y = jnp.zeros((cap, m), dtype=dtype)

        if not transposed:
            # RIGHT-LOOKING forward substitution: each device carries its
            # local rhs rows, downdated in place as solution blocks land
            if rhs_sharded:
                rhs_local = c_in  # already this device's rows
            else:
                rhs_local = lax.dynamic_slice(
                    c_in, (row0, jnp.zeros_like(row0)), (local_rows, m)
                )

            def panel(j, carry):
                y, rhs_local = carry
                j0 = j * b
                owned = (j0 >= row0) & (j0 < row0 + local_rows)
                off = jnp.clip(j0 - row0, 0, local_rows - b)
                ld = local_diag(j0, off)
                rhs_blk = lax.dynamic_slice(
                    rhs_local, (off, jnp.zeros_like(off)), (b, m)
                )
                yj = solve_triangular(ld.astype(dtype), rhs_blk, lower=True)
                # ONE (b, m) psum per panel — the sweep's only collective
                yj = lax.psum(jnp.where(owned, yj, jnp.zeros_like(yj)), axes)
                # downdate this device's FUTURE rows with its local L columns
                l_cols = lax.dynamic_slice(
                    l_local, (jnp.zeros_like(j0), j0), (local_rows, b)
                )
                below = rows_global >= j0 + b
                rhs_local = rhs_local - jnp.dot(
                    jnp.where(below[:, None], l_cols, 0.0), yj,
                    preferred_element_type=dtype,
                )
                y = lax.dynamic_update_slice(y, yj, (j0, jnp.zeros_like(j0)))
                return y, rhs_local

            y, _ = lax.fori_loop(0, num_panels, panel, (y, rhs_local))
        else:
            # LEFT-LOOKING backward substitution: contributions are
            # shard-local partial GEMMs, psum-reduced per panel
            def panel(t, y):
                j = num_panels - 1 - t
                j0 = j * b
                owned = (j0 >= row0) & (j0 < row0 + local_rows)
                off = jnp.clip(j0 - row0, 0, local_rows - b)
                # contribution sum_{rows r > j0+b-1} L[r, j0:j0+b]^T x_r:
                # each device's local rows contribute; psum ((b, m))
                l_colpanel = lax.dynamic_slice(
                    l_local, (jnp.zeros_like(j0), j0), (local_rows, b)
                )  # (local_rows, b) = L[local rows, j0:j0+b]
                below = rows_global >= j0 + b
                l_below = jnp.where(below[:, None], l_colpanel, 0.0)
                y_local = lax.dynamic_slice(
                    y, (row0, jnp.zeros_like(row0)), (local_rows, m)
                )
                contrib = lax.psum(
                    jnp.dot(l_below.T, y_local, preferred_element_type=dtype),
                    axes,
                )
                rhs = lax.dynamic_slice(
                    c_in, (j0, jnp.zeros_like(j0)), (b, m)
                ) - contrib
                ld = local_diag(j0, off)
                xj = solve_triangular(ld.astype(dtype), rhs, lower=True, trans=1)
                # second (b, m) psum: broadcast the owner's solved block
                xj = lax.psum(jnp.where(owned, xj, jnp.zeros_like(xj)), axes)
                return lax.dynamic_update_slice(y, xj, (j0, jnp.zeros_like(j0)))

            y = lax.fori_loop(0, num_panels, panel, y)

        return y

    spec_rows = P(axes if len(axes) > 1 else axes[0])
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_rows, spec_rows if rhs_sharded else P()),
        out_specs=P(),
        check_rep=False,
    )
    return jax.jit(fn)


def _solve(mesh, l_sharded, c, block, transposed, rhs_sharded=False):
    from ..ops.partition import pick_block

    n_dev = mesh.size
    cap = c.shape[0]
    m = c.shape[1] if c.ndim == 2 else 1
    c2 = c.reshape(cap, m)
    b = pick_block(cap // n_dev, block)
    fn = _build_solve_program(mesh, cap, m, b, transposed, rhs_sharded)
    y = fn(l_sharded, c2)
    return y.reshape(c.shape)


def distributed_solve_lower_sharded_rhs(
    mesh: Mesh, l_local_rows: Array, c_sharded: Array, block: int = 512
) -> Array:
    """Forward sweep with the RHS row-sharded like L (see
    ``_build_solve_program``); returns y replicated."""
    return _solve(mesh, l_local_rows, c_sharded, block, False, rhs_sharded=True)


@functools.lru_cache(maxsize=64)
def _build_cross_program(mesh, treedef, num_leaves, cap, d, m, method):
    """Shard-local training-cross-covariance strip: each device builds ONLY
    its cap/D rows of K(X_train, Xq) (dead rows zeroed) — n*m/D build work
    per device instead of the replicated build the solves used before."""
    from ..ops.covariance import cross_covariance

    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    local_rows = cap // n_dev

    def body(x_local, n_arr, xq, *kleaves):
        kern = jax.tree_util.tree_unflatten(treedef, kleaves)
        rank = lax.axis_index(axes)
        rows_global = rank * local_rows + jnp.arange(local_rows)
        c = cross_covariance(kern, x_local, xq, method=method)
        return jnp.where((rows_global < n_arr[0])[:, None], c, 0.0)

    spec_rows = P(axes if len(axes) > 1 else axes[0])
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(spec_rows, P(), P()) + tuple(P() for _ in range(num_leaves)),
        out_specs=spec_rows,
        check_rep=False,
    )
    return jax.jit(fn)


def distributed_cross_covariance(
    mesh: Mesh, kernel, x_pad: Array, n, xq: Array, method: str = "gram"
) -> Array:
    """Row-sharded K(X_train_pad, Xq) with dead rows zeroed — the
    shard-local counterpart of ``cross_covariance_train_padded``. Feed the
    result to ``distributed_solve_lower_sharded_rhs``."""
    cap, d = x_pad.shape
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    fn = _build_cross_program(
        mesh, treedef, len(leaves), cap, d, xq.shape[0], method
    )
    return fn(
        x_pad,
        jnp.asarray([n], jnp.int32),
        xq,
        *[jnp.asarray(v, x_pad.dtype) for v in leaves],
    )


def distributed_cho_solve(mesh: Mesh, l_sharded: Array, c: Array, block: int = 512) -> Array:
    """K^-1 C via forward + backward sweeps (the ``covmat_cholesky.solve``
    slot, ``mod.rs:235``)."""
    y = distributed_solve_lower(mesh, l_sharded, c, block)
    return distributed_solve_lower_t(mesh, l_sharded, y, block)
