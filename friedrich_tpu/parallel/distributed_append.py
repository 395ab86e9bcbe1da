"""Distributed blocked rank-k Cholesky append (add_samples at scale).

Large-n counterpart of ``ops/cholesky.cholesky_append_padded`` (itself the
blocked replacement for the reference's per-row ``Cholesky::insert_column``
loop, ``algebra/mod.rs:97-126``), operating on a ROW-SHARDED factor:

    C   = K(X_old, X_new)   (cap x k, replicated — k is small)
    S   = L^-1 C            (one distributed forward sweep)
    L22 = chol(K22 + noise^2 I - S^T S)    (k x k, replicated)
    rows [n, n+k) of L := [S^T | L22 at columns n..n+k]

The new rows land on whichever device(s) own that row range (they may
straddle a shard boundary), handled with a masked per-row gather — no
re-sharding, no gather of L.
"""

from __future__ import annotations

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
from jax.sharding import Mesh, PartitionSpec as P

from ..ops.cholesky import _unblocked_cholesky_substitute
from ..ops.covariance import (
    cross_covariance, cross_covariance_train_padded, kernel_diag,
)
from .distributed_solve import distributed_solve_lower

import functools

import jax

Array = jnp.ndarray


@functools.lru_cache(maxsize=64)
def _build_row_write_program(mesh, cap, k, local_rows):
    """Cached shard_map program for the masked owner-row write."""
    axes = tuple(mesh.axis_names)

    def body(l_local, new_rows_rep, n_rep):
        rank = lax.axis_index(axes)
        row0 = rank * local_rows
        rows_global = row0 + jnp.arange(local_rows)
        n_v = n_rep[0]
        in_range = (rows_global >= n_v) & (rows_global < n_v + k)
        idx = jnp.clip(rows_global - n_v, 0, k - 1)
        candidate = jnp.take(new_rows_rep, idx, axis=0)  # (local_rows, cap)
        return jnp.where(in_range[:, None], candidate, l_local)

    spec_rows = P(axes if len(axes) > 1 else axes[0])
    fn = shard_map(
        body, mesh=mesh, in_specs=(spec_rows, P(), P()), out_specs=spec_rows,
        check_rep=False,
    )
    return jax.jit(fn)


def distributed_cholesky_append(
    mesh: Mesh,
    l_sharded: Array,
    kernel,
    x_pad: Array,
    n,
    x_new: Array,
    noise,
    eps=None,
    block: int = 512,
    method: str = "gram",
) -> Array:
    """Append ``k = x_new.shape[0]`` rows to the row-sharded factor.

    ``x_pad`` must already contain the new rows at positions [n, n+k) and
    capacity must cover n+k. Returns the updated row-sharded factor.
    """
    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    cap = x_pad.shape[0]
    k = x_new.shape[0]
    local_rows = cap // n_dev

    c = cross_covariance_train_padded(kernel, x_pad, n, x_new, method=method)
    s = distributed_solve_lower(mesh, l_sharded, c, block)  # (cap, k) replicated
    k22 = cross_covariance(kernel, x_new, x_new, method=method)
    # analytic diagonal: see ops/covariance.train_covariance_padded
    kd = kernel_diag(kernel, x_new) + noise * noise
    idx = jnp.arange(k)
    k22 = jnp.where(idx[:, None] == idx[None, :], kd[:, None], k22)
    m22 = k22 - s.T @ s
    if eps is None:
        l22 = jnp.linalg.cholesky(m22)
    else:
        l22 = _unblocked_cholesky_substitute(m22, eps)

    # replicated k x cap block of new rows: S^T with L22 spliced at column n
    new_rows = s.T
    new_rows = lax.dynamic_update_slice(
        new_rows, l22, (jnp.zeros_like(jnp.asarray(n)), jnp.asarray(n))
    )

    fn = _build_row_write_program(mesh, cap, k, local_rows)
    return fn(l_sharded, new_rows, jnp.asarray([n], jnp.int32))
