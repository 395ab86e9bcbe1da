"""Out-of-core streamed Cholesky: factor in HOST RAM, compute on device.

Lifts the exact-GP size ceiling of ONE chip past its HBM: the (cap, cap)
factor lives in host memory (125 GB here vs 16 GB HBM) and only one
column panel plus one working strip are ever resident on the device. The
TPU analogue of CPU-offload training — PCIe (or the host link) streams
panels while the MXU does the n^3 work.

Same left-looking panel algorithm as ``ops/streamed.py`` (the slot of the
reference's ``make_cholesky_cov_matrix``, ``algebra/mod.rs:59-92``), with
the downdate prefix streamed FROM HOST instead of read from HBM:

    for panel j:                           (host loop, device jits)
        S = K(X, X_j)                      built on device from x
        for i < j:                         column chunks streamed in
            S -= L[:, i] @ L[j, i]^T       MXU GEMM, f32 accumulation
        factor/solve panel; download the (cap, B) strip into host L

Traffic per factorization: ~cap^2/2 * (panels) = n^3/(2B) factor bytes
down the host link (full-height chunks keep ONE compiled program; the
triangular-optimal n^3/(6B) needs height-bucketed variants — measured
irrelevant until the link is PCIe, not this environment's network
tunnel). At n=100k, B=4096, f32 that is ~200 GB => ~4 s at PCIe-gen4
rates, on par with the ~7 s of MXU compute; ``storage="bf16"`` halves
it. Device HBM: one (cap, B) strip + one (cap, B) chunk + temps — <6 GB
at n=100k.

Solves stream each column panel once per sweep (cap^2 bytes): the
fan-out (right-looking) forward sweep and the fan-in backward sweep both
consume exactly the uploaded panel. Mean-only predicts against cached
``alpha = K^-1 r`` never touch L at all (see ``models/gp.derive_weights``).
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.scipy.linalg import solve_triangular

import ml_dtypes

from .cholesky import cholesky_with_substitute, rsolve_lower_t
from .streamed import _train_cov_panel

Array = jnp.ndarray

HOST_DTYPES = {None: np.float32, "bf16": ml_dtypes.bfloat16}


@functools.partial(
    jax.jit, static_argnames=("treedef", "block", "method")
)
def _strip_build(leaves, treedef, x_pad, j0, n, noise, block, method):
    kernel = jax.tree_util.tree_unflatten(treedef, leaves)
    d = x_pad.shape[1]
    xj = lax.dynamic_slice(x_pad, (j0, jnp.zeros_like(j0)), (block, d))
    return _train_cov_panel(kernel, x_pad, xj, j0, n, noise, block, method)


@functools.partial(jax.jit, donate_argnums=(0,))
def _downdate(s, l_chunk, j0):
    """S -= L[:, i-chunk] @ L[j-rows, i-chunk]^T.

    ``l_chunk`` is a full-height (cap, C) column chunk (rows above the
    chunk's own diagonal are zero in a lower factor, and contributions to
    S rows above j0 are discarded by the panel write anyway). bf16 host
    chunks feed the MXU natively with f32 accumulation."""
    block = s.shape[1]
    l_rows = lax.dynamic_slice(
        l_chunk, (j0, jnp.zeros_like(j0)), (block, l_chunk.shape[1])
    )
    return s - jax.lax.dot_general(
        l_chunk, l_rows,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=s.dtype,
    )


@functools.partial(jax.jit, static_argnames=("eps",), donate_argnums=(0,))
def _finish_panel(s, j0, eps):
    """Factor the diagonal block at ``j0``, solve the rows below, zero the
    rows above; returns the finished (cap, B) strip."""
    cap, block = s.shape
    diag_blk = lax.dynamic_slice(s, (j0, jnp.zeros_like(j0)), (block, block))
    if eps is None:
        ld = jnp.linalg.cholesky(diag_blk)
    else:
        ld = cholesky_with_substitute(diag_blk, eps, block=128)
    t = rsolve_lower_t(ld, s)
    strip = lax.dynamic_update_slice(t, ld, (j0, jnp.zeros_like(j0)))
    rows = jnp.arange(cap)[:, None]
    return jnp.where(rows < j0, 0.0, strip)


def outofcore_cholesky_factor(
    kernel,
    x_pad: Array,
    n,
    noise,
    eps: Optional[float] = None,
    block: int = 4096,
    method: str = "gram",
    storage: Optional[str] = None,
) -> tuple[np.ndarray, bool]:
    """Fused covariance build + Cholesky with the factor in HOST memory.

    Returns ``(L_host, ok)`` — ``L_host`` is a host ``numpy`` array of
    dtype f32 (or ``ml_dtypes.bfloat16`` with ``storage="bf16"``, which
    also halves the streamed bytes). ``x_pad`` must be float32 with
    ``capacity % block == 0`` (identity padding outside the live block,
    as everywhere in this library).

    ONE compiled program per (cap, block) — the host loop drives it, so
    growing n past the device's HBM only grows host RAM and link traffic.
    """
    from .partition import pick_block

    if storage not in HOST_DTYPES:
        raise ValueError(
            f"storage must be None or 'bf16', got {storage!r}"
        )
    if x_pad.dtype != jnp.float32:
        raise ValueError(
            f"out-of-core factorization is float32-compute only, got "
            f"{x_pad.dtype}"
        )
    cap, d = x_pad.shape
    block = pick_block(cap, block)
    num_panels = cap // block
    host_dtype = HOST_DTYPES[storage]
    l_host = np.zeros((cap, cap), dtype=host_dtype)
    leaves, treedef = jax.tree_util.tree_flatten(kernel)
    leaves = tuple(jnp.asarray(v, jnp.float32) for v in leaves)
    n_arr = jnp.asarray(n, jnp.int32)
    noise_arr = jnp.asarray(noise, jnp.float32)
    x_dev = jax.device_put(x_pad)

    import os
    import sys
    import time as _time

    progress = bool(os.environ.get("FRIEDRICH_OOC_PROGRESS"))
    t_start = _time.perf_counter()
    ok = True
    for j in range(num_panels):
        if progress:
            print(
                f"[ooc] panel {j + 1}/{num_panels} "
                f"t={_time.perf_counter() - t_start:.0f}s",
                file=sys.stderr,
                flush=True,
            )
        j0 = jnp.asarray(j * block, jnp.int32)
        s = _strip_build(
            leaves, treedef, x_dev, j0, n_arr, noise_arr, block, method
        )
        for i in range(j):
            # stream one factored column chunk up; device_put is async, so
            # the next upload overlaps the current GEMM
            chunk = jax.device_put(
                l_host[:, i * block : (i + 1) * block]
            )
            s = _downdate(s, chunk, j0)
        out = _finish_panel(s, j0, eps)
        if storage == "bf16":
            # round on DEVICE so the host download carries bf16 bytes —
            # the host link (not the MXU) is this path's bottleneck, and
            # the strip download is half its total traffic
            out = out.astype(jnp.bfloat16)
        strip = np.asarray(out)
        if not np.isfinite(
            strip[j * block :].astype(np.float32, copy=False)
        ).all():
            ok = False
        l_host[:, j * block : (j + 1) * block] = strip
    return l_host, ok


@functools.partial(jax.jit, donate_argnums=(0,))
def _fwd_step(y, l_panel, j0):
    """Fan-out forward step: solve the diagonal block, then eliminate the
    panel's contribution from ALL lower rows (uses only this panel)."""
    block = l_panel.shape[1]
    m = y.shape[1]
    cap = y.shape[0]
    dtype = y.dtype
    ld = lax.dynamic_slice(
        l_panel, (j0, jnp.zeros_like(j0)), (block, block)
    ).astype(dtype)
    cj = lax.dynamic_slice(y, (j0, jnp.zeros_like(j0)), (block, m))
    yj = solve_triangular(ld, cj, lower=True)
    # zero the panel's rows [0, j0+B) so the update touches only below
    rows = jnp.arange(cap)[:, None]
    below = jnp.where(rows < j0 + block, 0.0, l_panel.astype(dtype))
    y = y - jnp.dot(below, yj, preferred_element_type=dtype)
    return lax.dynamic_update_slice(y, yj, (j0, jnp.zeros_like(j0)))


@functools.partial(jax.jit, donate_argnums=(0,))
def _bwd_step(x, l_panel, j0):
    """Fan-in backward step: rhs_j -= L[below, panel]^T x[below], then
    solve the transposed diagonal block."""
    block = l_panel.shape[1]
    m = x.shape[1]
    cap = x.shape[0]
    dtype = x.dtype
    rows = jnp.arange(cap)[:, None]
    below = jnp.where(rows < j0 + block, 0.0, l_panel.astype(dtype))
    rhs = lax.dynamic_slice(
        x, (j0, jnp.zeros_like(j0)), (block, m)
    ) - jnp.dot(below.T, x, preferred_element_type=dtype)
    ld = lax.dynamic_slice(
        l_panel, (j0, jnp.zeros_like(j0)), (block, block)
    ).astype(dtype)
    xj = solve_triangular(ld, rhs, lower=True, trans=1)
    return lax.dynamic_update_slice(x, xj, (j0, jnp.zeros_like(j0)))


def _stream_solve(l_host: np.ndarray, c: Array, transposed: bool) -> Array:
    cap = l_host.shape[0]
    c2 = c if c.ndim == 2 else c[:, None]
    if c2.dtype != jnp.float32:
        c2 = c2.astype(jnp.float32)
    # infer the panel width from a divisor-friendly default
    from .partition import pick_block

    block = pick_block(cap, 4096)
    num = cap // block
    # fresh buffer: the sweep steps DONATE their carry, and donating the
    # caller's array would delete it under them
    y = jnp.copy(c2)
    order = range(num - 1, -1, -1) if transposed else range(num)
    step = _bwd_step if transposed else _fwd_step
    for j in order:
        panel = jax.device_put(l_host[:, j * block : (j + 1) * block])
        y = step(y, panel, jnp.asarray(j * block, jnp.int32))
    return y if c.ndim == 2 else y[:, 0]


def outofcore_solve_lower(l_host: np.ndarray, c: Array) -> Array:
    """``L^-1 c`` with the factor streamed from host, one panel at a time
    (fan-out sweep: each column panel is uploaded exactly once)."""
    return _stream_solve(l_host, c, transposed=False)


def outofcore_solve_lower_t(l_host: np.ndarray, c: Array) -> Array:
    """``L^-T c`` (fan-in backward sweep, one upload per panel)."""
    return _stream_solve(l_host, c, transposed=True)


def outofcore_cho_solve(l_host: np.ndarray, c: Array) -> Array:
    """``(L L^T)^-1 c`` — two streamed sweeps (2 cap^2 bytes of traffic)."""
    return outofcore_solve_lower_t(l_host, outofcore_solve_lower(l_host, c))
