"""Heuristic hyperparameter initialization.

Reference: ``parameters/kernel.rs:94-119``. The reference computes the mean
pairwise distance with a double loop over the strict upper triangle (O(n^2 d)
scalar ops, ``kernel.rs:98-105``); here it is a single vectorized pairwise
distance matrix (one MXU GEMM) and a masked reduction.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ..ops.distance import DIST, pairwise_features

Array = jnp.ndarray

#: Above this n the full n x n distance matrix is streamed in strips.
_STREAM_THRESHOLD = 16384


def fit_bandwidth_mean(x: Array, method: str = "gram") -> Array:
    """Mean distance between distinct sample pairs (``kernel.rs:94-113``).

    Sums distances over unordered pairs i<j and divides by n(n-1)/2. The
    full symmetric distance matrix has zero diagonal, so the strict-triangle
    sum is simply half the total sum. Large n streams the matrix in
    (n, B) strips so memory stays O(n*B).
    """
    n = x.shape[0]
    nb_pairs = (n * n - n) / 2.0
    if n > _STREAM_THRESHOLD:
        return _bandwidth_mean_streamed(x, method) / nb_pairs
    dist = pairwise_features(x, x, frozenset({DIST}), method=method)[DIST]
    total = jnp.sum(dist) / 2.0
    return total / nb_pairs


def _bandwidth_mean_streamed(x: Array, method: str, block: int = 4096) -> Array:
    from ..ops.partition import pick_block

    b = pick_block(x.shape[0], block)
    return _bandwidth_mean_streamed_impl(x, b, method)


# jitted at module level so repeated heuristic fits hit the compile cache
# — the previous per-call fori_loop closure re-traced AND re-compiled on
# every call (~6 s per heuristic_fit at n=50k through a remote compiler,
# measured in scripts/profile_fit.py, for ~50 ms of device work)
@functools.partial(jax.jit, static_argnames=("b", "method"))
def _bandwidth_mean_streamed_impl(x: Array, b: int, method: str) -> Array:
    n, d = x.shape
    num = n // b

    def strip(j, acc):
        j0 = j * b
        xj = lax.dynamic_slice(x, (j0, jnp.zeros_like(j0)), (b, d))
        dist = pairwise_features(x, xj, frozenset({DIST}), method=method)[DIST]
        return acc + jnp.sum(dist)

    total = lax.fori_loop(0, num, strip, jnp.asarray(0.0, x.dtype))
    return total / 2.0


def fit_amplitude_var(y: Array) -> Array:
    """Population variance of the outputs (``kernel.rs:116-119``).

    nalgebra's ``variance()`` divides by n (not n-1), matching ``jnp.var``
    with ddof=0.
    """
    return jnp.var(y)
