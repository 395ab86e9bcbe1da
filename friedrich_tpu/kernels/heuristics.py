"""Heuristic hyperparameter initialization.

Reference: ``parameters/kernel.rs:94-119``. The reference computes the mean
pairwise distance with a double loop over the strict upper triangle (O(n^2 d)
scalar ops, ``kernel.rs:98-105``); here it is a single vectorized pairwise
distance matrix (one MXU GEMM) and a masked reduction.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..ops.distance import DIST, pairwise_features

Array = jnp.ndarray


def fit_bandwidth_mean(x: Array, method: str = "gram") -> Array:
    """Mean distance between distinct sample pairs (``kernel.rs:94-113``).

    Sums distances over unordered pairs i<j and divides by n(n-1)/2. The
    full symmetric distance matrix has zero diagonal, so the strict-triangle
    sum is simply half the total sum.
    """
    n = x.shape[0]
    dist = pairwise_features(x, x, frozenset({DIST}), method=method)[DIST]
    total = jnp.sum(dist) / 2.0
    nb_pairs = (n * n - n) / 2.0
    return total / nb_pairs


def fit_amplitude_var(y: Array) -> Array:
    """Population variance of the outputs (``kernel.rs:116-119``).

    nalgebra's ``variance()`` divides by n (not n-1), matching ``jnp.var``
    with ddof=0.
    """
    return jnp.var(y)
