"""Posterior sampler: multivariate normal over query points.

Counterpart of the reference's ``MultivariateNormal``
(``gaussian_process/multivariate_normal.rs:44-74``): stores the mean and the
Cholesky factor of the posterior covariance; ``sample = mean + L z`` with
``z ~ N(0, I)``. Differences from the reference, both deliberate:

- sampling uses explicit JAX PRNG keys (deterministic, vmappable) instead of
  a stateful RNG;
- a failed covariance factorization raises a structured
  :class:`CholeskyError` instead of panicking (``multivariate_normal.rs:57``
  — the reference applies NO epsilon fallback here, and neither do we, for
  parity).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..conversion import OutputAdapter
from ..utils.errors import CholeskyError

Array = jnp.ndarray


class MultivariateNormal:
    """Sampleable posterior distribution at fixed query points."""

    def __init__(self, mean: Array, covariance: Array, adapter: OutputAdapter | None = None):
        self._mean = mean
        l_mat = jnp.linalg.cholesky(covariance)
        if not bool(jnp.all(jnp.isfinite(jnp.diagonal(l_mat)))):
            raise CholeskyError(
                "MultivariateNormal: Cholesky decomposition of the posterior "
                "covariance failed (it is numerically non-PSD). Add noise or "
                "query fewer/better-separated points."
            )
        self._chol = l_mat
        self._adapter = adapter or OutputAdapter("jax")

    def mean(self):
        """The distribution mean (``multivariate_normal.rs:62-65``)."""
        return self._adapter.vector(self._mean)

    def sample(self, key: jax.Array):
        """One draw: ``mean + L z`` (``multivariate_normal.rs:68-73``)."""
        z = jax.random.normal(key, self._mean.shape, dtype=self._mean.dtype)
        return self._adapter.vector(self._mean + self._chol @ z)

    def sample_n(self, key: jax.Array, num: int) -> Array:
        """Vectorized draws, shape (num, m) — TPU-native batched sampling."""
        z = jax.random.normal(key, (num,) + self._mean.shape, dtype=self._mean.dtype)
        return self._mean[None, :] + z @ self._chol.T
