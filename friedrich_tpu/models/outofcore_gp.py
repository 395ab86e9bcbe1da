"""Out-of-core exact GP: factor in host RAM, compute on one device.

``LargeScaleGP`` scales exact GPs by sharding the factor across a mesh;
``OutOfCoreGP`` scales them on ONE chip by keeping the factor in host
memory (``ops/outofcore.py``) — n is bounded by host RAM (125 GB here =
n~170k f32, ~240k bf16) and the host-link bandwidth, not by the 16 GB
HBM. The predict surface mirrors ``GaussianProcess`` where it makes
sense at this scale (reference ``gaussian_process/mod.rs:226-350``):

- ``predict`` (mean) is sweep-free after the first call: the cached
  ``alpha = K^-1 r`` makes each batch one device strip build + GEMM — L
  is never touched again.
- ``predict_variance`` / ``predict_mean_variance`` stream L once per
  batch (one forward sweep, cap^2 factor bytes over the host link).
- ``add_samples`` rebuilds (O(n^3)) — an out-of-core rank-update would
  stream the whole factor anyway, and the rebuild keeps exactly the
  rounding story of the streamed builders.

Hyperparameter FITTING at this scale should use ``LargeScaleGP`` on a
mesh or the MCMC stack; rebuilding per fit iteration through the host
link is possible (``set_hyperparameters``) but link-bound.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.covariance import cross_covariance_train_padded, kernel_diag
from ..ops.outofcore import (
    outofcore_cholesky_factor,
    outofcore_solve_lower,
    outofcore_solve_lower_t,
)
from ..utils.errors import CholeskyError

Array = jnp.ndarray


class OutOfCoreGP:
    """Exact GP whose Cholesky factor lives in host memory."""

    def __init__(
        self,
        kernel,
        prior,
        noise: float,
        x: Array,
        y: Array,
        eps: Optional[float] = None,
        block: int = 4096,
        method: str = "gram",
        storage: Optional[str] = None,
        capacity: Optional[int] = None,
    ):
        self.kernel = kernel
        self.prior = prior
        self.block = block
        self.method = method
        self.eps = eps
        self.storage = storage
        x = jnp.asarray(x, jnp.float32)
        y = jnp.asarray(y, jnp.float32)
        n, d = x.shape
        cap = max(capacity or n, n)
        self.n = n
        self.x = jnp.zeros((cap, d), jnp.float32).at[:n].set(x)
        resid = y - prior.mean(x)
        self.resid = jnp.zeros((cap,), jnp.float32).at[:n].set(resid)
        self.noise = jnp.asarray(noise, jnp.float32)
        self._factor()

    # -- factorization -------------------------------------------------------

    def _factor(self) -> None:
        self.l_host, ok = outofcore_cholesky_factor(
            self.kernel, self.x, self.n, self.noise, eps=self.eps,
            block=self.block, method=self.method, storage=self.storage,
        )
        self._cached_weights = None
        if not ok:
            raise CholeskyError()

    # -- cached predict weights ----------------------------------------------

    @property
    def _weights(self) -> tuple[Array, Array]:
        """``(beta, alpha) = (L^-1 r, K^-1 r)`` — two streamed sweeps, paid
        once per trained state (see ``models.gp.derive_weights``)."""
        if self._cached_weights is None:
            beta = outofcore_solve_lower(self.l_host, self.resid)
            alpha = outofcore_solve_lower_t(self.l_host, beta)
            self._cached_weights = (beta, alpha)
        return self._cached_weights

    # -- prediction -----------------------------------------------------------

    def _cross(self, xq: Array) -> Array:
        return cross_covariance_train_padded(
            self.kernel, self.x, self.n, jnp.asarray(xq, jnp.float32),
            method=self.method,
        )

    def predict(self, xq: Array) -> Array:
        """Posterior mean — L-free per batch: one strip + one GEMM against
        the cached ``K^-1 resid``."""
        _, alpha = self._weights
        return self.prior.mean(xq) + self._cross(xq).T @ alpha

    def predict_variance(self, xq: Array) -> Array:
        kl = outofcore_solve_lower(self.l_host, self._cross(xq))
        return kernel_diag(self.kernel, xq) - jnp.sum(kl * kl, axis=0)

    def predict_mean_variance(self, xq: Array) -> tuple[Array, Array]:
        """ONE streamed forward sweep serves both moments."""
        beta, _ = self._weights
        kl = outofcore_solve_lower(self.l_host, self._cross(xq))
        mean = self.prior.mean(xq) + kl.T @ beta
        var = kernel_diag(self.kernel, xq) - jnp.sum(kl * kl, axis=0)
        return mean, var

    def predict_in_batches(
        self, xq: Array, batch_size: int = 8192
    ) -> tuple[Array, Array]:
        m = xq.shape[0]
        means, variances = [], []
        for lo in range(0, m, batch_size):
            mean, var = self.predict_mean_variance(xq[lo : lo + batch_size])
            means.append(mean)
            variances.append(var)
        return jnp.concatenate(means), jnp.concatenate(variances)

    def sample_at(self, xq: Array):
        """Posterior sampler at ``xq`` (m x m covariance stays dense)."""
        from ..ops.covariance import cross_covariance
        from .multivariate_normal import MultivariateNormal

        beta, _ = self._weights
        kl = outofcore_solve_lower(self.l_host, self._cross(xq))
        kqq = cross_covariance(self.kernel, xq, xq, method=self.method)
        cov = kqq - kl.T @ kl
        mean = self.prior.mean(xq) + kl.T @ beta
        return MultivariateNormal(mean, cov)

    # -- scores ----------------------------------------------------------------

    def likelihood(self) -> float:
        """The reference's approximate score (``mod.rs:196-220``)."""
        ol = self._weights[0]
        data_fit = float(jnp.sum(ol * ol))
        diag = kernel_diag(self.kernel, self.x) + self.noise * self.noise
        live = jnp.arange(self.x.shape[0]) < self.n
        complexity = float(
            jnp.sum(jnp.where(live, jnp.log(jnp.abs(diag)), 0.0))
        )
        return -(
            data_fit + complexity + self.n * float(np.log(2 * np.pi))
        ) / 2.0

    def log_marginal_likelihood(self) -> float:
        ol = self._weights[0]
        data_fit = float(jnp.sum(ol * ol))
        diag = np.diagonal(self.l_host)[: self.n].astype(np.float64)
        logdet = 2.0 * float(np.sum(np.log(diag)))
        return -(data_fit + logdet + self.n * float(np.log(2 * np.pi))) / 2.0

    # -- mutation ---------------------------------------------------------------

    def add_samples(self, x_new: Array, y_new: Array) -> None:
        """Append by refactorization (O(n^3)); grows capacity x1.5 when
        exceeded. An out-of-core rank-update would stream all of L anyway
        (O(n^2) link bytes for O(n^2 k) FLOPs — link-bound), so the
        rebuild keeps the code honest and the rounding story uniform."""
        x_new = jnp.asarray(x_new, jnp.float32)
        y_new = jnp.asarray(y_new, jnp.float32)
        k = x_new.shape[0]
        cap = self.x.shape[0]
        if self.n + k > cap:
            new_cap = max(self.n + k, math.ceil(cap * 1.5))
            d = self.x.shape[1]
            self.x = (
                jnp.zeros((new_cap, d), jnp.float32).at[:cap].set(self.x)
            )
            self.resid = (
                jnp.zeros((new_cap,), jnp.float32).at[:cap].set(self.resid)
            )
        self.x = self.x.at[self.n : self.n + k].set(x_new)
        self.resid = self.resid.at[self.n : self.n + k].set(
            y_new - self.prior.mean(x_new)
        )
        n_old = self.n
        self.n += k
        try:
            self._factor()
        except CholeskyError:
            self.n = n_old
            self.x = self.x.at[n_old : n_old + k].set(0.0)
            self.resid = self.resid.at[n_old : n_old + k].set(0.0)
            self._factor()  # old data refactors (it did before)
            raise CholeskyError(
                "add_samples: refactorization with the new points failed; "
                "consider `cholesky_epsilon` or more noise. The model was "
                "restored."
            )

    def set_hyperparameters(self, kernel=None, noise: Optional[float] = None,
                            prior=None) -> None:
        """Replace kernel/noise/prior and rebuild the host factor."""
        if prior is not None:
            live = jnp.arange(self.x.shape[0]) < self.n
            y_pad = self.resid + jnp.where(
                live, self.prior.mean(self.x), 0.0
            )
            self.prior = prior
            self.resid = jnp.where(live, y_pad - prior.mean(self.x), 0.0)
        if kernel is not None:
            self.kernel = kernel
        if noise is not None:
            self.noise = jnp.asarray(noise, jnp.float32)
        self._factor()
