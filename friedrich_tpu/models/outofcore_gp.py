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

Hyperparameter FITTING: ``fit_scaled`` / ``fit_generic`` run the same
Hutchinson-trace ADAM as ``LargeScaleGP`` (``optimizer.rs:211-283`` /
``:69-149`` rules), with the solves streamed through the host factor and
the per-iteration rebuild paying the factorization's link traffic — the
fit is link-bound on real PCIe but exact in the same sense.
"""

from __future__ import annotations

import math
from typing import Optional

import jax.numpy as jnp
import numpy as np

from ..ops.covariance import cross_covariance_train_padded, kernel_diag
from ..ops.outofcore import (
    outofcore_cho_solve,
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

    # -- hyperparameter fit ------------------------------------------------------

    def _probes(self, num_probes: int, seed: int) -> Array:
        """Fixed-seed Rademacher probes, zeroed on dead rows — IDENTICAL to
        ``LargeScaleGP._probes`` so the two engines' fits are comparable."""
        import jax

        cap = self.x.shape[0]
        key = jax.random.PRNGKey(seed)
        probes = jnp.sign(
            jax.random.normal(key, (cap, num_probes), dtype=self.x.dtype)
        )
        live = (jnp.arange(cap) < self.n)[:, None]
        return jnp.where(live, probes, 0.0)

    def _gradient_terms(self, probes: Array):
        """Same estimator as ``LargeScaleGP._gradient_terms_inner`` with the
        solves streamed through the host factor: ``alpha = K^-1 r``, exact
        data-fit via streamed dK matvecs, Hutchinson ``tr(K^-1 dK_p)``."""
        from ..ops.streamed_matvec import streamed_grad_matvec

        alpha = outofcore_cho_solve(self.l_host, self.resid)
        dk_alpha = streamed_grad_matvec(
            self.kernel, self.x, self.n, alpha, method=self.method
        )
        data_fit = dk_alpha @ alpha
        kinv_z = outofcore_cho_solve(self.l_host, probes)
        dk_z = streamed_grad_matvec(
            self.kernel, self.x, self.n, probes, method=self.method
        )
        complexity = jnp.mean(jnp.einsum("is,pis->ps", kinv_z, dk_z), axis=1)
        return alpha, data_fit, complexity, kinv_z

    def _run_fit(self, scaled: bool, max_iter, convergence_fraction,
                 max_time, num_probes, seed) -> None:
        import time as _time

        from .optimizer import ADAM_EPS, AdamState, _adam_delta

        probes = self._probes(num_probes, seed)
        kparams = self.kernel.get_params()
        kparams = jnp.where(kparams == 0.0, ADAM_EPS, kparams)
        if scaled:
            params = kparams
        else:
            params = jnp.concatenate([kparams, jnp.log(self.noise)[None]])
        adam = AdamState(
            params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params)
        )
        t0 = _time.monotonic()
        for i in range(1, max_iter + 1):
            alpha, data_fit, complexity, kinv_z = self._gradient_terms(probes)
            if scaled:
                scale = (self.resid @ alpha) / jnp.asarray(
                    self.n, alpha.dtype
                )
                grads = (data_fit / scale - complexity) / 2.0
                adam, delta = _adam_delta(adam, grads, jnp.asarray(i))
                self.kernel = self.kernel.with_params(adam.params).rescale(
                    scale
                )
                self.noise = self.noise * scale
                adam = adam.replace(params=self.kernel.get_params())
            else:
                grads_kernel = (data_fit - complexity) / 2.0
                tr_kinv = jnp.mean(jnp.einsum("is,is->s", probes, kinv_z))
                noise_grad = (
                    self.noise * (alpha @ alpha - tr_kinv) * self.noise
                )
                grads = jnp.concatenate([grads_kernel, noise_grad[None]])
                adam, delta = _adam_delta(adam, grads, jnp.asarray(i))
                self.kernel = self.kernel.with_params(adam.params[:-1])
                self.noise = jnp.exp(adam.params[-1])
            progress = bool(jnp.any(jnp.abs(delta) > convergence_fraction))
            try:
                self._factor()
            except CholeskyError:
                raise CholeskyError(
                    "out-of-core fit: factorization failed at the updated "
                    "hyperparameters; consider `cholesky_epsilon`."
                )
            if (not progress) or (_time.monotonic() - t0 > max_time):
                break

    def fit_scaled(self, max_iter: int = 100,
                   convergence_fraction: float = 0.05,
                   max_time: float = 3600.0, num_probes: int = 8,
                   seed: int = 0) -> None:
        """Scaled ADAM fit (``optimizer.rs:211-283`` rules) — scalable
        kernels only; solves stream through the host factor."""
        if not self.kernel.is_scalable:
            raise NotImplementedError(
                "fit_scaled needs a scalable kernel "
                "(SquaredExp/Exponential/Matern); use fit_generic"
            )
        self._run_fit(True, max_iter, convergence_fraction, max_time,
                      num_probes, seed)

    def fit_generic(self, max_iter: int = 100,
                    convergence_fraction: float = 0.05,
                    max_time: float = 3600.0, num_probes: int = 8,
                    seed: int = 0) -> None:
        """Generic-path ADAM fit (``optimizer.rs:69-149`` rules): any
        kernel, noise fitted in log-space."""
        self._run_fit(False, max_iter, convergence_fraction, max_time,
                      num_probes, seed)

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
