"""Large-scale exact GP over a device mesh (BASELINE config 5).

End-to-end large-n path combining the distributed pieces:

- **build**: row-sharded streamed Cholesky (``distributed_cholesky.py``) —
  K never materialized, factor stays sharded;
- **predict**: SHARD-LOCAL covariance strips (each device builds its
  cap/D rows) + distributed triangular sweeps (``distributed_solve.py``),
  with the query-independent solves (beta = L^-1 r, alpha = K^-1 r) cached
  per trained state: mean-only predicts run ZERO distributed sweeps (no
  per-panel collectives at all), mean+variance exactly one;
- **fit**: the reference's scaled ADAM rules (``optimizer.rs:211-283``)
  with the two O(n^3)-dense quantities replaced by factor-based solves and
  a Hutchinson trace estimator:
      alpha            = K^-1 r           (two distributed sweeps)
      scale            = r.alpha / n       (exact, as optimizer.rs:174)
      alpha^T dK alpha                      (streamed dK matvec — exact)
      tr(K^-1 dK_p)   ~= mean_z (K^-1 z)^T (dK_p z),  z Rademacher
  This is the standard unbiased estimator (cf. GPyTorch/arXiv:1809.11165);
  the small-n exact path remains the parity reference. Fixed probe seeds
  make the fit deterministic. The whole fit iteration — gradient terms,
  ADAM update, kernel/noise update, re-factorization — is ONE jitted
  device program; the host syncs only the (progress, ok) stop booleans.

The reference caps out at what one CPU core can factor; this module is the
capability it lacks, so there is no parity target — correctness is checked
against the single-device engine at overlapping sizes.
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh

from ..config import DEFAULT_CONVERGENCE_FRACTION, DEFAULT_MAX_ITER, DEFAULT_MAX_TIME
from ..models.optimizer import ADAM_EPS, AdamState, _adam_delta
from ..ops.covariance import kernel_diag
from ..ops.streamed_matvec import streamed_grad_matvec
from ..utils.errors import CholeskyError
from .distributed_cholesky import distributed_cholesky_factor
from .distributed_solve import (
    distributed_cho_solve,
    distributed_cross_covariance,
    distributed_solve_lower,
    distributed_solve_lower_sharded_rhs,
    distributed_solve_lower_t,
)

Array = jnp.ndarray


class LargeScaleGP:
    """Exact GP whose factor lives row-sharded across a mesh.

    API mirrors the core ``GaussianProcess`` where it makes sense at scale:
    ``predict``, ``predict_variance``, ``predict_mean_variance``,
    ``log_marginal_likelihood``, ``fit_scaled`` (hyperparameter fit).
    """

    def __init__(
        self,
        mesh: Mesh,
        kernel,
        prior,
        noise: float,
        x: Array,
        y: Array,
        eps: Optional[float] = None,
        block: int = 512,
        method: str = "gram",
        capacity: Optional[int] = None,
        storage: Optional[str] = None,
    ):
        self.mesh = mesh
        self.kernel = kernel
        self.prior = prior
        self.block = block
        self.method = method
        self.eps = eps
        # "bf16": store the sharded factor in bfloat16 (f32 compute) —
        # halves per-device factor HBM (double the capacity per chip) and
        # halves the per-panel ICI broadcast; see
        # distributed_cholesky_factor. add_samples REBUILDS under this
        # mode (rank-updates against the rounded factor go indefinite —
        # models/gp.add_samples_rebuild has the measurement).
        self.storage = storage
        n, d = x.shape
        cap = max(capacity or n, n)
        if cap % mesh.size:
            cap = (cap // mesh.size + 1) * mesh.size
        self.n = n
        self.x = jnp.zeros((cap, d), x.dtype).at[:n].set(x)
        resid = y - prior.mean(x)
        self.resid = jnp.zeros((cap,), x.dtype).at[:n].set(resid)
        self.noise = jnp.asarray(noise, x.dtype)
        self._factor()

    # -- factorization -----------------------------------------------------

    def _factor(self) -> None:
        self.l_sharded, ok = distributed_cholesky_factor(
            self.mesh, self.kernel, self.x, self.n, self.noise,
            eps=self.eps, block=self.block, method=self.method,
            storage=self.storage,
        )
        self._cached_weights = None
        if not bool(ok):
            raise CholeskyError()

    # -- cached predict weights ----------------------------------------------

    @property
    def _weights(self) -> tuple[Array, Array]:
        """``(beta, alpha) = (L^-1 r, K^-1 r)`` — the query-independent
        solves, derived once per (factor, residuals) pair and reused across
        predict/score calls (mirrors ``models.derive_weights`` at scale;
        the reference re-solves per call, ``mod.rs:226-244``).

        At pod scale this matters more than on one chip: a sweep-free
        mean-only predict runs ZERO distributed sweeps — no per-panel
        collectives at all, just the shard-local strip build and one
        GEMM+psum — and mean+variance drops from two sweeps to one."""
        if self._cached_weights is None:
            beta = distributed_solve_lower(
                self.mesh, self.l_sharded, self.resid[:, None], self.block
            )[:, 0]
            alpha = distributed_solve_lower_t(
                self.mesh, self.l_sharded, beta[:, None], self.block
            )[:, 0]
            self._cached_weights = (beta, alpha)
        return self._cached_weights

    # -- prediction ---------------------------------------------------------

    def _cross(self, xq: Array) -> Array:
        """Row-SHARDED cross-covariance strip: each device builds only its
        cap/D rows (the round-1 version built the full strip replicated on
        every device — n*m redundant work and memory per device)."""
        return distributed_cross_covariance(
            self.mesh, self.kernel, self.x, self.n, xq, method=self.method
        )

    def _solve_lower_strip(self, c_sharded: Array) -> Array:
        return distributed_solve_lower_sharded_rhs(
            self.mesh, self.l_sharded, c_sharded, self.block
        )

    def predict(self, xq: Array) -> Array:
        """Sweep-free mean: shard-local strip + one GEMM against the cached
        ``K^-1 resid`` (``c^T alpha`` ≡ the legacy ``w^T resid``)."""
        _, alpha = self._weights
        c = self._cross(xq)
        return self.prior.mean(xq) + c.T @ alpha

    def predict_variance(self, xq: Array) -> Array:
        kl = self._solve_lower_strip(self._cross(xq))
        return kernel_diag(self.kernel, xq) - jnp.sum(kl * kl, axis=0)

    def predict_mean_variance(self, xq: Array) -> tuple[Array, Array]:
        """ONE distributed forward sweep serves both moments: the mean is
        ``kl^T beta`` (≡ ``w^T resid``), the variance ``sum kl^2``."""
        beta, _ = self._weights
        kl = self._solve_lower_strip(self._cross(xq))
        mean = self.prior.mean(xq) + kl.T @ beta
        var = kernel_diag(self.kernel, xq) - jnp.sum(kl * kl, axis=0)
        return mean, var

    # -- incremental update -------------------------------------------------

    def _grow_buffers(self, new_capacity: int) -> bool:
        """Grow the DATA buffers only (no factorization); returns whether
        growth happened. The factor is stale (old capacity) until the
        caller re-factors."""
        cap = self.x.shape[0]
        if new_capacity <= cap:
            return False
        if new_capacity % self.mesh.size:
            new_capacity = (
                new_capacity // self.mesh.size + 1
            ) * self.mesh.size
        d = self.x.shape[1]
        self.x = jnp.zeros((new_capacity, d), self.x.dtype).at[:cap].set(self.x)
        self.resid = (
            jnp.zeros((new_capacity,), self.resid.dtype).at[:cap].set(self.resid)
        )
        return True

    def grow(self, new_capacity: int) -> None:
        """Re-shard to a larger capacity and REBUILD the factor (O(n^3) —
        growth at scale cannot reuse the old sharding; reserve capacity up
        front when possible)."""
        if self._grow_buffers(new_capacity):
            self._factor()

    def add_samples(self, x_new: Array, y_new: Array, auto_grow: bool = False) -> None:
        """O(n^2 k) distributed rank-k append (``add_samples`` at scale).

        Requires pre-reserved capacity (``capacity=`` at construction); with
        ``auto_grow=True`` an overflow triggers a 1.5x re-sharded REBUILD
        (O(n^3)) instead of raising.
        """
        from .distributed_append import distributed_cholesky_append

        x_new = jnp.asarray(x_new, self.x.dtype)
        y_new = jnp.asarray(y_new, self.resid.dtype)
        k = x_new.shape[0]
        cap = self.x.shape[0]
        grew = False
        if self.n + k > cap:
            if not auto_grow:
                raise ValueError(
                    f"capacity {cap} exceeded ({self.n}+{k}); construct with "
                    f"a larger `capacity`, call grow(), or pass "
                    f"auto_grow=True (re-sharded growth rebuilds in O(n^3))"
                )
            new_cap = max(self.n + k, int(cap * 1.5))
            if self.storage == "bf16":
                # the bf16 append refactorizes anyway — grow the buffers
                # only, so growth + append cost ONE factorization, not two
                grew = self._grow_buffers(new_cap)
            else:
                self.grow(new_cap)
            cap = self.x.shape[0]
        self.x = self.x.at[self.n : self.n + k].set(x_new)
        self.resid = self.resid.at[self.n : self.n + k].set(
            y_new - self.prior.mean(x_new)
        )
        if self.storage == "bf16":
            # rank-updates against the ROUNDED factor go indefinite (see
            # models/gp.add_samples_rebuild) — refactorize: O(n^3); compute
            # the new factor FIRST and commit only if it validates (the
            # current+new bf16 factors together cost one f32 factor)
            new_l, ok = distributed_cholesky_factor(
                self.mesh, self.kernel, self.x, self.n + k, self.noise,
                eps=self.eps, block=self.block, method=self.method,
                storage=self.storage,
            )
            if not bool(ok):
                self.x = self.x.at[self.n : self.n + k].set(0.0)
                self.resid = self.resid.at[self.n : self.n + k].set(0.0)
                if grew:
                    # the factor is stale at the pre-growth capacity;
                    # re-factor the old data at the new sharding so the
                    # model stays usable
                    self._factor()
                raise CholeskyError(
                    "distributed add_samples: refactorization with the new "
                    "points failed; consider `cholesky_epsilon` or more "
                    "noise. The model was left unchanged."
                )
            self.l_sharded = new_l
            self.n += k
            self._cached_weights = None
            return
        new_l = distributed_cholesky_append(
            self.mesh, self.l_sharded, self.kernel, self.x, self.n, x_new,
            self.noise, eps=self.eps, block=self.block, method=self.method,
        )
        diag = jax.jit(jnp.diagonal)(new_l)
        if not bool(jnp.all(jnp.isfinite(diag))):
            # roll back the staged inputs; the model stays usable
            self.x = self.x.at[self.n : self.n + k].set(0.0)
            self.resid = self.resid.at[self.n : self.n + k].set(0.0)
            raise CholeskyError(
                "distributed add_samples: rank-update failed (appended "
                "points make the covariance non-PSD); consider "
                "`cholesky_epsilon` or more noise. The model was left "
                "unchanged."
            )
        self.l_sharded = new_l
        self.n += k
        self._cached_weights = None

    def predict_in_batches(
        self, xq: Array, batch_size: int = 8192
    ) -> tuple[Array, Array]:
        """(mean, variance) for very large query sets in fixed chunks — the
        bulk-scoring path at scale (mirrors the single-device API)."""
        m = xq.shape[0]
        means, variances = [], []
        for lo in range(0, m, batch_size):
            chunk = xq[lo : lo + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad and m > batch_size:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, xq.shape[1]), xq.dtype)]
                )
            mean, var = self.predict_mean_variance(chunk)
            if pad and m > batch_size:
                mean, var = mean[:-pad], var[:-pad]
            means.append(mean)
            variances.append(var)
        return jnp.concatenate(means), jnp.concatenate(variances)

    def sample_at(self, xq: Array):
        """Posterior sampler at ``xq`` (m x m covariance is dense — m stays
        modest even when n is huge). Mirrors ``mod.rs:371-392`` (triangular
        form of the posterior covariance)."""
        from ..models.multivariate_normal import MultivariateNormal
        from ..ops.covariance import cross_covariance

        beta, _ = self._weights
        kl = self._solve_lower_strip(self._cross(xq))
        kqq = cross_covariance(self.kernel, xq, xq, method=self.method)
        cov = kqq - kl.T @ kl
        mean = self.prior.mean(xq) + kl.T @ beta
        return MultivariateNormal(mean, cov)

    # -- scores --------------------------------------------------------------

    def likelihood(self) -> float:
        """The reference's approximate likelihood (``mod.rs:196-220``),
        replicated at scale: complexity term sums ``ln|k(x_i,x_i)+noise^2|``
        over live points. Uses the cached ``beta = L^-1 r`` (no sweep)."""
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
        # diagonal extracted on-device (SPMD-safe; never pulls the (cap, cap)
        # sharded factor to the host)
        diag = jax.jit(jnp.diagonal)(self.l_sharded)[: self.n]
        logdet = 2.0 * float(jnp.sum(jnp.log(diag.astype(self.x.dtype))))
        return -(data_fit + logdet + self.n * float(np.log(2 * np.pi))) / 2.0

    # -- hyperparameter fit ----------------------------------------------------

    def _probes(self, num_probes: int, seed: int) -> Array:
        """Fixed-seed Rademacher probes, zeroed on dead rows (shared by both
        fit paths so results are reproducible across them)."""
        cap = self.x.shape[0]
        key = jax.random.PRNGKey(seed)
        probes = jnp.sign(
            jax.random.normal(key, (cap, num_probes), dtype=self.x.dtype)
        )
        live = (jnp.arange(cap) < self.n)[:, None]
        return jnp.where(live, probes, 0.0)

    def _gradient_terms_inner(self, l_sharded, kernel, resid, probes):
        """alpha = K^-1 r (distributed sweeps), exact data-fit terms via
        streamed dK matvecs, and Hutchinson complexity terms
        tr(K^-1 dK_p) ~= mean_z (K^-1 z).(dK_p z). Pure — traceable inside
        the jitted fit step."""
        alpha = distributed_cho_solve(
            self.mesh, l_sharded, resid[:, None], self.block
        )[:, 0]
        dk_alpha = streamed_grad_matvec(
            kernel, self.x, self.n, alpha, method=self.method
        )
        data_fit = dk_alpha @ alpha
        kinv_z = distributed_cho_solve(self.mesh, l_sharded, probes, self.block)
        dk_z = streamed_grad_matvec(
            kernel, self.x, self.n, probes, method=self.method
        )
        complexity = jnp.mean(jnp.einsum("is,pis->ps", kinv_z, dk_z), axis=1)
        return alpha, data_fit, complexity, kinv_z

    def _gradient_terms(self, probes: Array):
        return self._gradient_terms_inner(
            self.l_sharded, self.kernel, self.resid, probes
        )

    def _make_fit_step(self, scaled: bool, convergence_fraction: float):
        """ONE jitted device program per fit iteration: gradient terms,
        ADAM update, kernel/noise update, and the distributed re-factor —
        no host round-trips inside (the round-1 loop pulled ``scale`` with
        ``float()`` and re-entered jit per call). The host syncs only the
        (progress, ok) booleans for the stop rule, like the reference's
        host-side convergence check (``optimizer.rs:120,138``)."""
        mesh, block, method, eps = self.mesh, self.block, self.method, self.eps
        storage = self.storage
        x, n = self.x, self.n
        conv = convergence_fraction

        @jax.jit
        def step_scaled(l_sharded, kernel, noise, resid, adam, probes, i):
            alpha, data_fit, complexity, _ = self._gradient_terms_inner(
                l_sharded, kernel, resid, probes
            )
            scale = (resid @ alpha) / jnp.asarray(self.n, alpha.dtype)
            grads = (data_fit / scale - complexity) / 2.0
            adam, delta = _adam_delta(adam, grads, i)
            progress = jnp.any(jnp.abs(delta) > conv)
            kernel = kernel.with_params(adam.params).rescale(scale)
            noise = noise * scale
            adam = adam.replace(params=kernel.get_params())
            l_new, ok = distributed_cholesky_factor(
                mesh, kernel, x, n, noise, eps=eps, block=block,
                method=method, storage=storage,
            )
            return l_new, kernel, noise, adam, progress, ok

        @jax.jit
        def step_generic(l_sharded, kernel, noise, resid, adam, probes, i):
            alpha, data_fit, complexity, kinv_z = self._gradient_terms_inner(
                l_sharded, kernel, resid, probes
            )
            grads_kernel = (data_fit - complexity) / 2.0
            # noise gradient (optimizer.rs:52-57) with Hutchinson trace and
            # the log-space correction (optimizer.rs:105-110)
            tr_kinv = jnp.mean(jnp.einsum("is,is->s", probes, kinv_z))
            noise_grad = noise * (alpha @ alpha - tr_kinv) * noise
            grads = jnp.concatenate([grads_kernel, noise_grad[None]])
            adam, delta = _adam_delta(adam, grads, i)
            progress = jnp.any(jnp.abs(delta) > conv)
            kernel = kernel.with_params(adam.params[:-1])
            noise = jnp.exp(adam.params[-1])
            l_new, ok = distributed_cholesky_factor(
                mesh, kernel, x, n, noise, eps=eps, block=block,
                method=method, storage=storage,
            )
            return l_new, kernel, noise, adam, progress, ok

        return step_scaled if scaled else step_generic

    def _run_fit(self, step, adam, probes, max_iter, max_time):
        t0 = time.monotonic()
        for i in range(1, max_iter + 1):
            l_new, kernel, noise, adam, progress, ok = step(
                self.l_sharded, self.kernel, self.noise, self.resid, adam,
                probes, jnp.asarray(i),
            )
            if not bool(ok):
                raise CholeskyError(
                    "distributed fit: factorization failed at the updated "
                    "hyperparameters; consider `cholesky_epsilon`."
                )
            self.l_sharded, self.kernel, self.noise = l_new, kernel, noise
            self._cached_weights = None
            if (not bool(progress)) or (time.monotonic() - t0 > max_time):
                break

    def fit_scaled(
        self,
        max_iter: int = DEFAULT_MAX_ITER,
        convergence_fraction: float = DEFAULT_CONVERGENCE_FRACTION,
        max_time: float = DEFAULT_MAX_TIME,
        num_probes: int = 8,
        seed: int = 0,
    ) -> None:
        """Scaled ADAM fit (``optimizer.rs:211-283`` rules) with Hutchinson
        trace estimates; requires a scalable kernel."""
        if not self.kernel.is_scalable:
            raise NotImplementedError(
                "large-scale fit currently implements the scaled path "
                "(scalable kernels: SquaredExp/Exponential/Matern)"
            )
        probes = self._probes(num_probes, seed)
        params = self.kernel.get_params()
        params = jnp.where(params == 0.0, ADAM_EPS, params)
        adam = AdamState(
            params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params)
        )
        step = self._make_fit_step(True, convergence_fraction)
        self._run_fit(step, adam, probes, max_iter, max_time)

    def fit_generic(
        self,
        max_iter: int = DEFAULT_MAX_ITER,
        convergence_fraction: float = DEFAULT_CONVERGENCE_FRACTION,
        max_time: float = DEFAULT_MAX_TIME,
        num_probes: int = 8,
        seed: int = 0,
    ) -> None:
        """Generic-path ADAM fit (``optimizer.rs:69-149`` rules) at scale:
        any kernel, noise fitted in log-space; ``tr(K^-1 dK)`` and
        ``tr(K^-1)`` via the fixed-seed Hutchinson estimator with
        distributed solves."""
        probes = self._probes(num_probes, seed)
        kparams = self.kernel.get_params()
        kparams = jnp.where(kparams == 0.0, ADAM_EPS, kparams)
        params = jnp.concatenate([kparams, jnp.log(self.noise)[None]])
        adam = AdamState(
            params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params)
        )
        step = self._make_fit_step(False, convergence_fraction)
        self._run_fit(step, adam, probes, max_iter, max_time)
