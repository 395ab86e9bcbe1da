"""User-facing GaussianProcess class (L3 API).

Object-oriented facade over the functional core in ``models/gp.py``,
mirroring the reference's public surface (``gaussian_process/mod.rs``):
``default``, ``builder``, ``new``, ``predict``, ``predict_variance``,
``predict_mean_variance``, ``predict_covariance``, ``sample_at``,
``add_samples``, ``likelihood``, ``fit_parameters`` — with the same
polymorphic input/output behavior (see ``conversion.py``).

The wrapper owns an immutable :class:`GPState` and swaps it on mutation;
all heavy computation is jitted with the state as a pytree argument, so
hyperparameter/data updates never trigger recompilation (capacity growth is
the only recompile boundary, amortized by the 1.5x policy).
"""

from __future__ import annotations

import math
from functools import partial
from typing import Any, Optional

import jax
import jax.numpy as jnp

from ..config import (
    DEFAULT_CONVERGENCE_FRACTION,
    DEFAULT_MAX_ITER,
    DEFAULT_MAX_TIME,
    GROWTH_FACTOR,
)
from ..conversion import as_input_matrix, as_output_vector
from ..utils.errors import CholeskyError, ConfigError, ShapeError
from . import gp as core
from .multivariate_normal import MultivariateNormal
from .optimizer import fit_parameters as _fit_parameters

Array = jnp.ndarray

# Module-level jitted entry points (shared across all GP instances).
_predict_mean = jax.jit(core.predict_mean)
_predict_variance = jax.jit(core.predict_variance)
_predict_mean_variance = jax.jit(core.predict_mean_variance)
_predict_covariance = jax.jit(core.predict_covariance)
_posterior = jax.jit(core.posterior)
_likelihood = jax.jit(core.likelihood)
_lml = jax.jit(core.log_marginal_likelihood)
_add_samples = jax.jit(core.add_samples_padded)
#: Frontier variant: the state's buffers (factor, data) are DONATED so
#: old and new factor never coexist — mandatory once 2 x cap^2 x itemsize
#: exceeds HBM (measured: the non-donated append OOMs at cap~51k f32 on
#: the 16 GB reference chip; it ran at cap~31k).
_add_samples_donated = jax.jit(core.add_samples_padded, donate_argnums=(0,))
_derive_weights = jax.jit(core.derive_weights)


def _append_must_donate(state: core.GPState) -> bool:
    """True when old + appended factor cannot coexist in device HBM
    (plus ~20% headroom for the append's (cap, k) temporaries)."""
    from .. import config

    if jax.default_backend() == "cpu":
        return False
    factor_bytes = state.capacity ** 2 * state.l.dtype.itemsize
    return 2 * factor_bytes > 0.85 * config.device_hbm_bytes()


@partial(jax.jit, static_argnums=(1,), donate_argnums=(0,))
def _repair_failed_append(state: core.GPState, k: int) -> core.GPState:
    """Undo a DONATED append whose validation failed: rows
    [n-k, n) of the factor go back to the identity padding (the only
    rows the append wrote; the backward sweep reads L[dead, live]^T, so
    garbage there would poison live results) and the live count returns
    to n-k. The appended x/resid rows become dead rows (masked
    everywhere)."""
    n_old = state.n - k
    cap = state.capacity
    rows = n_old + jnp.arange(k)[:, None]
    cols = jnp.arange(cap)[None, :]
    ident_rows = jnp.where(rows == cols, 1.0, 0.0).astype(state.l.dtype)
    l_fixed = jax.lax.dynamic_update_slice(
        state.l, ident_rows, (n_old, jnp.zeros_like(n_old))
    )
    return state.replace(l=l_fixed, n=n_old)


class GaussianProcess:
    """A trained Gaussian process (reference ``mod.rs:59-79``)."""

    def __init__(self, state: core.GPState):
        self._state = state

    # -- derived predict weights (cached per factor/residual pair) ----------

    @property
    def _state(self) -> core.GPState:
        return self.__state

    @_state.setter
    def _state(self, state: core.GPState) -> None:
        self.__state = state
        self.__weights = None  # any state change invalidates the cache

    @property
    def _weights(self) -> core.PredictWeights:
        """``L^-1 resid`` / ``K^-1 resid``, derived lazily once per trained
        state and reused across predict/score calls (the reference
        re-solves per call, ``mod.rs:226-244``)."""
        if self.__weights is None:
            self.__weights = _derive_weights(self.__state)
        return self.__weights

    # -- constructors -------------------------------------------------------

    @classmethod
    def default(cls, training_inputs, training_outputs) -> "GaussianProcess":
        """Gaussian kernel + constant prior, both fitted
        (``mod.rs:96-102``)."""
        return (
            cls.builder(training_inputs, training_outputs)
            .fit_kernel()
            .fit_prior()
            .train()
        )

    @classmethod
    def builder(cls, training_inputs, training_outputs):
        """Start a builder (``mod.rs:129-135``)."""
        from .builder import GaussianProcessBuilder

        return GaussianProcessBuilder(training_inputs, training_outputs)

    @classmethod
    def new(
        cls,
        prior,
        kernel,
        noise: float,
        cholesky_epsilon: Optional[float],
        training_inputs,
        training_outputs,
        method: str = "gram",
        capacity: Optional[int] = None,
        backend: str = "dense",
        storage: Optional[str] = None,
        dtype=None,
        panel_block: Optional[int] = None,
        precision: Optional[str] = None,
    ) -> "GaussianProcess":
        """Raw constructor (``mod.rs:142-167``). ``dtype`` overrides the
        ambient default compute dtype (see builder ``set_dtype``).
        ``panel_block`` overrides the streamed backend's tuned auto panel
        width (``ops/partition.auto_panel_block``); ``precision`` pins the
        MXU matmul precision of every factorization this model performs
        (streamed backend — see builder ``set_factor_precision``)."""
        if noise < 0:
            raise ConfigError(
                f"The noise parameter should be non-negative but we tried to "
                f"set it to {noise}"
            )
        if cholesky_epsilon is not None and cholesky_epsilon <= 0:
            raise ConfigError("cholesky_epsilon must be strictly positive")
        if dtype is not None:
            dtype = jnp.dtype(dtype)
            if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
                raise ConfigError(
                    f"model dtype must be float32 or float64, got {dtype}"
                )
        x, _ = as_input_matrix(training_inputs, dtype=dtype)
        y = as_output_vector(training_outputs, dtype=dtype)
        if x.shape[0] != y.shape[0]:
            raise ShapeError(
                f"{x.shape[0]} input rows vs {y.shape[0]} outputs"
            )
        state, ok = core.make_state(
            kernel, prior, noise, x, y, eps=cholesky_epsilon, method=method,
            cap=capacity, backend=backend, storage=storage,
            block=panel_block, precision=precision,
        )
        if not bool(ok):
            raise CholeskyError()
        return cls(state)

    # -- accessors -----------------------------------------------------------

    @property
    def state(self) -> core.GPState:
        return self._state

    @property
    def kernel(self):
        return self._state.kernel

    @property
    def prior(self):
        return self._state.prior

    @property
    def noise(self) -> float:
        return float(self._state.noise)

    @property
    def cholesky_epsilon(self) -> Optional[float]:
        return self._state.eps

    @property
    def num_samples(self) -> int:
        return int(self._state.n)

    # -- prediction ----------------------------------------------------------

    def _query(self, inputs) -> tuple[Array, Any]:
        xq, adapter = as_input_matrix(inputs, dtype=self._state.x.dtype)
        if xq.shape[1] != self._state.input_dim:
            raise ShapeError(
                f"query dim {xq.shape[1]} != training dim {self._state.input_dim}"
            )
        return xq, adapter

    def predict(self, inputs):
        """Posterior mean (``mod.rs:226-244``) — sweep-free: one strip
        GEMM against the cached ``K^-1 resid`` weights."""
        xq, adapter = self._query(inputs)
        return adapter.vector(_predict_mean(self._state, xq, self._weights))

    def predict_variance(self, inputs):
        """Latent posterior variance (``mod.rs:248-273``)."""
        xq, adapter = self._query(inputs)
        return adapter.vector(
            _predict_variance(self._state, xq, self._weights)
        )

    def predict_mean_variance(self, inputs):
        """Shared-weights (mean, variance) (``mod.rs:290-326``) — one
        forward sweep per batch against the cached ``L^-1 resid``."""
        xq, adapter = self._query(inputs)
        mean, var = _predict_mean_variance(self._state, xq, self._weights)
        return adapter.pair(mean, var)

    def predict_covariance(self, inputs) -> Array:
        """Full posterior covariance matrix (``mod.rs:329-350``)."""
        xq, _ = self._query(inputs)
        return _predict_covariance(self._state, xq)

    def predict_in_batches(
        self, inputs, batch_size: Optional[int] = None
    ) -> tuple[Array, Array]:
        """(mean, variance) for very large query sets, processed in fixed
        chunks so the (n, m) covariance strip never exceeds
        ``capacity x batch_size`` — the serving path for bulk scoring.
        The last chunk is zero-padded to keep a single compiled program.

        ``batch_size=None`` applies a capacity-aware default: 8192, but
        1024 at frontier capacities where the sweep program's strip
        buffers alongside a ~13 GB factor otherwise exceed the chip
        (measured at n=80k bf16 on the 16 GB reference chip, BASELINE.md
        round 4; the cliff scales with sqrt(HBM) via
        :func:`friedrich_tpu.config.memory_scale` — pin with
        ``config.set_memory_policy(frontier_capacity=...)``)."""
        if batch_size is None:
            from .. import config

            frontier = config.memory_policy_override("frontier_capacity")
            if frontier is None:
                frontier = int(60_000 * config.memory_scale() ** 0.5)
            batch_size = 1024 if self._state.capacity >= frontier else 8192
        xq, _ = self._query(inputs)
        m = xq.shape[0]
        means, variances = [], []
        for lo in range(0, m, batch_size):
            chunk = xq[lo : lo + batch_size]
            pad = batch_size - chunk.shape[0]
            if pad and m > batch_size:
                chunk = jnp.concatenate(
                    [chunk, jnp.zeros((pad, xq.shape[1]), xq.dtype)]
                )
            mean, var = _predict_mean_variance(self._state, chunk, self._weights)
            if pad and m > batch_size:
                mean, var = mean[:-pad], var[:-pad]
            means.append(mean)
            variances.append(var)
        return jnp.concatenate(means), jnp.concatenate(variances)

    def sample_at(self, inputs) -> MultivariateNormal:
        """Posterior sampler at the given points (``mod.rs:371-392``)."""
        xq, adapter = self._query(inputs)
        mean, cov = _posterior(self._state, xq, self._weights)
        return MultivariateNormal(mean, cov, adapter)

    # -- scores ---------------------------------------------------------------

    def likelihood(self) -> float:
        """The reference's approximate likelihood (``mod.rs:196-220``)."""
        return float(_likelihood(self._state, self._weights))

    def log_marginal_likelihood(self) -> float:
        """Exact log marginal likelihood (corrected variant)."""
        return float(_lml(self._state, self._weights))

    # -- mutation --------------------------------------------------------------

    def add_samples(self, inputs, outputs) -> None:
        """Incremental O(n^2 k) update (``mod.rs:173-190``)."""
        x_new, _ = as_input_matrix(inputs, dtype=self._state.x.dtype)
        y_new = as_output_vector(outputs)
        if x_new.shape[0] != y_new.shape[0]:
            raise ShapeError("inputs/outputs row mismatch")
        if x_new.shape[1] != self._state.input_dim:
            raise ShapeError(
                f"new sample dim {x_new.shape[1]} != training dim "
                f"{self._state.input_dim}"
            )
        n = int(self._state.n)
        k = x_new.shape[0]
        cap = self._state.capacity
        grew = n + k > cap
        if grew:
            # amortized growth, extendable_matrix.rs:38 (x1.5 policy);
            # bf16-storage appends rebuild from scratch, so skip copying
            # the old factor into the enlarged buffer (the rebuild donates
            # the fresh identity buffer instead)
            new_cap = max(n + k, math.ceil(cap * GROWTH_FACTOR))
            self._state = core.grow_capacity(
                self._state, new_cap,
                copy_factor=self._state.storage != "bf16",
            )
        if self._state.storage == "bf16":
            # rank-updates against the ROUNDED factor go indefinite (see
            # core.add_samples_rebuild) — refactorize instead: O(n^3) but
            # atomic, and the transient current+new bf16 factors cost one
            # f32 factor (no donation: a failed rebuild must leave
            # self._state usable)
            new_state, ok = core.add_samples_rebuild(
                self._state, x_new, y_new.astype(self._state.resid.dtype)
            )
            if not bool(ok):
                if grew:
                    # the grown buffer skipped the factor copy — re-factor
                    # at the old n (old data unchanged) so the model stays
                    # usable
                    restored, ok2 = core.rebuild_cholesky(self._state)
                    if bool(ok2):
                        self._state = restored
                raise CholeskyError(
                    "add_samples: refactorization with the new points "
                    "failed; consider setting `cholesky_epsilon` or "
                    "increasing the noise. The model was left unchanged."
                )
            self._state = new_state
            return
        if _append_must_donate(self._state):
            # frontier capacities: two live factors (old + appended) exceed
            # HBM — measured OOM at cap~51k f32 on the 16 GB chip — so the
            # append consumes the state's buffers in place. The
            # usable-after-failure contract survives because the append
            # only WRITES rows [n, n+k): on a failed validation those rows
            # are repaired back to the identity padding (O(k cap)) and the
            # live count stays at n.
            new_state = _add_samples_donated(
                self._state, x_new, y_new.astype(self._state.resid.dtype)
            )
            if not bool(jnp.all(jnp.isfinite(jnp.diagonal(new_state.l)))):
                self._state = _repair_failed_append(new_state, k)
                raise CholeskyError(
                    "add_samples: rank-update of the Cholesky factor "
                    "failed (new points make the covariance non-PSD); "
                    "consider setting `cholesky_epsilon` or increasing "
                    "the noise. The model was left unchanged."
                )
            self._state = new_state
            return
        new_state = _add_samples(
            self._state, x_new, y_new.astype(self._state.resid.dtype)
        )
        # validate BEFORE committing: a failed rank-update must not leave the
        # model corrupted (NaN factor + incremented n) for callers that catch
        # the error and keep using the GP
        if not bool(jnp.all(jnp.isfinite(jnp.diagonal(new_state.l)))):
            raise CholeskyError(
                "add_samples: rank-update of the Cholesky factor failed "
                "(new points make the covariance non-PSD); consider setting "
                "`cholesky_epsilon` or increasing the noise. The model was "
                "left unchanged."
            )
        self._state = new_state

    def fit_parameters(
        self,
        fit_prior: bool = True,
        fit_kernel: bool = True,
        max_iter: int = DEFAULT_MAX_ITER,
        convergence_fraction: float = DEFAULT_CONVERGENCE_FRACTION,
        max_time: float = DEFAULT_MAX_TIME,
        fit_log=None,
        gradient: str = "auto",
        num_probes: int = 8,
        seed: int = 0,
        subsample=None,
        sync_every: Optional[int] = None,
    ) -> None:
        """Refit prior/kernel/noise (``mod.rs:406-445``). Pass a
        :class:`~friedrich_tpu.utils.fitlog.FitLog` for structured
        per-iteration records.

        ``gradient``: ``"exact"`` (reference parity path), ``"hutchinson"``
        (streamed large-n path sized to run wherever the factor fits), or
        ``"auto"`` (default: by capacity). ``subsample``: fit the
        hyperparameters on a random subset of that size (int) — or
        ``"auto"`` for the measured default policy
        (``optimizer.auto_subsample``) — and pay exactly ONE full-n
        factorization at the end (the per-iteration O(n^3) rebuild is the
        whole fit cost at scale). ``sync_every``: device->host flag-read
        cadence of the guarded fit loops (None = the tuned default;
        ``max_time``/Cholesky failures are only observed at sync points —
        pass 1 for per-iteration checks). See
        ``models/optimizer.fit_kernel_noise`` / ``fit_subsampled``."""
        from .optimizer import SYNC_EVERY

        self._state = _fit_parameters(
            self._state,
            fit_prior=fit_prior,
            fit_kernel=fit_kernel,
            max_iter=max_iter,
            convergence_fraction=convergence_fraction,
            max_time=max_time,
            fit_log=fit_log,
            gradient=gradient,
            num_probes=num_probes,
            seed=seed,
            subsample=subsample,
            sync_every=SYNC_EVERY if sync_every is None else sync_every,
        )

    def set_hyperparameters(self, kernel=None, noise: Optional[float] = None,
                            prior=None) -> None:
        """Replace kernel/noise/prior and rebuild the factor (and residuals
        when the prior changes).

        The reference exposes these as public mutable fields
        (``mod.rs:59-73``) but leaves the Cholesky factor stale on direct
        mutation; here the model is always consistent."""
        state = self._state
        if prior is not None:
            live = jnp.arange(state.capacity) < state.n
            y_pad = state.resid + jnp.where(live, state.prior.mean(state.x), 0.0)
            resid = jnp.where(live, y_pad - prior.mean(state.x), 0.0)
            state = state.replace(prior=prior, resid=resid)
        if kernel is not None:
            state = state.replace(kernel=kernel)
        if noise is not None:
            if noise < 0:
                raise ConfigError("noise must be non-negative")
            state = state.replace(
                noise=jnp.asarray(noise, state.resid.dtype)
            )
        state, ok = core.rebuild_cholesky(state)
        if not bool(ok):
            raise CholeskyError()
        self._state = state

    def fit_map(
        self,
        num_steps: int = 200,
        learning_rate: float = 0.05,
        prior_sigma: Optional[float] = None,
    ) -> None:
        """Corrected variant of ``fit_parameters``: maximize the EXACT log
        marginal likelihood by autodiff (works for any kernel composition;
        see ``models/map_fit.py``)."""
        from .map_fit import fit_map as _fit_map

        self._state = _fit_map(
            self._state, num_steps=num_steps, learning_rate=learning_rate,
            prior_sigma=prior_sigma,
        )

    # -- persistence -------------------------------------------------------------

    def save(self, path: str) -> None:
        """Serialize the full trained model (reference: serde derives,
        ``mod.rs:58``). Round-trips to bit-identical predictions."""
        from ..utils.serialization import save_gp

        save_gp(self, path)

    @classmethod
    def load(cls, path: str) -> "GaussianProcess":
        from ..utils.serialization import load_gp

        return load_gp(path)
