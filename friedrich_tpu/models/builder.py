"""Fluent builder for GaussianProcess configuration.

Mirrors the reference's ``GaussianProcessBuilder``
(``gaussian_process/builder.rs:35-215``) including its defaults:

- ConstantPrior(0), Gaussian kernel (``builder.rs:71-72``);
- noise = 10% of the output standard deviation (``builder.rs:73``);
- max_iter=100, convergence_fraction=0.05, max_time=1h
  (``builder.rs:76-78``);
- no cholesky_epsilon (``builder.rs:83``);
- parameters are NOT fitted unless ``fit_kernel()`` / ``fit_prior()`` are
  called (``builder.rs:74-75``).

``train()`` runs the kernel heuristic fit first (when fitting was
requested), builds the GP, then runs ``fit_parameters``
(``builder.rs:189-214``).
"""

from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import (
    DEFAULT_CONVERGENCE_FRACTION,
    DEFAULT_MAX_ITER,
    DEFAULT_MAX_TIME,
)
from ..conversion import as_input_matrix, as_output_vector
from ..kernels import Gaussian
from ..priors import ConstantPrior
from ..utils.errors import ConfigError
from .api import GaussianProcess


class GaussianProcessBuilder:
    def __init__(self, training_inputs, training_outputs):
        self._x, _ = as_input_matrix(training_inputs)
        self._y = as_output_vector(training_outputs)
        self._prior = ConstantPrior.default(self._x.shape[1])
        self._kernel = Gaussian()
        # 10% of output std by default (builder.rs:73); population variance.
        self._noise = 0.1 * float(jnp.sqrt(jnp.var(self._y)))
        self._cholesky_epsilon: Optional[float] = None
        self._should_fit_kernel = False
        self._should_fit_prior = False
        self._max_iter = DEFAULT_MAX_ITER
        self._convergence_fraction = DEFAULT_CONVERGENCE_FRACTION
        self._max_time = DEFAULT_MAX_TIME
        self._method = "gram"
        self._capacity: Optional[int] = None
        self._backend = "dense"
        self._storage: Optional[str] = None
        self._dtype = None
        self._panel_block: Optional[int] = None
        self._precision: Optional[str] = None
        # "auto" = the MEASURED default policy (optimizer.auto_subsample):
        # full reference fit below n=24,576; above it, fit hyperparameters
        # on a max(8192, n/5) subset then ONE full-n factorization —
        # faster AND a better final model at the headline size, with
        # seed/size scatter measured in BASELINE.md round 4.
        # set_fit_subsample(None) restores the reference's per-iteration
        # full-rebuild flow at any size.
        self._fit_subsample = "auto"
        self._fit_polish = False
        self._auto_subfit_notified = False
        self._fit_gradient = "auto"

    # -- setters (builder.rs:102-182) ----------------------------------------

    def set_prior(self, prior) -> "GaussianProcessBuilder":
        self._prior = prior
        return self

    def set_noise(self, noise: float) -> "GaussianProcessBuilder":
        if noise < 0:
            raise ConfigError(
                f"The noise parameter should be non-negative but we tried to "
                f"set it to {noise}"
            )
        self._noise = noise
        return self

    def set_kernel(self, kernel) -> "GaussianProcessBuilder":
        self._kernel = kernel
        return self

    def set_cholesky_epsilon(self, eps: Optional[float]) -> "GaussianProcessBuilder":
        if eps is not None and eps <= 0:
            raise ConfigError("cholesky_epsilon must be strictly positive")
        self._cholesky_epsilon = eps
        return self

    def set_fit_parameters(
        self, max_iter: int, convergence_fraction: float
    ) -> "GaussianProcessBuilder":
        self._max_iter = max_iter
        self._convergence_fraction = convergence_fraction
        return self

    def set_max_time(self, max_time_seconds: float) -> "GaussianProcessBuilder":
        self._max_time = max_time_seconds
        return self

    def fit_kernel(self) -> "GaussianProcessBuilder":
        self._should_fit_kernel = True
        return self

    def fit_prior(self) -> "GaussianProcessBuilder":
        self._should_fit_prior = True
        return self

    # -- TPU-native extensions -------------------------------------------------

    def set_distance_method(self, method: str) -> "GaussianProcessBuilder":
        """'gram' (MXU GEMM identity, default), 'gram_bf16' (bfloat16
        inputs with float32 MXU accumulation — the mixed-precision
        performance path; ~2^-8 relative feature error), or 'direct'
        (broadcast diff, bit-closest to the reference)."""
        if method not in ("gram", "gram_bf16", "direct"):
            raise ConfigError(f"unknown distance method {method!r}")
        self._method = method
        return self

    def set_capacity(self, capacity: int) -> "GaussianProcessBuilder":
        """Pre-reserve padded capacity for incremental add_samples."""
        self._capacity = capacity
        return self

    def set_backend(self, backend: str) -> "GaussianProcessBuilder":
        """'dense' (materialize K; small/medium n), 'streamed' (fused
        build+factor, K never materialized), or 'tiled' (in-place
        MAC-optimal factorization; fastest large-n single chip)."""
        if backend not in ("dense", "streamed", "tiled", "hybrid", "auto"):
            raise ConfigError(f"unknown backend {backend!r}")
        self._backend = backend
        return self

    def set_dtype(self, dtype) -> "GaussianProcessBuilder":
        """Compute dtype for the model ('float32'/'float64' or a dtype
        object). Overrides the ambient default (float64 under
        ``jax_enable_x64`` parity mode, float32 otherwise) — the knob for
        building f32 PERFORMANCE models while the process runs in x64
        parity mode, and a prerequisite for ``set_factor_storage('bf16')``
        there."""
        dtype = jnp.dtype(dtype)
        if dtype not in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
            raise ConfigError(
                f"model dtype must be float32 or float64, got {dtype}"
            )
        self._dtype = dtype
        return self

    def set_factor_storage(self, storage: Optional[str]) -> "GaussianProcessBuilder":
        """Factor STORAGE dtype: None (input dtype, default) or 'bf16'
        (bfloat16 factor, float32 compute — halves factor HBM, so exact GPs
        reach n~80k on one 16 GB chip; requires the 'streamed' backend and
        float32 inputs). See ``ops/streamed.streamed_cholesky_factor``."""
        if storage not in (None, "bf16"):
            raise ConfigError(f"unknown factor storage {storage!r}")
        self._storage = storage
        return self

    def set_factor_precision(
        self, precision: Optional[str]
    ) -> "GaussianProcessBuilder":
        """MXU matmul precision for every factorization this model
        performs (build, hyperparameter-fit rebuilds): None (ambient —
        on TPU that is SINGLE-PASS bf16 operands with f32 accumulation),
        'bf16', 'f32x3' (3-pass compensation), or 'f32' (true f32,
        6-pass). Streamed backend only.

        When to raise it: the heuristic lengthscale (mean pairwise
        distance, ``kernel.rs:94-113``) makes K densely correlated, so
        its top eigenvalue grows ~ 0.6 n ampl^2 — at large n the default
        bf16 operand rounding (~2^-8 relative) swamps small noise^2
        pivots and the factorization fails. Remedies, in measured
        wall-clock order: ``set_cholesky_epsilon`` (bf16 speed,
        substitutes failing pivots), 'f32x3' (~1.8x), 'f32' (~3x).
        Measured ladder: BASELINE.md 'Matmul precision on TPU'."""
        from ..config import MATMUL_PRECISION_MODES

        if precision is not None and precision not in MATMUL_PRECISION_MODES:
            raise ConfigError(
                f"unknown factor precision {precision!r}; pick one of "
                f"{sorted(MATMUL_PRECISION_MODES)}"
            )
        self._precision = precision
        return self

    def set_panel_block(self, block: Optional[int]) -> "GaussianProcessBuilder":
        """Panel width for the streamed backend's fused build+factor.
        ``None`` (default) applies the TUNED auto policy — block ~ cap/10,
        the measured headline optimum (BASELINE.md) — so
        ``set_backend('streamed')`` reproduces the benchmark schedule
        without manual tuning. Pass an explicit width to override (must
        divide the padded capacity for best efficiency)."""
        if block is not None and block <= 0:
            raise ConfigError("panel block must be strictly positive")
        self._panel_block = block
        return self

    def set_fit_subsample(self, subsample) -> "GaussianProcessBuilder":
        """Fit strategy for ``train()``'s hyperparameter fit: ``"auto"``
        (DEFAULT — the measured policy ``optimizer.auto_subsample``: the
        reference's full fit below n=24,576, else fit the hyperparameters
        on a ``max(8192, n // 5)`` random subset and pay exactly ONE
        full-n factorization — at n=50k both faster and a better final
        model, with seed/size scatter measured in BASELINE.md round 4),
        an int (explicit subset size), or ``None`` (the reference's full
        fit at any size: one O(n^3) factorization per ADAM iteration,
        ``optimizer.rs:267-270`` — preferable when exact reference
        trajectory semantics are required or the data is too
        heterogeneous for a random subset)."""
        if subsample is not None and subsample != "auto":
            if not isinstance(subsample, int) or subsample <= 0:
                raise ConfigError(
                    f"fit subsample must be a positive int, 'auto', or "
                    f"None, got {subsample!r}"
                )
        self._fit_subsample = subsample
        return self

    def set_fit_polish(self, polish) -> "GaussianProcessBuilder":
        """Exact-LML corrective pass after the sub-fit ADAM: ``True``
        runs :func:`~friedrich_tpu.models.map_fit.polish_map` (a short
        optax Adam on the exact LML) from the replicated ADAM's endpoint
        before the full-n build — the MEASURED remedy for the
        multiplicative rule's early-stop/inflated-amplitude optimum
        (``optimizer.rs:120-121``): at n=16,384 the polish escaped that
        optimum from every studied endpoint, correcting the full fit by
        ~530 nats (ampl 2.95 -> 0.66) and good-region sub-fits by
        ~25-100, at ~40 subset-scale density evals (BASELINE.md round-5
        "early-stop remedy"). ``False`` (default) keeps the plain
        sub-fit — the default subset size sits in the measured good
        region, and the polish costs ~+4-8 s on the n=50k headline.
        Only applies to sub-fit flows (``set_fit_subsample``); the
        reference-flow full fit is never polished (trajectory parity —
        call ``models.map_fit.polish_map`` on the state directly if you
        want the correction there)."""
        if not isinstance(polish, bool):
            raise ConfigError(f"fit polish must be a bool, got {polish!r}")
        self._fit_polish = polish
        return self

    def set_fit_gradient(self, gradient: str) -> "GaussianProcessBuilder":
        """Gradient method for ``train()``'s fit: 'auto' (default — exact
        dense terms below the large-n threshold, streamed/Hutchinson
        above), 'exact', or 'hutchinson'. See
        ``models/optimizer.fit_kernel_noise``."""
        if gradient not in ("auto", "exact", "hutchinson"):
            raise ConfigError(f"unknown fit gradient {gradient!r}")
        self._fit_gradient = gradient
        return self

    # -- train (builder.rs:189-214) ----------------------------------------------

    def train(self) -> GaussianProcess:
        x, y = self._x, self._y
        if self._dtype is not None:
            x = x.astype(self._dtype)
            y = y.astype(self._dtype)
        if self._storage == "bf16":
            if self._backend != "streamed":
                raise ConfigError(
                    "set_factor_storage('bf16') requires "
                    "set_backend('streamed')"
                )
            if x.dtype != jnp.float32:
                raise ConfigError(
                    f"set_factor_storage('bf16') requires float32 inputs "
                    f"(got {x.dtype}; call set_dtype('float32') — parity "
                    f"mode defaults to float64 under jax_enable_x64)"
                )
        kernel = self._kernel
        if self._should_fit_kernel:
            kernel = kernel.heuristic_fit(x, y)
            sub = self._resolved_subsample(x.shape[0])
            if sub is not None:
                return self._train_subfit_first(x, y, kernel, sub)
        gp = GaussianProcess.new(
            self._prior,
            kernel,
            self._noise,
            self._cholesky_epsilon,
            x,
            y,
            method=self._method,
            capacity=self._capacity,
            backend=self._backend,
            storage=self._storage,
            dtype=self._dtype,
            panel_block=self._panel_block,
            precision=self._precision,
        )
        if self._should_fit_prior or self._should_fit_kernel:
            gp.fit_parameters(
                fit_prior=self._should_fit_prior,
                fit_kernel=self._should_fit_kernel,
                max_iter=self._max_iter,
                convergence_fraction=self._convergence_fraction,
                max_time=self._max_time,
                gradient=self._fit_gradient,
            )
        return gp

    def _resolved_subsample(self, n: int):
        """The effective sub-fit size for train(), or None for the
        reference flow."""
        sub = self._fit_subsample
        was_auto = sub == "auto"
        if was_auto:
            from .optimizer import auto_subsample

            sub = auto_subsample(n)
        if sub is not None and sub >= n:
            sub = None
        if was_auto and sub is not None and not self._auto_subfit_notified:
            # one-time notice: the default policy deviates from the
            # reference flow at large n (documented in COMPAT.md; measured
            # in BASELINE.md's sensitivity study) — surface it at runtime
            # so large-n users know hyperparameters were fitted on a
            # subset, and how to restore the reference behavior
            import logging

            logging.getLogger("friedrich_tpu").info(
                "train(): n=%d exceeds the sub-fit threshold; "
                "hyperparameters will be fitted on a %d-point subset and "
                "the full-n model built once at the fitted values "
                "(measured default — better LML and ~6x faster than the "
                "reference flow at n=50k; call set_fit_subsample(None) "
                "for the reference's full-data per-iteration fit)",
                n, sub,
            )
            self._auto_subfit_notified = True
        return sub

    def _train_subfit_first(self, x, y, kernel, sub: int) -> GaussianProcess:
        """Subsampled training flow: fit hyperparameters on the subset
        FIRST, then build the full-n model exactly ONCE at the fitted
        parameters.

        The reference order (construct at heuristic parameters, then fit —
        ``builder.rs:189-214``) pays an initial full-n factorization whose
        only purpose is to be thrown away by the first fit rebuild; at
        bf16-storage sizes that heuristic-lengthscale factorization is not
        even inside the storage envelope (K densely correlated, BASELINE.md
        round 3), so building it first would fail outright. Order here:

        1. prior fitted on the FULL data (kernel-independent: mean /
           least-squares — ``prior.rs:93-98,143-148``), matching the
           reference's prior-before-kernel order inside ``fit_parameters``
           (``mod.rs:414-421``);
        2. kernel + noise fitted on a fixed-seed random subset via a
           plain f32-storage sub-model (``precision`` inherited; a
           bf16-storage parent defaults the sub-model to ``"f32"`` —
           the multi-pass remedy the heuristic-init subset factorization
           needs, which bf16 storage itself cannot express);
        3. ONE full-n build at the fitted hyperparameters with every
           storage/precision/backend knob of this builder.
        """
        import jax

        n = x.shape[0]
        prior = self._prior
        if self._should_fit_prior:
            prior = prior.fit(x, y)
        idx = jnp.sort(jax.random.permutation(jax.random.PRNGKey(0), n)[:sub])
        sub_precision = self._precision
        if sub_precision is None and self._storage == "bf16":
            sub_precision = "f32"
        sub_gp = GaussianProcess.new(
            prior,
            kernel,
            self._noise,
            self._cholesky_epsilon,
            x[idx],
            y[idx],
            method=self._method,
            backend="auto",
            dtype=self._dtype,
            precision=sub_precision,
        )
        sub_gp.fit_parameters(
            fit_prior=False,
            fit_kernel=True,
            max_iter=self._max_iter,
            convergence_fraction=self._convergence_fraction,
            max_time=self._max_time,
            gradient=self._fit_gradient,
        )
        if self._fit_polish:
            from .map_fit import polish_map

            # short exact-LML corrective pass from the ADAM endpoint
            # (see set_fit_polish); runs at the sub-model's size and
            # precision, so its cost is subset-scale
            sub_gp._state = polish_map(
                sub_gp._state, precision=sub_precision,
                max_time=self._max_time,
            )
        return GaussianProcess.new(
            prior,
            sub_gp.kernel,
            sub_gp.noise,
            self._cholesky_epsilon,
            x,
            y,
            method=self._method,
            capacity=self._capacity,
            backend=self._backend,
            storage=self._storage,
            dtype=self._dtype,
            panel_block=self._panel_block,
            precision=self._precision,
        )
