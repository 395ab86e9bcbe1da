"""Priors — the regression mean in the absence of data.

Functional counterpart of the reference's ``Prior`` trait
(``parameters/prior.rs:19-33``): ``mean(x)`` maps an (n, d) input batch to an
(n,) prior mean, and ``fit(x, y)`` returns a NEW fitted prior (priors are
immutable pytrees here). Three concrete priors, matching the reference:

- :class:`ZeroPrior` (``prior.rs:43-56``)
- :class:`ConstantPrior` — fit = mean of outputs (``prior.rs:66-99``)
- :class:`LinearPrior` — fit = least squares via SVD with a prepended
  intercept column (``prior.rs:108-160``); here ``jnp.linalg.lstsq`` (also
  SVD-based) on ``[1 | X]``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import struct

Array = jnp.ndarray


class PriorBase:
    """Shared API for priors (immutable pytrees)."""

    def mean(self, x: Array) -> Array:
        """Prior mean for each row of ``x`` (trait fn ``prior``)."""
        raise NotImplementedError

    def fit(self, x: Array, y: Array) -> "PriorBase":
        """Fit on training data; default no-op (``prior.rs:28-32``)."""
        del x, y
        return self

    def fit_padded(self, x_pad: Array, y_pad: Array, live: Array) -> "PriorBase":
        """Masked fit on capacity-padded buffers (jit-stable variant).

        ``live`` is a boolean (cap,) mask; dead rows of ``y_pad`` must be
        zero. Default: no-op.
        """
        del x_pad, y_pad, live
        return self


@struct.dataclass
class ZeroPrior(PriorBase):
    """Always zero (``prior.rs:43-56``)."""

    def mean(self, x: Array) -> Array:
        return jnp.zeros((x.shape[0],), dtype=x.dtype)

    @classmethod
    def default(cls, input_dim: int) -> "ZeroPrior":
        """``Prior::default`` (``prior.rs:46-49``) — parameterless."""
        del input_dim
        return cls()


@struct.dataclass
class ConstantPrior(PriorBase):
    """A constant; fit sets it to mean(y) (``prior.rs:66-99``)."""

    c: Any = 0.0

    def mean(self, x: Array) -> Array:
        return jnp.full((x.shape[0],), jnp.asarray(self.c, dtype=x.dtype))

    def fit(self, x: Array, y: Array) -> "ConstantPrior":
        del x
        return self.replace(c=jnp.mean(y))

    def fit_padded(self, x_pad: Array, y_pad: Array, live: Array) -> "ConstantPrior":
        del x_pad
        n = jnp.sum(live.astype(y_pad.dtype))
        return self.replace(c=jnp.sum(jnp.where(live, y_pad, 0.0)) / n)

    @classmethod
    def default(cls, input_dim: int) -> "ConstantPrior":
        del input_dim
        return cls(c=0.0)


@struct.dataclass
class LinearPrior(PriorBase):
    """``x @ weights + intercept``; fit = SVD least squares on ``[1 | X]``
    (``prior.rs:108-160``)."""

    weights: Any = None  # (d,)
    intercept: Any = 0.0

    def mean(self, x: Array) -> Array:
        w = jnp.asarray(self.weights, dtype=x.dtype)
        return x @ w + jnp.asarray(self.intercept, dtype=x.dtype)

    def fit(self, x: Array, y: Array) -> "LinearPrior":
        ones = jnp.ones((x.shape[0], 1), dtype=x.dtype)
        design = jnp.concatenate([ones, x], axis=1)
        sol, *_ = jnp.linalg.lstsq(design, y)
        return self.replace(intercept=sol[0], weights=sol[1:])

    def fit_padded(self, x_pad: Array, y_pad: Array, live: Array) -> "LinearPrior":
        # Zeroed dead rows contribute ||0 - 0||^2 = 0 to the least-squares
        # objective, so the masked solve equals the live-only solve.
        ones = jnp.ones((x_pad.shape[0], 1), dtype=x_pad.dtype)
        design = jnp.where(live[:, None], jnp.concatenate([ones, x_pad], axis=1), 0.0)
        rhs = jnp.where(live, y_pad, 0.0)
        sol, *_ = jnp.linalg.lstsq(design, rhs)
        return self.replace(intercept=sol[0], weights=sol[1:])

    @classmethod
    def default(cls, input_dim: int) -> "LinearPrior":
        return cls(weights=jnp.zeros((input_dim,)), intercept=0.0)


#: Registry for (de)serialization.
PRIOR_REGISTRY = {
    "ZeroPrior": ZeroPrior,
    "ConstantPrior": ConstantPrior,
    "LinearPrior": LinearPrior,
}
