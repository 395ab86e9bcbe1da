"""Stationary kernels (functions of the pairwise distance).

Formulas and gradients are exact transcriptions of the reference
(``parameters/kernel.rs``), including its documented quirks, so that fitted
trajectories match at 1e-6:

- ``Exponential`` divides the *non-squared* distance by ``2*ls^2``
  (``kernel.rs:663-665``) — nonstandard, replicated for parity.
- ``Matern2``'s ls-gradient (``kernel.rs:890-896``) is the reference's own
  (dimensionally odd) expression, replicated verbatim.
- ``Multiquadric`` computes ``hypot(||d||^2, c)`` (``kernel.rs:1049``, note
  the *squared* norm, contradicting its own docstring) and its gradient uses
  the *non-squared* norm (``kernel.rs:1057``). Both replicated. Deviation:
  the reference declares ``nb_parameters() = 2`` while exposing one parameter
  and reading ``parameters[1]`` in ``set_parameters``
  (``kernel.rs:1039-1069``), which makes its optimizer produce NaNs; here it
  is a consistent 1-parameter kernel.

All parameters arrive "unsanitized" from the multiplicative ADAM optimizer
(possibly negative); sanitization matches the reference (abs/signum noted
per formula).
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct

from ..ops.distance import DIST, SQDIST
from .base import KernelBase, _StationaryAmplKernel, signum

Array = jnp.ndarray
SQRT3 = 3.0**0.5
SQRT5 = 5.0**0.5


@struct.dataclass
class SquaredExp(_StationaryAmplKernel):
    """Squared-exponential / RBF: ``|ampl| * exp(-||d||^2 / (2 ls^2))``
    (``kernel.rs:507-601``). Params: [ls, ampl]; scalable."""

    ls: Any = 1.0
    ampl: Any = 1.0

    NEEDS = frozenset({SQDIST})

    def pointwise(self, feats):
        ampl = jnp.abs(self.ampl)  # sanitize (kernel.rs:556)
        return ampl * jnp.exp(-feats[SQDIST] / (2.0 * self.ls * self.ls))

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:563-576
        sq = feats[SQDIST]
        ampl = jnp.abs(self.ampl)
        e = jnp.exp(-sq / (2.0 * self.ls * self.ls))
        grad_ls = (sq * ampl * e) / (self.ls**3)
        grad_ampl = signum(self.ampl) * e
        return (grad_ls, grad_ampl)


#: The reference aliases ``Gaussian = SquaredExp`` (``kernel.rs:496``).
Gaussian = SquaredExp


@struct.dataclass
class Exponential(_StationaryAmplKernel):
    """``|ampl| * exp(-||d|| / (2 ls^2))`` — distance NOT squared but the
    denominator still is (``kernel.rs:660-665``, replicated for parity).
    Params: [ls, ampl]; scalable."""

    ls: Any = 1.0
    ampl: Any = 1.0

    NEEDS = frozenset({DIST})

    def pointwise(self, feats):
        ampl = jnp.abs(self.ampl)
        return ampl * jnp.exp(-feats[DIST] / (2.0 * self.ls * self.ls))

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:668-681
        dist = feats[DIST]
        ampl = jnp.abs(self.ampl)
        e = jnp.exp(-dist / (2.0 * self.ls * self.ls))
        grad_ls = (dist * ampl * e) / (self.ls**3)
        grad_ampl = signum(self.ampl) * e
        return (grad_ls, grad_ampl)


@struct.dataclass
class Matern1(_StationaryAmplKernel):
    """Matern nu=3/2: ``|ampl| (1 + x) exp(-x)``, ``x = sqrt(3)||d||/|ls|``
    (``kernel.rs:760-772``). Params: [ls, ampl]; scalable."""

    ls: Any = 1.0
    ampl: Any = 1.0

    NEEDS = frozenset({DIST})

    def pointwise(self, feats):
        ampl = jnp.abs(self.ampl)
        l = jnp.abs(self.ls)
        x = SQRT3 * feats[DIST] / l
        return ampl * (1.0 + x) * jnp.exp(-x)

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:774-788
        dist = feats[DIST]
        ampl = jnp.abs(self.ampl)
        l = jnp.abs(self.ls)
        x = SQRT3 * dist / l
        e = jnp.exp(-x)
        grad_ls = (3.0 * ampl * dist * dist * e) / (self.ls**3)
        grad_ampl = signum(self.ampl) * (1.0 + x) * e
        return (grad_ls, grad_ampl)


@struct.dataclass
class Matern2(_StationaryAmplKernel):
    """Matern nu=5/2: ``|ampl| (1 + x + 5||d||^2/(3 l^2)) exp(-x)``,
    ``x = sqrt(5)||d||/|l|`` (``kernel.rs:867-879``).
    Params: [ls, ampl]; scalable."""

    ls: Any = 1.0
    ampl: Any = 1.0

    NEEDS = frozenset({DIST})

    def pointwise(self, feats):
        ampl = jnp.abs(self.ampl)
        l = jnp.abs(self.ls)
        dist = feats[DIST]
        x = SQRT5 * dist / l
        return ampl * (1.0 + x + (5.0 * dist * dist) / (3.0 * l * l)) * jnp.exp(-x)

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:881-900 — note the gradient's ``x`` uses the UNSANITIZED
        # self.ls (kernel.rs:891) while the rest uses l = |ls|; and grad_ls is
        # the reference's own expression, transcribed verbatim.
        dist = feats[DIST]
        ampl = jnp.abs(self.ampl)
        l = jnp.abs(self.ls)
        x = SQRT5 * dist / self.ls
        e = jnp.exp(-x)
        grad_ls = (
            signum(self.ls)
            * ampl
            * ((2.0 * l / 3.0 + 1.0) + dist * SQRT5 * ((l * l / 3.0 + l + 1.0) / (l * l)))
            * e
        )
        grad_ampl = (
            signum(self.ampl)
            * (1.0 + x + (5.0 * dist * dist) / (3.0 * l * l))
            * e
        )
        return (grad_ls, grad_ampl)


@struct.dataclass
class Multiquadric(KernelBase):
    """``hypot(||d||^2, c)`` (``kernel.rs:1044-1050``). Param: [c].

    See module docstring for the deviation from the reference's inconsistent
    parameter count (``kernel.rs:1039-1069``)."""

    c: Any = 0.0

    PARAM_FIELDS = ("c",)
    NEEDS = frozenset({SQDIST, DIST})

    def pointwise(self, feats):
        return jnp.hypot(feats[SQDIST], jnp.asarray(self.c, feats[SQDIST].dtype))

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:1052-1058 — gradient uses the non-squared norm.
        c = jnp.asarray(self.c, feats[DIST].dtype)
        grad_c = c / jnp.hypot(feats[DIST], c)
        return (grad_c,)


@struct.dataclass
class RationalQuadratic(KernelBase):
    """``(1 + ||d||^2 / (2 alpha ls^2))^(-alpha)`` (``kernel.rs:1116-1123``).
    Params: [alpha, ls]."""

    alpha: Any = 1.0
    ls: Any = 1.0

    PARAM_FIELDS = ("alpha", "ls")
    NEEDS = frozenset({SQDIST})

    def pointwise(self, feats):
        sq = feats[SQDIST]
        return (1.0 + sq / (2.0 * self.alpha * self.ls * self.ls)) ** (-self.alpha)

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:1125-1145 — transcribed verbatim (l = |ls| sanitized for
        # grad_alpha; grad_ls divides by unsanitized ls^3).
        sq = feats[SQDIST]
        alpha = self.alpha
        l = jnp.abs(self.ls)
        l2 = l * l
        grad_alpha = ((sq + 2.0 * l2 * alpha) / (l2 * alpha)) ** (-alpha) * (
            2.0**alpha * (1.0 - jnp.log((sq + 2.0 * l2 * alpha) / (2.0 * l2 * alpha)))
            - (l2 * 2.0 ** (alpha + 1.0) * alpha) / (sq + 2.0 * l2 * alpha)
        )
        grad_ls = (
            sq * (sq / (2.0 * alpha * l * l) + 1.0) ** (-alpha - 1.0) / (self.ls**3)
        )
        return (grad_alpha, grad_ls)
