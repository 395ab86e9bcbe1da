"""Inner-product (non-stationary) kernels: Linear, Polynomial, HyperTan.

Exact transcriptions of the reference formulas and gradients
(``parameters/kernel.rs:342-402`` Linear, ``:411-485`` Polynomial,
``:934-1001`` HyperTan). None are scalable and none define heuristic fits,
matching the reference.
"""

from __future__ import annotations

from typing import Any, Tuple

import jax.numpy as jnp
from flax import struct

from ..ops.distance import DOT
from .base import KernelBase

Array = jnp.ndarray


@struct.dataclass
class Linear(KernelBase):
    """``x1 . x2 + c`` (``kernel.rs:376-382``). Param: [c]."""

    c: Any = 0.0

    PARAM_FIELDS = ("c",)
    NEEDS = frozenset({DOT})

    def pointwise(self, feats):
        return feats[DOT] + self.c

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:384-391: grad_c = 1
        return (jnp.ones_like(feats[DOT]),)


@struct.dataclass
class Polynomial(KernelBase):
    """``(alpha * x1.x2 + c)^d`` (``kernel.rs:451-457``).
    Params: [alpha, c, d]."""

    alpha: Any = 1.0
    c: Any = 0.0
    d: Any = 1.0

    PARAM_FIELDS = ("alpha", "c", "d")
    NEEDS = frozenset({DOT})

    def pointwise(self, feats):
        return (self.alpha * feats[DOT] + self.c) ** self.d

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:459-472
        x = feats[DOT]
        inner = self.alpha * x + self.c
        grad_c = self.d * inner ** (self.d - 1.0)
        grad_alpha = x * grad_c
        grad_d = jnp.log(inner) * inner**self.d
        return (grad_alpha, grad_c, grad_d)


@struct.dataclass
class HyperTan(KernelBase):
    """``tanh(alpha * x1.x2 + c)`` (``kernel.rs:971-977``).
    Params: [alpha, c]."""

    alpha: Any = 1.0
    c: Any = 0.0

    PARAM_FIELDS = ("alpha", "c")
    NEEDS = frozenset({DOT})

    def pointwise(self, feats):
        return jnp.tanh(self.alpha * feats[DOT] + self.c)

    def pointwise_grads(self, feats) -> Tuple[Array, ...]:
        # kernel.rs:979-989
        x = feats[DOT]
        grad_c = 1.0 / jnp.cosh(self.alpha * x + self.c) ** 2
        grad_alpha = x * grad_c
        return (grad_alpha, grad_c)
