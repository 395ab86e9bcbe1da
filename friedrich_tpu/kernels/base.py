"""Kernel system: functional, pytree-registered kernels.

TPU-native redesign of the reference's ``Kernel`` trait
(``parameters/kernel.rs:22-86``). Instead of a per-pair scalar function
``kernel(x1, x2) -> f64``, a kernel here is **data** (a pytree of
hyperparameters) plus two *elementwise* maps applied to whole pairwise
feature tiles (see ``ops/distance.py``):

- ``pointwise(feats)``  -> covariance tile       (== trait fn ``kernel``)
- ``pointwise_grads(feats)`` -> per-parameter gradient tiles
  (== trait fn ``gradient``, ``kernel.rs:68-71``; the reference's analytic
  formulas are transcribed exactly — including their quirks — for parity)

Parameter-vector plumbing mirrors the trait (``get_parameters`` /
``set_parameters`` / ``nb_parameters`` / ``is_scalable`` / ``rescale`` /
``heuristic_fit``, ``kernel.rs:27-85``). Kernels compose with ``+`` and ``*``
like the reference's ``KernelArith`` wrapper (``kernel.rs:312-332``).

Because kernels are pytrees, hyperparameter updates re-use the same compiled
XLA program (params are traced leaves, never baked-in constants).
"""

from __future__ import annotations

from typing import Any, ClassVar, FrozenSet, Tuple

import jax.numpy as jnp
from flax import struct

from .heuristics import fit_amplitude_var, fit_bandwidth_mean

Array = jnp.ndarray


def signum(v):
    """Rust ``f64::signum`` semantics: +1 for +0.0 (jnp.sign gives 0)."""
    return jnp.where(v >= 0, 1.0, -1.0)


class KernelBase:
    """Mixin providing the shared kernel API. Concrete kernels are
    ``flax.struct.dataclass`` pytrees inheriting from this."""

    # Names of the hyperparameter fields, in the reference's
    # get_parameters/gradient order.
    PARAM_FIELDS: ClassVar[Tuple[str, ...]] = ()
    # Pairwise features this kernel needs ({"dot","sqdist","dist"}).
    NEEDS: ClassVar[FrozenSet[str]] = frozenset()
    # Whether the amplitude can be rescaled in closed form
    # (``kernel.rs:33-36``; unlocks the scaled fit path).
    SCALABLE: ClassVar[bool] = False

    # -- parameter vector plumbing ------------------------------------------
    @property
    def nb_params(self) -> int:
        """Trait fn ``nb_parameters`` (``kernel.rs:27``)."""
        return len(self.PARAM_FIELDS)

    @property
    def needs(self) -> FrozenSet[str]:
        return self.NEEDS

    @property
    def is_scalable(self) -> bool:
        return self.SCALABLE

    def get_params(self) -> Array:
        """Flat parameter vector in gradient order (``kernel.rs:74``)."""
        return jnp.stack([jnp.asarray(getattr(self, f)) for f in self.PARAM_FIELDS])

    def with_params(self, vec: Array) -> "KernelBase":
        """Functional ``set_parameters`` (``kernel.rs:77``)."""
        return self.replace(**{f: vec[i] for i, f in enumerate(self.PARAM_FIELDS)})

    def rescale(self, scale) -> "KernelBase":
        """Multiply the kernel amplitude by ``scale`` (``kernel.rs:38-54``).

        Raises for non-scalable kernels, matching the reference's panic.
        """
        if not self.SCALABLE:
            raise NotImplementedError(
                "You tried to rescale a Kernel that is not Scalable!"
            )
        return self.replace(ampl=jnp.asarray(self.ampl) * scale)

    def heuristic_fit(self, x: Array, y: Array) -> "KernelBase":
        """Fast data-driven init (``kernel.rs:81-85``); default: no-op."""
        del x, y
        return self

    # -- elementwise maps (implemented by concrete kernels) ------------------
    def pointwise(self, feats: dict) -> Array:
        raise NotImplementedError

    def pointwise_grads(self, feats: dict) -> Tuple[Array, ...]:
        raise NotImplementedError

    # -- composition ----------------------------------------------------------
    def __add__(self, other: "KernelBase") -> "KernelSum":
        return KernelSum(k1=self, k2=other)

    def __mul__(self, other: "KernelBase") -> "KernelProd":
        return KernelProd(k1=self, k2=other)


class _StationaryAmplKernel(KernelBase):
    """Shared plumbing for (ls, ampl) stationary kernels (RBF/Exp/Matern)."""

    PARAM_FIELDS = ("ls", "ampl")
    SCALABLE = True

    def heuristic_fit(self, x: Array, y: Array) -> "KernelBase":
        """ls = mean pairwise distance, ampl = var(y)
        (``kernel.rs:594-600`` and identical blocks for Exp/Matern)."""
        return self.replace(ls=fit_bandwidth_mean(x), ampl=fit_amplitude_var(y))


# ---------------------------------------------------------------------------
# Combinators (KernelSum / KernelProd, ``kernel.rs:132-307``)
# ---------------------------------------------------------------------------


@struct.dataclass
class KernelSum(KernelBase):
    """Sum of two kernels (``kernel.rs:132-211``).

    Parameters/gradients are the concatenation [k1-params, k2-params];
    scalable iff both children are (``kernel.rs:150-153``); rescale applies
    to both (``kernel.rs:174-178``)."""

    k1: Any = None
    k2: Any = None

    @property
    def nb_params(self) -> int:
        return self.k1.nb_params + self.k2.nb_params

    @property
    def needs(self) -> FrozenSet[str]:
        return self.k1.needs | self.k2.needs

    @property
    def is_scalable(self) -> bool:
        return self.k1.is_scalable and self.k2.is_scalable

    def get_params(self) -> Array:
        return jnp.concatenate([self.k1.get_params(), self.k2.get_params()])

    def with_params(self, vec: Array) -> "KernelSum":
        n1 = self.k1.nb_params
        return self.replace(
            k1=self.k1.with_params(vec[:n1]), k2=self.k2.with_params(vec[n1:])
        )

    def rescale(self, scale) -> "KernelSum":
        return self.replace(k1=self.k1.rescale(scale), k2=self.k2.rescale(scale))

    def heuristic_fit(self, x: Array, y: Array) -> "KernelSum":
        return self.replace(
            k1=self.k1.heuristic_fit(x, y), k2=self.k2.heuristic_fit(x, y)
        )

    def pointwise(self, feats: dict) -> Array:
        return self.k1.pointwise(feats) + self.k2.pointwise(feats)

    def pointwise_grads(self, feats: dict) -> Tuple[Array, ...]:
        return tuple(self.k1.pointwise_grads(feats)) + tuple(
            self.k2.pointwise_grads(feats)
        )


@struct.dataclass
class KernelProd(KernelBase):
    """Pointwise product of two kernels (``kernel.rs:221-307``).

    Product-rule gradients (``kernel.rs:252-262``); scalable iff either child
    is (``kernel.rs:239-242``); rescale applies to the first scalable child
    (``kernel.rs:264-274``)."""

    k1: Any = None
    k2: Any = None

    @property
    def nb_params(self) -> int:
        return self.k1.nb_params + self.k2.nb_params

    @property
    def needs(self) -> FrozenSet[str]:
        return self.k1.needs | self.k2.needs

    @property
    def is_scalable(self) -> bool:
        return self.k1.is_scalable or self.k2.is_scalable

    def get_params(self) -> Array:
        return jnp.concatenate([self.k1.get_params(), self.k2.get_params()])

    def with_params(self, vec: Array) -> "KernelProd":
        n1 = self.k1.nb_params
        return self.replace(
            k1=self.k1.with_params(vec[:n1]), k2=self.k2.with_params(vec[n1:])
        )

    def rescale(self, scale) -> "KernelProd":
        if self.k1.is_scalable:
            return self.replace(k1=self.k1.rescale(scale))
        return self.replace(k2=self.k2.rescale(scale))

    def heuristic_fit(self, x: Array, y: Array) -> "KernelProd":
        return self.replace(
            k1=self.k1.heuristic_fit(x, y), k2=self.k2.heuristic_fit(x, y)
        )

    def pointwise(self, feats: dict) -> Array:
        return self.k1.pointwise(feats) * self.k2.pointwise(feats)

    def pointwise_grads(self, feats: dict) -> Tuple[Array, ...]:
        v1 = self.k1.pointwise(feats)
        v2 = self.k2.pointwise(feats)
        g1 = self.k1.pointwise_grads(feats)
        g2 = self.k2.pointwise_grads(feats)
        return tuple(g * v2 for g in g1) + tuple(g * v1 for g in g2)
