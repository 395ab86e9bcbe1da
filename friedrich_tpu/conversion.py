"""Polymorphic input/output conversion (L0 adapter).

TPU-native counterpart of the reference's ``Input`` trait
(``conversion/mod.rs:23-52``), which lets every public GP method accept
several container types and return matching outputs:

- ``[f, f, ...]`` (flat list/tuple of floats) = ONE sample -> scalar output
  (reference ``conversion/mod.rs:95-118``, ``Vec<f64>`` impl);
- ``[[...], [...]]`` (nested list) = many samples -> list output
  (reference ``conversion/mod.rs:121-146``, ``Vec<Vec<f64>>`` impl);
- 2-D ``numpy.ndarray`` -> 1-D ``numpy.ndarray`` output
  (reference ``conversion/mod.rs:58-92``, ``DMatrix`` impl; also covers the
  optional ndarray impls at ``:150-201``);
- 2-D ``jax.Array`` -> 1-D ``jax.Array`` output (TPU-native addition).

Everything is normalized to a device array of shape ``(n, d)`` internally;
outputs are converted back with :func:`OutputAdapter.vector`.
"""

from __future__ import annotations

import dataclasses
from typing import Any

import jax.numpy as jnp
import numpy as np

from .config import default_dtype
from .utils.errors import ShapeError

Array = jnp.ndarray


@dataclasses.dataclass(frozen=True)
class OutputAdapter:
    """Remembers the input container type so outputs can mirror it.

    ``kind`` is one of ``"scalar"`` (single flat-list sample), ``"list"``,
    ``"numpy"``, ``"jax"``.
    """

    kind: str

    def vector(self, v: Array) -> Any:
        """Convert a length-m device vector to the caller's preferred type."""
        if self.kind == "scalar":
            return float(v[0])
        if self.kind == "list":
            return [float(x) for x in np.asarray(v)]
        if self.kind == "numpy":
            return np.asarray(v)
        return v  # "jax"

    def pair(self, a: Array, b: Array) -> tuple[Any, Any]:
        return self.vector(a), self.vector(b)


def as_input_matrix(x: Any, dtype=None) -> tuple[Array, OutputAdapter]:
    """Normalize ``x`` to a ``(n, d)`` device array + an output adapter."""
    dtype = dtype or default_dtype()
    if isinstance(x, (list, tuple)):
        if len(x) == 0:
            raise ShapeError("empty input")
        if isinstance(x[0], (list, tuple, np.ndarray, jnp.ndarray)):
            mat = jnp.asarray(np.asarray(x, dtype=np.float64), dtype=dtype)
            if mat.ndim != 2:
                raise ShapeError(
                    f"nested input must be a list of 1-D rows, got overall "
                    f"shape {mat.shape}"
                )
            return mat, OutputAdapter("list")
        # flat list of floats = a single sample (reference Vec<f64> impl)
        mat = jnp.asarray(np.asarray(x, dtype=np.float64)[None, :], dtype=dtype)
        if mat.ndim != 2:
            raise ShapeError(f"flat input must be 1-D, got shape {mat.shape[1:]}")
        return mat, OutputAdapter("scalar")
    if isinstance(x, np.ndarray):
        if x.ndim == 1:
            return jnp.asarray(x[None, :], dtype=dtype), OutputAdapter("scalar")
        if x.ndim != 2:
            raise ShapeError(f"expected 1-D or 2-D input, got ndim={x.ndim}")
        return jnp.asarray(x, dtype=dtype), OutputAdapter("numpy")
    if isinstance(x, jnp.ndarray):
        if x.ndim == 1:
            return jnp.asarray(x[None, :], dtype=dtype), OutputAdapter("scalar")
        if x.ndim != 2:
            raise ShapeError(f"expected 1-D or 2-D input, got ndim={x.ndim}")
        return jnp.asarray(x, dtype=dtype), OutputAdapter("jax")
    raise ShapeError(f"unsupported input type: {type(x)!r}")


def as_output_vector(y: Any, dtype=None) -> Array:
    """Normalize training outputs to a 1-D device vector."""
    dtype = dtype or default_dtype()
    if isinstance(y, (list, tuple)):
        arr = np.asarray(y, dtype=np.float64)
    else:
        arr = np.asarray(y) if isinstance(y, np.ndarray) else y
    arr = jnp.asarray(arr, dtype=dtype)
    if arr.ndim == 2 and arr.shape[1] == 1:
        arr = arr[:, 0]
    if arr.ndim != 1:
        raise ShapeError(f"expected 1-D outputs, got shape {arr.shape}")
    return arr
