"""Numerical-debugging helpers.

The reference's only in-process safety nets are Rust's borrow checker and
panics; the JAX-native equivalents (SURVEY §5): NaN trapping, deterministic
PRNG-keyed execution, and cross-path checksum assertions used by the test
suite.
"""

from __future__ import annotations

import contextlib
from typing import Iterator

import jax
import jax.numpy as jnp


@contextlib.contextmanager
def debug_nans(enable: bool = True) -> Iterator[None]:
    """Trap NaN production inside jitted code for the scope
    (``jax_debug_nans``); restores the previous setting on exit."""
    prev = jax.config.jax_debug_nans
    jax.config.update("jax_debug_nans", enable)
    try:
        yield
    finally:
        jax.config.update("jax_debug_nans", prev)


def checksum(tree) -> float:
    """Order-stable scalar digest of a pytree of arrays — for asserting
    sharded and single-device paths computed identical values."""
    leaves = jax.tree_util.tree_leaves(tree)
    total = jnp.asarray(0.0, jnp.float64 if jax.config.jax_enable_x64 else jnp.float32)
    for leaf in leaves:
        arr = jnp.asarray(leaf)
        if arr.dtype.kind in "fiu":
            total = total + jnp.sum(jnp.abs(arr.astype(total.dtype)))
    return float(total)
