"""Device-mesh utilities for multi-chip execution.

The reference has NO parallelism (single Rust thread; ``Cargo.toml:22-28``
lists no threading/communication deps) — this layer is net-new capability
per the project north star: the n x n kernel matrix is sharded 2-D over a
TPU mesh (the GP analogue of tensor parallelism), hyperparameter chains are
sharded across hosts (data-parallel analogue), and prediction batches shard
over devices.

Mesh axes:
- ``"r"`` / ``"c"``: 2-D layout of covariance/Cholesky matrices (ICI);
- ``"chains"``: embarrassingly-parallel MCMC chains (see ``mcmc/``).
"""

from __future__ import annotations

import math
from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

ROW_AXIS = "r"
COL_AXIS = "c"
CHAIN_AXIS = "chains"


def _squarest_factorization(n: int) -> tuple[int, int]:
    a = int(math.isqrt(n))
    while n % a:
        a -= 1
    return a, n // a


def make_matrix_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 2-D (r, c) mesh over the given/first ``n_devices`` devices, shaped
    as square as possible (best balance for the 2-D block layout of K)."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, found {len(devices)}")
    a, b = _squarest_factorization(n)
    return Mesh(np.array(devices[:n]).reshape(a, b), (ROW_AXIS, COL_AXIS))


def make_chain_mesh(
    n_devices: Optional[int] = None,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """A 1-D mesh for chain-parallel MCMC."""
    devices = list(devices if devices is not None else jax.devices())
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, found {len(devices)}")
    return Mesh(np.array(devices[:n]), (CHAIN_AXIS,))


def matrix_sharding(mesh: Mesh) -> NamedSharding:
    """(cap, cap) arrays laid out in 2-D blocks across the mesh."""
    return NamedSharding(mesh, P(ROW_AXIS, COL_AXIS))


def row_sharding(mesh: Mesh) -> NamedSharding:
    """(n, ...) arrays sharded along rows of the mesh."""
    return NamedSharding(mesh, P(ROW_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
