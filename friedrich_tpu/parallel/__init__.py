"""Multi-chip execution: meshes, sharded builds/fits, distributed Cholesky."""

from .mesh import (
    CHAIN_AXIS,
    COL_AXIS,
    ROW_AXIS,
    make_chain_mesh,
    make_matrix_mesh,
    matrix_sharding,
    replicated,
    row_sharding,
)
from .sharded import (
    make_sharded_build_and_factor,
    make_sharded_predict,
    make_sharded_train_step,
    shard_state,
)
from .large_scale import LargeScaleGP

__all__ = [
    "LargeScaleGP",
    "CHAIN_AXIS",
    "COL_AXIS",
    "ROW_AXIS",
    "make_chain_mesh",
    "make_matrix_mesh",
    "matrix_sharding",
    "replicated",
    "row_sharding",
    "make_sharded_build_and_factor",
    "make_sharded_predict",
    "make_sharded_train_step",
    "shard_state",
]
