"""Sharded GP execution over a device mesh (v1: sharding-constraint based).

The covariance matrix, its gradients, the Cholesky factor, and K^-1 are
constrained to a 2-D block layout over the (r, c) mesh; XLA's SPMD
partitioner inserts the collectives. Prediction shards query rows
data-parallel. The hand-written distributed factorization/solves live in
``distributed_cholesky.py`` / ``distributed_solve.py``; this module is the
XLA-partitioned reference path the hand-written kernels are validated
against, and the simplest way to run the full training step SPMD.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.lax import with_sharding_constraint
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..models import gp as core
from ..models.optimizer import AdamState, _generic_step, _scaled_step
from .mesh import COL_AXIS, ROW_AXIS, matrix_sharding, replicated

Array = jnp.ndarray


def shard_state(state: core.GPState, mesh: Mesh) -> core.GPState:
    """Place the state on the mesh: big (cap, cap) factor in 2-D blocks,
    small vectors replicated."""
    mat = matrix_sharding(mesh)
    rep = replicated(mesh)
    return state.replace(
        x=jax.device_put(state.x, rep),
        resid=jax.device_put(state.resid, rep),
        l=jax.device_put(state.l, mat),
        n=jax.device_put(state.n, rep),
        noise=jax.device_put(state.noise, rep),
        kernel=jax.tree.map(lambda a: jax.device_put(a, rep), state.kernel),
        prior=jax.tree.map(lambda a: jax.device_put(a, rep), state.prior),
    )


def make_sharded_train_step(mesh: Mesh, scalable: bool = True):
    """One jitted, mesh-sharded hyperparameter-fit iteration.

    The inner step is the exact single-device ADAM step; the 2-D layout of
    the factor (and the propagated layout of K / dK / K^-1) makes the MXU
    work — covariance build, gradient matrices, solves — run SPMD across
    the mesh.
    """
    step = _scaled_step if scalable else _generic_step
    mat = matrix_sharding(mesh)

    def sharded_step(state: core.GPState, adam: AdamState, i, conv):
        state = state.replace(l=with_sharding_constraint(state.l, mat))
        state, adam, progress, ok, _ = step(state, adam, i, conv)
        state = state.replace(l=with_sharding_constraint(state.l, mat))
        return state, adam, progress, ok

    return jax.jit(sharded_step)


def make_sharded_predict(mesh: Mesh):
    """Batched posterior mean+variance with query rows sharded across the
    whole mesh (pure data parallelism: K(X, xq) columns are independent)."""
    qshard = NamedSharding(mesh, P((ROW_AXIS, COL_AXIS)))

    def predict(state: core.GPState, xq: Array):
        xq = with_sharding_constraint(xq, qshard)
        mean, var = core.predict_mean_variance(state, xq)
        mean = with_sharding_constraint(mean, qshard)
        var = with_sharding_constraint(var, qshard)
        return mean, var

    return jax.jit(predict)


def make_sharded_build_and_factor(mesh: Mesh):
    """Covariance build + Cholesky with the matrix 2-D-sharded (the
    BASELINE headline op at large n)."""
    from ..ops.covariance import train_covariance_padded
    from ..ops.cholesky import factor

    mat = matrix_sharding(mesh)

    def build_factor(kernel, x_pad, n, noise):
        k = train_covariance_padded(kernel, x_pad, n, noise)
        k = with_sharding_constraint(k, mat)
        l_mat, ok = factor(k)
        return with_sharding_constraint(l_mat, mat), ok

    return jax.jit(build_factor)
