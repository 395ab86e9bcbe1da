"""Distributed exact GP over a device mesh with ``LargeScaleGP``.

The reference is single-process (nalgebra on one CPU); this library's
distributed engine shards the covariance factor row-wise across a
``jax.sharding.Mesh`` so one model can span a pod slice: the Cholesky
runs as streamed panels with one ``psum`` per panel, predictions solve
against shard-local strips, and hyperparameter fitting uses
Hutchinson-trace gradients with every GEMM sharded.

This example runs on 8 *virtual* CPU devices (the same rehearsal
harness the test suite uses) so it works on any machine; on a real pod
slice, drop the XLA_FLAGS override and build the mesh from the real
devices — nothing else changes.

Run: ``python examples/distributed_gp.py``
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

# 8 virtual devices BEFORE jax import (on a real pod: delete these lines)
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from friedrich_tpu.config import honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu must actually pin cpu (env alone is unreliable under plugin sitecustomize)
import jax.numpy as jnp
import numpy as np

import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.parallel.large_scale import LargeScaleGP
from friedrich_tpu.parallel.mesh import make_matrix_mesh


def main(n: int = 1024, d: int = 4, seed: int = 0):
    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=n), jnp.float32
    )

    mesh = make_matrix_mesh(len(jax.devices()))
    print(f"mesh: {mesh.shape} over {len(jax.devices())} devices")

    gp = LargeScaleGP(
        mesh,
        fk.SquaredExp(ls=1.0, ampl=1.0),
        fp.ConstantPrior.default(1),
        noise=0.2,
        x=x,
        y=y,
        block=n // 8,
        capacity=2 * n,  # reserve room: appends below stay O(n^2 k)
    )
    print(f"trained: n={gp.n}, LML={gp.log_marginal_likelihood():.3f}")

    # hyperparameter fit: ADAM on the sharded Hutchinson-trace gradients
    gp.fit_scaled(max_iter=10)
    print(f"after fit_scaled(10): LML={gp.log_marginal_likelihood():.3f}")

    # predictions: sharded triangular sweeps against the distributed factor
    xq = jnp.asarray(rng.normal(size=(256, d)), jnp.float32)
    mean, var = gp.predict_mean_variance(xq)
    print(
        f"predict 256 points: mean[:3]={np.asarray(mean)[:3].round(3)} "
        f"var range=({float(var.min()):.3f}, {float(var.max()):.3f})"
    )

    # incremental training: distributed O(n^2 k) Cholesky append
    x_new = jnp.asarray(rng.normal(size=(32, d)), jnp.float32)
    y_new = jnp.asarray(np.sin(np.asarray(x_new)[:, 0]), jnp.float32)
    gp.add_samples(x_new, y_new)
    print(f"after add_samples(32): n={gp.n}, "
          f"LML={gp.log_marginal_likelihood():.3f}")

    # posterior sampling at query points
    mvn = gp.sample_at(xq[:8])
    draws = mvn.sample_n(jax.random.PRNGKey(0), 5)
    print(f"5 posterior draws at 8 points: shape={tuple(draws.shape)}")
    return gp


if __name__ == "__main__":
    main()
