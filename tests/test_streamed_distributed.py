"""Streamed (never-materialize-K) and mesh-distributed Cholesky paths must
match the dense single-device factorization exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.cholesky import factor
from friedrich_tpu.ops.covariance import train_covariance_padded
from friedrich_tpu.ops.streamed import streamed_cholesky_factor
from friedrich_tpu.parallel.distributed_cholesky import distributed_cholesky_factor
from friedrich_tpu.parallel.mesh import make_matrix_mesh

RNG = np.random.default_rng(21)


def _problem(cap=96, n=70, d=3):
    x = jnp.zeros((cap, d)).at[:n].set(RNG.normal(size=(n, d)))
    return x, n


@pytest.mark.parametrize("kern", [
    fk.SquaredExp(ls=0.9, ampl=1.4),
    fk.Matern2(ls=1.1, ampl=0.8),
    fk.SquaredExp(ls=0.7, ampl=1.0) + fk.Linear(c=0.2),
], ids=lambda k: type(k).__name__)
@pytest.mark.parametrize("block", [16, 32, 96])
def test_streamed_matches_dense(kern, block):
    x, n = _problem()
    want, ok_w = factor(train_covariance_padded(kern, x, n, 0.3))
    got, ok = streamed_cholesky_factor(kern, x, n, 0.3, block=block)
    assert bool(ok) and bool(ok_w)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


def test_streamed_eps_substitution():
    kern = fk.SquaredExp(ls=1.0, ampl=1.0)
    # 20 duplicate points, zero noise: rank-1 live block
    x = jnp.zeros((32, 1)).at[:20].set(1.0)
    l_mat, ok = streamed_cholesky_factor(kern, x, 20, 0.0, eps=1e-8, block=8)
    assert bool(ok)
    assert bool(jnp.all(jnp.isfinite(l_mat)))
    d = np.diagonal(np.asarray(l_mat))[:20]
    assert np.sum(np.isclose(d, np.sqrt(1e-8))) >= 1


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
@pytest.mark.parametrize("block", [8, 16])
def test_distributed_matches_dense(block):
    kern = fk.SquaredExp(ls=0.9, ampl=1.4)
    x, n = _problem(cap=128, n=100)
    want, _ = factor(train_covariance_padded(kern, x, n, 0.3))
    mesh = make_matrix_mesh(8)
    got, ok = distributed_cholesky_factor(mesh, kern, x, n, 0.3, block=block)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_eps_and_uneven_mesh():
    kern = fk.Matern1(ls=1.0, ampl=1.0)
    x, n = _problem(cap=120, n=90)  # 120/8=15 local rows, block->15
    mesh = make_matrix_mesh(8)
    want, _ = factor(train_covariance_padded(kern, x, n, 0.25))
    got, ok = distributed_cholesky_factor(mesh, kern, x, n, 0.25, block=64)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("block", [16, 48])
def test_tiled_matches_dense(block):
    from friedrich_tpu.ops.tiled import tiled_cholesky_factor

    kern = fk.SquaredExp(ls=0.9, ampl=1.4)
    x, n = _problem()
    want, _ = factor(train_covariance_padded(kern, x, n, 0.3))
    got, ok = tiled_cholesky_factor(kern, x, n, 0.3, block=block)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


def test_tiled_backend_through_api():
    import friedrich_tpu as ft
    import friedrich_tpu.priors as fp

    x = RNG.normal(size=(60, 2))
    y = RNG.normal(size=60)
    gp_t = ft.GaussianProcess.builder(x, y).set_backend("tiled").set_noise(0.2).train()
    gp_d = ft.GaussianProcess.builder(x, y).set_noise(0.2).train()
    xq = RNG.normal(size=(5, 2))
    np.testing.assert_allclose(
        np.asarray(gp_t.predict(xq)), np.asarray(gp_d.predict(xq)),
        rtol=1e-9, atol=1e-11,
    )


@pytest.mark.parametrize("n", [70, 40, 96])
def test_hybrid_matches_dense(n):
    from friedrich_tpu.ops.hybrid import hybrid_cholesky_factor

    kern = fk.Matern1(ls=0.9, ampl=1.2)
    cap = 96
    x = jnp.zeros((cap, 3)).at[:n].set(RNG.normal(size=(n, 3)))
    want, _ = factor(train_covariance_padded(kern, x, n, 0.3))
    got, ok = hybrid_cholesky_factor(kern, x, n, 0.3, block=16)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


def test_hybrid_backend_through_api():
    import friedrich_tpu as ft

    x = RNG.normal(size=(64, 2))
    y = RNG.normal(size=64)
    gp_h = ft.GaussianProcess.builder(x, y).set_backend("hybrid").set_noise(0.2).train()
    gp_d = ft.GaussianProcess.builder(x, y).set_noise(0.2).train()
    xq = RNG.normal(size=(5, 2))
    np.testing.assert_allclose(
        np.asarray(gp_h.predict(xq)), np.asarray(gp_d.predict(xq)),
        rtol=1e-9, atol=1e-11,
    )


def test_blocked_solves_match_scipy():
    from jax.scipy.linalg import cho_solve, solve_triangular
    from friedrich_tpu.ops.blocked_solve import (
        blocked_cho_solve,
        blocked_solve_lower,
        blocked_solve_lower_t,
    )

    kern = fk.SquaredExp(ls=0.9, ampl=1.4)
    x, n = _problem()
    l_mat, _ = factor(train_covariance_padded(kern, x, n, 0.3))
    c = jnp.asarray(RNG.normal(size=(96, 5)))
    np.testing.assert_allclose(
        np.asarray(blocked_solve_lower(l_mat, c, 16)),
        np.asarray(solve_triangular(l_mat, c, lower=True)), rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(blocked_solve_lower_t(l_mat, c, 16)),
        np.asarray(solve_triangular(l_mat, c, lower=True, trans=1)), rtol=1e-9,
    )
    np.testing.assert_allclose(
        np.asarray(blocked_cho_solve(l_mat, c, 16)),
        np.asarray(cho_solve((l_mat, True), c)), rtol=1e-8,
    )
    # 1-D rhs path
    v = jnp.asarray(RNG.normal(size=96))
    np.testing.assert_allclose(
        np.asarray(blocked_solve_lower(l_mat, v, 16)),
        np.asarray(solve_triangular(l_mat, v, lower=True)), rtol=1e-9,
    )


@pytest.mark.parametrize("levels,cap,n", [(2, 128, 100), (3, 256, 200)])
def test_hybrid_recursive_levels(levels, cap, n):
    from friedrich_tpu.ops.hybrid import hybrid_cholesky_factor

    kern = fk.SquaredExp(ls=0.9, ampl=1.4)
    x = jnp.zeros((cap, 3)).at[:n].set(RNG.normal(size=(n, 3)))
    want, _ = factor(train_covariance_padded(kern, x, n, 0.3))
    got, ok = hybrid_cholesky_factor(kern, x, n, 0.3, block=16, levels=levels)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)


@pytest.mark.parametrize("split", [0.33, 0.66])
def test_hybrid_uneven_split(split):
    from friedrich_tpu.ops.hybrid import hybrid_cholesky_factor

    kern = fk.SquaredExp(ls=0.9, ampl=1.4)
    x, n = _problem()
    want, _ = factor(train_covariance_padded(kern, x, n, 0.3))
    got, ok = hybrid_cholesky_factor(kern, x, n, 0.3, block=16, split=split)
    assert bool(ok)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-12)
