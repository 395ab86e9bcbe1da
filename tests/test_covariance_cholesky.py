"""Covariance builders and Cholesky ops: padded builds, identity padding,
epsilon substitution, and the blocked rank-k append."""

import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.cholesky import (
    cholesky_append_padded,
    cholesky_with_substitute,
    factor,
)
from friedrich_tpu.ops.covariance import (
    cross_covariance_train_padded,
    gradient_covariances_padded,
    train_covariance_padded,
)

import oracle as orc

RNG = np.random.default_rng(1)


def _pad(x, cap):
    out = np.zeros((cap, x.shape[1]))
    out[: x.shape[0]] = x
    return jnp.asarray(out)


def test_train_covariance_padded_matches_oracle():
    x = RNG.normal(size=(6, 2))
    kern, okern = fk.SquaredExp(ls=0.8, ampl=1.5), orc.OSquaredExp(0.8, 1.5)
    noise = 0.3
    cap = 10
    k_pad = np.asarray(train_covariance_padded(kern, _pad(x, cap), 6, noise))
    want = orc.make_cov(x, okern, noise)
    np.testing.assert_allclose(k_pad[:6, :6], want, rtol=1e-9, atol=1e-11)
    # dead block is exactly the identity
    np.testing.assert_array_equal(k_pad[6:, 6:], np.eye(4))
    np.testing.assert_array_equal(k_pad[:6, 6:], 0.0)
    np.testing.assert_array_equal(k_pad[6:, :6], 0.0)


def test_padded_cholesky_equals_live_cholesky():
    x = RNG.normal(size=(5, 3))
    kern, okern = fk.Matern2(ls=1.1, ampl=0.9), orc.OMatern2(1.1, 0.9)
    k_pad = train_covariance_padded(kern, _pad(x, 8), 5, 0.2)
    l_pad, ok = factor(k_pad)
    assert bool(ok)
    want = orc.make_cholesky_cov_matrix(x, okern, 0.2)
    np.testing.assert_allclose(np.asarray(l_pad)[:5, :5], want, rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(l_pad)[5:, 5:], np.eye(3), atol=1e-12)


def test_gradient_covariances_padded():
    x = RNG.normal(size=(5, 2))
    kern, okern = fk.Exponential(ls=0.7, ampl=1.2), orc.OExponential(0.7, 1.2)
    g = np.asarray(gradient_covariances_padded(kern, _pad(x, 7), 5, method="direct"))
    want = orc.make_gradient_covariance_matrices(x, okern)
    assert g.shape == (2, 7, 7)
    for p in range(2):
        np.testing.assert_allclose(g[p, :5, :5], want[p], rtol=1e-9, atol=1e-11)
        np.testing.assert_array_equal(g[p, 5:, :], 0.0)
        np.testing.assert_array_equal(g[p, :, 5:], 0.0)


def test_cross_covariance_train_padded_zeroes_dead_rows():
    x = RNG.normal(size=(4, 2))
    xq = RNG.normal(size=(3, 2))
    kern, okern = fk.SquaredExp(ls=1.0, ampl=1.0), orc.OSquaredExp(1.0, 1.0)
    c = np.asarray(cross_covariance_train_padded(kern, _pad(x, 6), 4, jnp.asarray(xq)))
    want = orc.make_covariance_matrix(x, xq, okern)
    np.testing.assert_allclose(c[:4], want, rtol=1e-9, atol=1e-11)
    np.testing.assert_array_equal(c[4:], 0.0)


def test_substitute_cholesky_equals_plain_on_psd():
    a = RNG.normal(size=(37, 37))
    k = a @ a.T + 37 * np.eye(37)
    l_plain = np.linalg.cholesky(k)
    l_sub = np.asarray(cholesky_with_substitute(jnp.asarray(k), 1e-6, block=16))
    np.testing.assert_allclose(l_sub, l_plain, rtol=1e-9, atol=1e-11)


def test_substitute_cholesky_fixes_failing_pivot():
    # rank-deficient matrix: plain Cholesky fails, substitute succeeds
    a = RNG.normal(size=(20, 3))
    k = a @ a.T  # rank 3 << 20
    l_plain, ok = factor(jnp.asarray(k))
    assert not bool(ok)
    eps = 1e-8
    l_sub = np.asarray(cholesky_with_substitute(jnp.asarray(k), eps, block=8))
    assert np.all(np.isfinite(l_sub))
    # reconstruction error bounded by the injected jitter scale
    recon = l_sub @ l_sub.T
    assert np.max(np.abs(recon - k)) < 1e-3
    # substituted pivots carry sqrt(eps) on the diagonal
    d = np.diagonal(l_sub)
    assert np.sum(np.isclose(d, np.sqrt(eps))) >= 1


def test_factor_reports_failure_without_eps():
    k = jnp.asarray(-np.eye(4))
    _, ok = factor(k)
    assert not bool(ok)


def test_blocked_append_matches_one_row_inserts():
    kern, okern = fk.SquaredExp(ls=0.9, ampl=1.3), orc.OSquaredExp(0.9, 1.3)
    noise = 0.25
    x_old = RNG.normal(size=(5, 2))
    x_new = RNG.normal(size=(3, 2))
    # oracle: insert one row at a time (algebra/mod.rs:108-125)
    l = orc.make_cholesky_cov_matrix(x_old, okern, noise)
    x_acc = x_old.copy()
    for i in range(3):
        l = orc.cholesky_insert_row(l, x_acc, x_new[i], okern, noise)
        x_acc = np.vstack([x_acc, x_new[i]])
    # ours: single blocked rank-3 append into padded buffers
    cap = 12
    x_pad = np.zeros((cap, 2))
    x_pad[:5] = x_old
    x_pad[5:8] = x_new
    k_pad = train_covariance_padded(kern, jnp.asarray(np.where(np.arange(cap)[:, None] < 5, x_pad, 0.0)), 5, noise)
    l_pad, ok = factor(k_pad)
    assert bool(ok)
    l_new = cholesky_append_padded(
        l_pad, kern, jnp.asarray(x_pad), jnp.asarray(5, jnp.int32), 3, noise
    )
    np.testing.assert_allclose(np.asarray(l_new)[:8, :8], l, rtol=1e-8, atol=1e-10)
    # dead region still identity
    np.testing.assert_allclose(np.asarray(l_new)[8:, 8:], np.eye(4), atol=1e-12)
