"""Native C++ library: compiles, and its f64 loops agree with both the
JAX engine and the NumPy oracle — a three-way parity check."""

import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu import native

import oracle as orc

RNG = np.random.default_rng(41)


@pytest.fixture(scope="module")
def lib():
    try:
        return native.load()
    except Exception as e:  # pragma: no cover - toolchain missing
        pytest.skip(f"native build unavailable: {e}")


KERNELS = [
    (fk.SquaredExp(ls=0.8, ampl=1.4), orc.OSquaredExp(0.8, 1.4)),
    (fk.Exponential(ls=1.1, ampl=0.9), orc.OExponential(1.1, 0.9)),
    (fk.Matern1(ls=0.7, ampl=1.2), orc.OMatern1(0.7, 1.2)),
    (fk.Matern2(ls=1.3, ampl=0.6), orc.OMatern2(1.3, 0.6)),
    (fk.RationalQuadratic(alpha=1.2, ls=0.9), orc.ORationalQuadratic(1.2, 0.9)),
    (fk.Linear(c=0.4), orc.OLinear(0.4)),
    (fk.Polynomial(alpha=0.9, c=1.3, d=2.0), orc.OPolynomial(0.9, 1.3, 2.0)),
    (fk.HyperTan(alpha=0.5, c=0.2), orc.OHyperTan(0.5, 0.2)),
    (fk.Multiquadric(c=0.7), orc.OMultiquadric(0.7)),
]


@pytest.mark.parametrize("kern,okern", KERNELS, ids=lambda k: type(k).__name__)
def test_native_cov_matches_oracle(lib, kern, okern):
    x1 = RNG.normal(size=(6, 3))
    x2 = RNG.normal(size=(4, 3))
    got = native.cov_matrix(kern, x1, x2)
    want = orc.make_covariance_matrix(x1, x2, okern)
    np.testing.assert_allclose(got, want, rtol=1e-12, atol=1e-14)


def test_native_cholesky_and_solves(lib):
    a = RNG.normal(size=(12, 12))
    k = a @ a.T + 12 * np.eye(12)
    l_native = native.cholesky(k)
    l_np = np.linalg.cholesky(k)
    np.testing.assert_allclose(l_native, l_np, rtol=1e-10, atol=1e-12)
    b = RNG.normal(size=(12, 3))
    np.testing.assert_allclose(
        native.solve_lower(l_native, b), np.linalg.solve(l_np, b), rtol=1e-9
    )
    np.testing.assert_allclose(
        native.solve_lower(l_native, b, trans=True),
        np.linalg.solve(l_np.T, b),
        rtol=1e-9,
    )


def test_native_cholesky_eps_substitution(lib):
    a = RNG.normal(size=(10, 2))
    k = a @ a.T  # rank 2
    with pytest.raises(ft.CholeskyError):
        native.cholesky(k)
    l_mat = native.cholesky(k, eps=1e-8)
    assert np.all(np.isfinite(l_mat))
    assert np.sum(np.isclose(np.diagonal(l_mat), np.sqrt(1e-8))) >= 1


def test_native_gp_matches_jax_engine(lib):
    x = RNG.normal(size=(15, 2))
    y = np.sin(x[:, 0]) + 0.1 * RNG.normal(size=15)
    kern = fk.Matern2(ls=1.0, ampl=1.1)
    prior = fp.ConstantPrior(c=0.3)
    ngp = native.NativeGP(kern, prior, 0.2, x, y)
    jgp = ft.GaussianProcess.new(prior, kern, 0.2, None, x, y)
    xq = RNG.normal(size=(5, 2))
    m_n, v_n = ngp.predict_mean_variance(xq)
    m_j, v_j = jgp.predict_mean_variance(xq)
    np.testing.assert_allclose(m_n, np.asarray(m_j), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(v_n, np.asarray(v_j), rtol=1e-8, atol=1e-11)


def test_native_composite_kernels(lib):
    x1 = RNG.normal(size=(6, 2))
    x2 = RNG.normal(size=(4, 2))
    ksum = fk.SquaredExp(ls=0.8, ampl=1.2) + fk.Linear(c=0.3)
    osum = orc.OKernelSum(orc.OSquaredExp(0.8, 1.2), orc.OLinear(0.3))
    np.testing.assert_allclose(
        native.cov_matrix(ksum, x1, x2),
        orc.make_covariance_matrix(x1, x2, osum), rtol=1e-12,
    )
    kprod = fk.Matern1(ls=1.1, ampl=0.9) * fk.RationalQuadratic(alpha=0.8, ls=1.3)
    oprod = orc.OKernelProd(orc.OMatern1(1.1, 0.9), orc.ORationalQuadratic(0.8, 1.3))
    np.testing.assert_allclose(
        native.cov_matrix(kprod, x1, x2),
        orc.make_covariance_matrix(x1, x2, oprod), rtol=1e-12,
    )
    # full NativeGP flow on a composite kernel vs the JAX engine
    y = RNG.normal(size=6)
    ngp = native.NativeGP(ksum, fp.ZeroPrior(), 0.25, x1, y)
    jgp = ft.GaussianProcess.new(fp.ZeroPrior(), ksum, 0.25, None, x1, y)
    m_n, v_n = ngp.predict_mean_variance(x2)
    m_j, v_j = jgp.predict_mean_variance(x2)
    np.testing.assert_allclose(m_n, np.asarray(m_j), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(v_n, np.asarray(v_j), rtol=1e-8, atol=1e-11)
