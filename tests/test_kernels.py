"""Kernel parity: every kernel's pointwise map and analytic gradients match
the reference formulas (via the direct-loop oracle) at 1e-10, for random
pairs and random (including negative/unsanitized) hyperparameters."""

import numpy as np
import pytest

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.covariance import cross_covariance, kernel_diag
from friedrich_tpu.ops.distance import pairwise_features

import oracle as orc

RNG = np.random.default_rng(0)


def pairs(n=7, m=5, d=3):
    return RNG.normal(size=(n, d)), RNG.normal(size=(m, d))


KERNEL_CASES = [
    (fk.SquaredExp(ls=0.7, ampl=2.3), orc.OSquaredExp(0.7, 2.3)),
    (fk.SquaredExp(ls=1.4, ampl=-0.8), orc.OSquaredExp(1.4, -0.8)),
    (fk.Exponential(ls=0.9, ampl=1.7), orc.OExponential(0.9, 1.7)),
    (fk.Matern1(ls=1.2, ampl=0.6), orc.OMatern1(1.2, 0.6)),
    (fk.Matern2(ls=0.8, ampl=1.1), orc.OMatern2(0.8, 1.1)),
    (fk.Matern2(ls=-0.8, ampl=-1.1), orc.OMatern2(-0.8, -1.1)),
    (fk.Linear(c=0.4), orc.OLinear(0.4)),
    (fk.Polynomial(alpha=0.9, c=1.3, d=2.0), orc.OPolynomial(0.9, 1.3, 2.0)),
    (fk.HyperTan(alpha=0.5, c=0.2), orc.OHyperTan(0.5, 0.2)),
    (fk.Multiquadric(c=0.7), orc.OMultiquadric(0.7)),
    (fk.RationalQuadratic(alpha=1.4, ls=0.9), orc.ORationalQuadratic(1.4, 0.9)),
    (
        fk.SquaredExp(ls=0.7, ampl=1.2) + fk.Linear(c=0.1),
        orc.OKernelSum(orc.OSquaredExp(0.7, 1.2), orc.OLinear(0.1)),
    ),
    (
        fk.Matern1(ls=1.1, ampl=0.9) * fk.RationalQuadratic(alpha=0.8, ls=1.3),
        orc.OKernelProd(orc.OMatern1(1.1, 0.9), orc.ORationalQuadratic(0.8, 1.3)),
    ),
]


@pytest.mark.parametrize("kern,okern", KERNEL_CASES, ids=lambda k: type(k).__name__)
def test_pointwise_matches_oracle(kern, okern):
    x1, x2 = pairs()
    got = np.asarray(cross_covariance(kern, x1, x2, method="direct"))
    want = orc.make_covariance_matrix(x1, x2, okern)
    np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)
    # the MXU gram-trick path agrees to float64 rounding
    got_gram = np.asarray(cross_covariance(kern, x1, x2, method="gram"))
    np.testing.assert_allclose(got_gram, want, rtol=1e-8, atol=1e-10)


@pytest.mark.parametrize("kern,okern", KERNEL_CASES, ids=lambda k: type(k).__name__)
def test_gradients_match_oracle(kern, okern):
    x1, x2 = pairs()
    feats = pairwise_features(x1, x2, kern.needs, method="direct")
    grads = kern.pointwise_grads(feats)
    assert len(grads) == kern.nb_params
    for r in range(x1.shape[0]):
        for c in range(x2.shape[0]):
            want = okern.gradient(x1[r], x2[c])
            got = [float(g[r, c]) for g in grads]
            np.testing.assert_allclose(got, want, rtol=1e-10, atol=1e-12)


@pytest.mark.parametrize("kern,okern", KERNEL_CASES, ids=lambda k: type(k).__name__)
def test_param_roundtrip(kern, okern):
    vec = kern.get_params()
    np.testing.assert_allclose(np.asarray(vec), okern.get_parameters())
    twice = kern.with_params(vec * 2.0)
    np.testing.assert_allclose(np.asarray(twice.get_params()), np.asarray(vec) * 2.0)


def test_diag_matches_pointwise():
    x1, _ = pairs()
    for kern, _ in KERNEL_CASES:
        full = np.asarray(cross_covariance(kern, x1, x1, method="direct"))
        diag = np.asarray(kernel_diag(kern, x1))
        np.testing.assert_allclose(diag, np.diagonal(full), rtol=1e-9, atol=1e-12)


def test_rescale_and_scalable_flags():
    assert fk.SquaredExp().is_scalable
    assert fk.Exponential().is_scalable
    assert fk.Matern1().is_scalable
    assert fk.Matern2().is_scalable
    assert not fk.Linear().is_scalable
    assert not fk.RationalQuadratic().is_scalable
    # Sum: both must be scalable; Prod: either (kernel.rs:150-153, 239-242)
    assert not (fk.SquaredExp() + fk.Linear()).is_scalable
    assert (fk.SquaredExp() * fk.Linear()).is_scalable
    k = fk.SquaredExp(ls=1.0, ampl=2.0).rescale(3.0)
    assert float(k.ampl) == 6.0
    with pytest.raises(NotImplementedError):
        fk.Linear().rescale(2.0)
    # Prod rescales the first scalable child (kernel.rs:264-274)
    p = (fk.Linear(c=1.0) * fk.SquaredExp(ls=1.0, ampl=2.0)).rescale(5.0)
    assert float(p.k2.ampl) == 10.0
    assert float(p.k1.c) == 1.0


def test_heuristic_fit_matches_oracle():
    x = RNG.normal(size=(9, 2))
    y = RNG.normal(size=9)
    fitted = fk.SquaredExp().heuristic_fit(x, y)
    np.testing.assert_allclose(float(fitted.ls), orc.fit_bandwidth_mean(x), rtol=1e-8)
    np.testing.assert_allclose(float(fitted.ampl), np.var(y), rtol=1e-10)


def test_gaussian_alias():
    assert fk.Gaussian is fk.SquaredExp


def test_streamed_bandwidth_heuristic_matches_full():
    from friedrich_tpu.kernels.heuristics import (
        _bandwidth_mean_streamed,
        fit_bandwidth_mean,
    )
    import jax.numpy as jnp

    x = jnp.asarray(RNG.normal(size=(600, 3)))
    full = float(fit_bandwidth_mean(x))
    streamed = float(_bandwidth_mean_streamed(x, "gram", block=120)) / (
        (600 * 599) / 2
    )
    np.testing.assert_allclose(streamed, full, rtol=1e-9)
