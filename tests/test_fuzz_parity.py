"""Randomized parity fuzzing: random kernel/prior/data/capacity configs,
full predict+likelihood agreement vs the direct-loop oracle."""

import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp

import oracle as orc


def _rand_kernel(rng):
    choices = [
        lambda: (fk.SquaredExp(ls=rng.uniform(0.5, 2), ampl=rng.uniform(0.5, 2)),
                 lambda k: orc.OSquaredExp(float(k.ls), float(k.ampl))),
        lambda: (fk.Exponential(ls=rng.uniform(0.5, 2), ampl=rng.uniform(0.5, 2)),
                 lambda k: orc.OExponential(float(k.ls), float(k.ampl))),
        lambda: (fk.Matern1(ls=rng.uniform(0.5, 2), ampl=rng.uniform(0.5, 2)),
                 lambda k: orc.OMatern1(float(k.ls), float(k.ampl))),
        lambda: (fk.Matern2(ls=rng.uniform(0.5, 2), ampl=rng.uniform(0.5, 2)),
                 lambda k: orc.OMatern2(float(k.ls), float(k.ampl))),
        lambda: (fk.RationalQuadratic(alpha=rng.uniform(0.5, 2), ls=rng.uniform(0.5, 2)),
                 lambda k: orc.ORationalQuadratic(float(k.alpha), float(k.ls))),
    ]
    kern, mk = choices[rng.integers(len(choices))]()
    okern = mk(kern)
    if rng.random() < 0.25:  # occasionally compose with a Linear term
        c = float(rng.uniform(0.1, 1.0))
        kern = kern + fk.Linear(c=c)
        okern = orc.OKernelSum(okern, orc.OLinear(c))
    return kern, okern


def _rand_prior(rng, d):
    r = rng.integers(3)
    if r == 0:
        return fp.ZeroPrior(), orc.OZeroPrior()
    if r == 1:
        c = rng.normal()
        return fp.ConstantPrior(c=c), orc.OConstantPrior(c)
    w = rng.normal(size=d)
    b = rng.normal()
    return fp.LinearPrior(weights=w, intercept=b), orc.OLinearPrior(w, b)


@pytest.mark.parametrize("seed", range(20))
def test_random_config_parity(seed):
    rng = np.random.default_rng(1000 + seed)
    n = int(rng.integers(3, 16))
    d = int(rng.integers(1, 5))
    cap = n + int(rng.integers(0, 8))
    noise = float(rng.uniform(0.05, 0.6))
    x = rng.normal(size=(n, d))
    y = rng.normal(size=n)
    kern, okern = _rand_kernel(rng)
    prior, oprior = _rand_prior(rng, d)

    gp = ft.GaussianProcess.new(prior, kern, noise, None, x, y, capacity=cap)
    ogp = orc.OracleGP(oprior, okern, noise, x, y)

    xq = rng.normal(size=(int(rng.integers(1, 7)), d))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict_variance(xq)), ogp.predict_variance(xq),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict_covariance(xq)), ogp.predict_covariance(xq),
        rtol=1e-6, atol=1e-8,
    )
    np.testing.assert_allclose(gp.likelihood(), ogp.likelihood(), rtol=1e-8)

    # incremental append parity on the same random config
    k_new = int(rng.integers(1, 4))
    xn = rng.normal(size=(k_new, d))
    yn = rng.normal(size=k_new)
    gp.add_samples(xn, yn)
    ogp.add_samples(xn, yn)
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-7, atol=1e-9
    )
