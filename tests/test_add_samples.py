"""Incremental training: add_samples equals the oracle's one-row-at-a-time
Cholesky inserts AND a from-scratch retrain; capacity growth is exercised."""

import numpy as np

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp

import oracle as orc

RNG = np.random.default_rng(4)


def test_add_samples_matches_oracle_and_retrain():
    kern, okern = fk.SquaredExp(ls=0.9, ampl=1.3), orc.OSquaredExp(0.9, 1.3)
    noise = 0.3
    x0 = RNG.normal(size=(5, 2))
    y0 = RNG.normal(size=5)
    x1 = RNG.normal(size=(3, 2))
    y1 = RNG.normal(size=3)

    gp = ft.GaussianProcess.new(fp.ConstantPrior(c=0.2), kern, noise, None, x0, y0)
    gp.add_samples(x1, y1)  # forces capacity growth 5 -> 8

    ogp = orc.OracleGP(orc.OConstantPrior(0.2), okern, noise, x0, y0)
    ogp.add_samples(x1, y1)

    retrain = ft.GaussianProcess.new(
        fp.ConstantPrior(c=0.2), kern, noise, None,
        np.vstack([x0, x1]), np.concatenate([y0, y1]),
    )

    xq = RNG.normal(size=(4, 2))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-8, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), np.asarray(retrain.predict(xq)),
        rtol=1e-8, atol=1e-10,
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict_variance(xq)),
        np.asarray(retrain.predict_variance(xq)),
        rtol=1e-7, atol=1e-10,
    )
    np.testing.assert_allclose(gp.likelihood(), retrain.likelihood(), rtol=1e-8)
    assert gp.num_samples == 8


def test_repeated_adds_amortized_growth():
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.Matern1(ls=1.0, ampl=1.0), 0.2, None,
        RNG.normal(size=(3, 1)), RNG.normal(size=3),
    )
    xs, ys = [np.asarray(gp.state.x[:3])], [None]
    all_x = np.asarray(gp.state.x[:3]).copy()
    all_y = np.asarray(gp.state.resid[:3]).copy()  # zero prior: resid == y
    for _ in range(4):
        x_new = RNG.normal(size=(2, 1))
        y_new = RNG.normal(size=2)
        gp.add_samples(x_new, y_new)
        all_x = np.vstack([all_x, x_new])
        all_y = np.concatenate([all_y, y_new])
    assert gp.num_samples == 11
    assert gp.state.capacity >= 11
    retrain = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.Matern1(ls=1.0, ampl=1.0), 0.2, None, all_x, all_y
    )
    xq = RNG.normal(size=(5, 1))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), np.asarray(retrain.predict(xq)),
        rtol=1e-8, atol=1e-10,
    )


def test_add_samples_then_refit_matches_oracle():
    """The reference demo flow (main.rs:31-39): add samples then refit."""
    x0 = [[0.8], [1.2], [3.8], [4.2]]
    y0 = [3.0, 4.0, -2.0, -2.0]
    gp = ft.GaussianProcess.default(x0, y0)
    ogp = orc.oracle_default_gp(x0, y0)

    x1 = [[0.0], [1.0], [2.0], [5.0]]
    y1 = [2.0, 3.0, -1.0, -2.0]
    gp.add_samples(x1, y1)
    ogp.add_samples(x1, y1)
    gp.fit_parameters(True, True, max_iter=20, convergence_fraction=1e-12)
    ogp.fit_parameters(True, True, 20, 1e-12)

    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()), ogp.kern.get_parameters(), rtol=1e-5
    )
    np.testing.assert_allclose(gp.noise, ogp.noise, rtol=1e-5)
    xq = [[1.0], [2.0], [3.0]]
    np.testing.assert_allclose(gp.predict(xq), ogp.predict(xq), rtol=1e-5, atol=1e-7)


def test_failed_add_samples_leaves_model_unchanged():
    """Regression: a non-PSD append must raise WITHOUT corrupting the GP."""
    x = [[1.0], [2.0], [3.0]]
    y = [1.0, 2.0, 3.0]
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.0, None, x, y,
        capacity=8,
    )
    before_pred = gp.predict([1.5])
    before_n = gp.num_samples
    with np.testing.assert_raises(ft.CholeskyError):
        gp.add_samples([[1.0], [1.0]], [1.0, 1.0])  # duplicates, zero noise
    assert gp.num_samples == before_n
    np.testing.assert_allclose(gp.predict([1.5]), before_pred)
    # and the model still works for valid appends afterwards
    gp.add_samples([[4.0]], [4.0])
    assert gp.num_samples == 4
