"""Persistence: save/load round-trips to bit-identical predictions
(serde-equivalent behavior, reference ``Cargo.toml:18-20``)."""

import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp

RNG = np.random.default_rng(5)


@pytest.mark.parametrize(
    "kern",
    [
        fk.SquaredExp(ls=0.7, ampl=1.9),
        fk.Matern2(ls=1.2, ampl=0.8),
        fk.SquaredExp(ls=0.7, ampl=1.0) + fk.Linear(c=0.3),
        fk.Matern1(ls=1.0, ampl=1.0) * fk.RationalQuadratic(alpha=0.9, ls=1.1),
    ],
    ids=lambda k: type(k).__name__,
)
def test_roundtrip_bit_identical(tmp_path, kern):
    x = RNG.normal(size=(6, 2))
    y = RNG.normal(size=6)
    gp = ft.GaussianProcess.new(
        fp.LinearPrior(weights=np.array([0.2, -0.5]), intercept=0.1),
        kern, 0.25, 1e-8, x, y,
    )
    path = str(tmp_path / "model.npz")
    gp.save(path)
    loaded = ft.GaussianProcess.load(path)

    xq = RNG.normal(size=(4, 2))
    np.testing.assert_array_equal(
        np.asarray(gp.predict(xq)), np.asarray(loaded.predict(xq))
    )
    np.testing.assert_array_equal(
        np.asarray(gp.predict_variance(xq)), np.asarray(loaded.predict_variance(xq))
    )
    assert gp.likelihood() == loaded.likelihood()
    assert loaded.cholesky_epsilon == 1e-8
    assert loaded.num_samples == 6


def test_loaded_model_supports_further_training(tmp_path):
    gp = ft.GaussianProcess.default([[0.8], [1.2], [3.8], [4.2]], [3.0, 4.0, -2.0, -2.0])
    path = str(tmp_path / "m.npz")
    gp.save(path)
    loaded = ft.GaussianProcess.load(path)
    loaded.add_samples([[2.0]], [0.5])
    assert loaded.num_samples == 5
    loaded.fit_parameters(True, True, max_iter=3)
    assert np.isfinite(loaded.likelihood())


@pytest.mark.parametrize("backend", ["streamed", "tiled", "hybrid"])
def test_backend_round_trips(tmp_path, backend):
    x = RNG.normal(size=(16, 2))
    y = RNG.normal(size=16)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=0.8, ampl=1.1), 0.2, None, x, y,
        backend=backend,
    )
    path = str(tmp_path / "m.npz")
    gp.save(path)
    loaded = ft.GaussianProcess.load(path)
    assert loaded.state.backend == backend
    xq = RNG.normal(size=(3, 2))
    np.testing.assert_array_equal(
        np.asarray(gp.predict(xq)), np.asarray(loaded.predict(xq))
    )
