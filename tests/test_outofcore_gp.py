"""OutOfCoreGP facade: host-RAM factor, single-device compute — predictions
must match the in-HBM GaussianProcess on the same data."""

import numpy as np
import jax.numpy as jnp
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
from friedrich_tpu.models import OutOfCoreGP
from friedrich_tpu.priors import ZeroPrior
from friedrich_tpu.utils.errors import CholeskyError

RNG = np.random.default_rng(17)


def _data(n=150, d=3):
    x = RNG.normal(size=(n, d)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    return x, y


def _reference_gp(x, y, noise=0.25):
    return ft.GaussianProcess.new(
        ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), noise, None, x, y,
        dtype="float32",
    )


def test_outofcore_gp_matches_in_hbm():
    x, y = _data()
    xq = RNG.normal(size=(9, 3)).astype(np.float32)
    ref = _reference_gp(x, y)
    gp = OutOfCoreGP(
        fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0)),
        ZeroPrior(), 0.25, x, y, block=32,
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), np.asarray(ref.predict(xq)), atol=2e-4
    )
    m, v = gp.predict_mean_variance(xq)
    mr, vr = ref.predict_mean_variance(xq)
    np.testing.assert_allclose(np.asarray(m), np.asarray(mr), atol=2e-4)
    np.testing.assert_allclose(np.asarray(v), np.asarray(vr), atol=2e-4)
    np.testing.assert_allclose(
        np.asarray(gp.predict_variance(xq)), np.asarray(vr), atol=2e-4
    )
    assert abs(
        gp.log_marginal_likelihood() - ref.log_marginal_likelihood()
    ) < 0.05 + 1e-3 * abs(ref.log_marginal_likelihood())
    assert abs(gp.likelihood() - ref.likelihood()) < 0.05 + 1e-3 * abs(
        ref.likelihood()
    )


def test_outofcore_gp_batches_and_sampling():
    x, y = _data()
    gp = OutOfCoreGP(
        fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0)),
        ZeroPrior(), 0.25, x, y, block=32,
    )
    xq = RNG.normal(size=(20, 3)).astype(np.float32)
    m, v = gp.predict_in_batches(xq, batch_size=8)
    m2, v2 = gp.predict_mean_variance(xq)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m2), atol=1e-5)
    np.testing.assert_allclose(np.asarray(v), np.asarray(v2), atol=1e-5)
    import jax

    mvn = gp.sample_at(xq[:4])
    s = mvn.sample(jax.random.PRNGKey(0))
    assert np.asarray(s).shape == (4,)


def test_outofcore_gp_add_samples_and_hyperparams():
    x, y = _data(n=80)
    x2, y2 = _data(n=20)
    xq = RNG.normal(size=(6, 3)).astype(np.float32)
    gp = OutOfCoreGP(
        fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0)),
        ZeroPrior(), 0.25, x, y, block=16, capacity=112,
    )
    gp.add_samples(x2, y2)
    assert gp.n == 100
    ref = _reference_gp(np.vstack([x, x2]), np.concatenate([y, y2]))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), np.asarray(ref.predict(xq)), atol=5e-4
    )
    # growth past capacity
    x3, y3 = _data(n=30)
    gp.add_samples(x3, y3)
    assert gp.n == 130 and gp.x.shape[0] >= 130
    # hyperparameter swap rebuilds
    gp.set_hyperparameters(
        kernel=fk.SquaredExp(ls=jnp.float32(1.5), ampl=jnp.float32(0.8)),
        noise=0.3,
    )
    assert np.isfinite(gp.log_marginal_likelihood())


def test_outofcore_gp_bf16_storage():
    import ml_dtypes

    x, y = _data()
    xq = RNG.normal(size=(7, 3)).astype(np.float32)
    ref = _reference_gp(x, y)
    gp = OutOfCoreGP(
        fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0)),
        ZeroPrior(), 0.25, x, y, block=32, storage="bf16",
    )
    assert gp.l_host.dtype == ml_dtypes.bfloat16
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), np.asarray(ref.predict(xq)), atol=0.05
    )


def test_outofcore_gp_failure_restores():
    # duplicate appended points with zero noise break PSD-ness
    x, y = _data(n=40)
    gp = OutOfCoreGP(
        fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0)),
        ZeroPrior(), 0.0, x, y, block=16, capacity=64,
    )
    before = np.asarray(gp.predict(x[:3]))
    with pytest.raises(CholeskyError):
        gp.add_samples(x[:5], y[:5])  # exact duplicates, noise=0
    assert gp.n == 40
    np.testing.assert_allclose(
        np.asarray(gp.predict(x[:3])), before, atol=1e-6
    )


def test_outofcore_fit_matches_large_scale():
    """Same estimator, same fixed probes, same ADAM rules: the out-of-core
    fit must track LargeScaleGP's trajectory on one device to float
    tolerance."""
    import jax
    from jax.sharding import Mesh
    from friedrich_tpu.parallel.large_scale import LargeScaleGP

    x, y = _data(n=96)
    kern = fk.SquaredExp(ls=jnp.float32(0.8), ampl=jnp.float32(1.0))
    mesh = Mesh(np.array(jax.devices()[:1]), ("rows",))
    ref = LargeScaleGP(mesh, kern, ZeroPrior(), 0.3, x, y, block=16)
    ref.fit_scaled(max_iter=4, num_probes=4, seed=0)
    gp = OutOfCoreGP(kern, ZeroPrior(), 0.3, x, y, block=16)
    gp.fit_scaled(max_iter=4, num_probes=4, seed=0)
    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()),
        np.asarray(ref.kernel.get_params()), rtol=2e-3,
    )
    np.testing.assert_allclose(
        float(gp.noise), float(ref.noise), rtol=2e-3
    )
    before = gp.log_marginal_likelihood()
    gp.fit_generic(max_iter=3, num_probes=4, seed=0)
    assert np.isfinite(gp.log_marginal_likelihood())
    # the generic path moves parameters too (not a no-op)
    assert np.isfinite(float(gp.noise)) and float(gp.noise) > 0


def test_outofcore_fit_scaled_requires_scalable():
    x, y = _data(n=32)
    gp = OutOfCoreGP(
        fk.RationalQuadratic(alpha=jnp.float32(1.0), ls=jnp.float32(1.0)),
        ZeroPrior(), 0.3, x, y, block=8,
    )
    with pytest.raises(NotImplementedError):
        gp.fit_scaled(max_iter=1)
