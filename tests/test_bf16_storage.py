"""bfloat16 factor STORAGE mode (``storage="bf16"``).

The streamed factorizer computes every panel in float32 (strip builds,
diagonal factorizations, solves, GEMM accumulation) and rounds only the
write-back of each panel to bfloat16 — halving the factor's HBM footprint
(exact GP at n~80k on one 16 GB chip) at near-zero extra rounding in the
default MXU mode, which already reads f32 GEMM operands at bfloat16
precision. Downstream consumers (blocked sweeps, monolithic solves, the
append, scores, serialization) read the bf16 factor and compute in f32.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.streamed import streamed_cholesky_factor
from friedrich_tpu.utils.errors import ConfigError

RNG = np.random.default_rng(7)


def _factor_pair(n=64, block=16, d=4):
    kern = fk.SquaredExp(ls=jnp.float32(1.2), ampl=jnp.float32(1.5))
    x = jnp.asarray(RNG.normal(size=(n, d)), jnp.float32)
    noise = jnp.float32(0.4)
    l32, ok32 = streamed_cholesky_factor(kern, x, n, noise, block=block)
    lbf, okbf = streamed_cholesky_factor(
        kern, x, n, noise, block=block, storage="bf16"
    )
    assert bool(ok32) and bool(okbf)
    return l32, lbf


def test_bf16_storage_factor_close_to_f32():
    l32, lbf = _factor_pair()
    assert lbf.dtype == jnp.bfloat16
    a = np.asarray(l32, np.float64)
    b = np.asarray(lbf, np.float64)
    # bf16 has ~2^-8 relative mantissa precision; the factor entries are
    # O(1) here, so elementwise error is O(1e-2) absolute
    assert np.max(np.abs(a - b)) < 3e-2
    # the rounding genuinely happened (it IS a lower-precision store)
    assert np.max(np.abs(a - b)) > 0


def test_bf16_storage_reconstructs_covariance():
    """L_bf16 @ L_bf16^T stays close to the true covariance — the
    left-looking EXACT residual downdate absorbs earlier panels' storage
    rounding instead of compounding it."""
    kern = fk.SquaredExp(ls=jnp.float32(1.2), ampl=jnp.float32(1.5))
    n = 96
    x = jnp.asarray(RNG.normal(size=(n, 4)), jnp.float32)
    noise = jnp.float32(0.4)
    from friedrich_tpu.ops.covariance import train_covariance_padded

    k = np.asarray(train_covariance_padded(kern, x, n, noise), np.float64)
    lbf, ok = streamed_cholesky_factor(
        kern, x, n, noise, block=16, storage="bf16"
    )
    assert bool(ok)
    b = np.asarray(lbf, np.float64)
    rec = b @ b.T
    assert np.max(np.abs(rec - k)) < 5e-2 * np.max(np.abs(k))


def test_bf16_storage_validation():
    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
    x32 = jnp.asarray(RNG.normal(size=(32, 3)), jnp.float32)
    x64 = jnp.asarray(RNG.normal(size=(32, 3)), jnp.float64)
    noise = jnp.float32(0.5)
    with pytest.raises(ValueError, match="storage must be None"):
        streamed_cholesky_factor(kern, x32, 32, noise, block=16, storage="f8")
    with pytest.raises(ValueError, match="float32 inputs"):
        streamed_cholesky_factor(
            kern, x64, 32, jnp.float64(0.5), block=16, storage="bf16"
        )
    with pytest.raises(ValueError, match="unrolled path"):
        streamed_cholesky_factor(
            kern, x32, 32, noise, block=16, storage="bf16", unroll=False
        )
    for mode in ("f32x3", "f32"):
        with pytest.raises(ValueError, match="incompatible"):
            streamed_cholesky_factor(
                kern, x32, 32, noise, block=16, storage="bf16", precision=mode
            )
    # precision="bf16" is explicitly allowed (it IS the storage mode's math)
    l_mat, ok = streamed_cholesky_factor(
        kern, x32, 32, noise, block=16, storage="bf16", precision="bf16"
    )
    assert bool(ok) and l_mat.dtype == jnp.bfloat16
    # donated buffer must match the storage dtype
    with pytest.raises(ValueError, match="does not match"):
        streamed_cholesky_factor(
            kern, x32, 32, noise, block=16, storage="bf16",
            l0=jnp.zeros((32, 32), jnp.float32),
        )


def test_bf16_storage_requires_streamed_backend():
    x = RNG.normal(size=(24, 2)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    with pytest.raises(ConfigError, match="streamed"):
        ft.GaussianProcess.new(
            ft.priors.ConstantPrior(0.0), fk.SquaredExp(ls=1.0, ampl=1.0),
            0.3, None, x, y, backend="dense", storage="bf16",
        )
    with pytest.raises(ConfigError, match="unknown factor storage"):
        ft.GaussianProcessBuilder(x, y).set_factor_storage("f8")


def test_bf16_storage_end_to_end_gp():
    """Builder -> train -> predict/variance/scores with the bf16-stored
    factor: close to the dense f32 model, same API."""
    x = RNG.normal(size=(96, 3)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    xq = RNG.normal(size=(11, 3)).astype(np.float32)

    gp32 = (
        ft.GaussianProcessBuilder(x, y)
        .set_kernel(fk.SquaredExp(ls=1.0, ampl=1.0))
        .set_noise(0.3)
        .train()
    )
    gpbf = (
        ft.GaussianProcessBuilder(x, y)
        .set_kernel(fk.SquaredExp(ls=1.0, ampl=1.0))
        .set_noise(0.3)
        .set_dtype("float32")
        .set_backend("streamed")
        .set_factor_storage("bf16")
        .train()
    )
    assert gpbf.state.l.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gpbf.predict(xq)), np.asarray(gp32.predict(xq)), atol=0.05
    )
    np.testing.assert_allclose(
        np.asarray(gpbf.predict_variance(xq)),
        np.asarray(gp32.predict_variance(xq)),
        atol=0.05,
    )
    mean, var = gpbf.predict_mean_variance(xq)
    assert np.all(np.isfinite(np.asarray(mean)))
    assert np.all(np.asarray(var) > -1e-3)
    # scores are finite and near the f32 model's
    assert abs(gpbf.log_marginal_likelihood() - gp32.log_marginal_likelihood()) < 0.5 + 0.02 * abs(gp32.log_marginal_likelihood())
    assert np.isfinite(gpbf.likelihood())


def test_bf16_storage_add_samples_matches_retrain():
    x = RNG.normal(size=(48, 2)).astype(np.float32)
    y = np.cos(x.sum(axis=1)).astype(np.float32)
    x2 = RNG.normal(size=(16, 2)).astype(np.float32)
    y2 = np.cos(x2.sum(axis=1)).astype(np.float32)
    xq = RNG.normal(size=(7, 2)).astype(np.float32)

    def build(xs, ys, cap=None):
        return (
            ft.GaussianProcessBuilder(xs, ys)
            .set_kernel(fk.SquaredExp(ls=0.8, ampl=1.0))
            .set_noise(0.25)
            .set_dtype("float32")
            .set_backend("streamed")
            .set_factor_storage("bf16")
            .set_capacity(cap)
            .train()
        )

    gp = build(x, y, cap=64)
    gp.add_samples(x2, y2)
    assert gp.state.l.dtype == jnp.bfloat16
    retrained = build(np.vstack([x, x2]), np.concatenate([y, y2]), cap=64)
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), np.asarray(retrained.predict(xq)),
        atol=0.05,
    )


def test_bf16_storage_append_survives_low_noise():
    """Regression: the O(n^2 k) rank-update against the bf16-ROUNDED
    factor goes indefinite at n=500/noise=0.1 (storage rounding amplifies
    through S^T S past the noise^2 regularization); the bf16-storage
    append refactorizes instead and must succeed where the f32 rank-update
    does."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(500, 4)).astype(np.float32)
    y = np.sin(x.sum(1)).astype(np.float32)
    x2 = rng.normal(size=(50, 4)).astype(np.float32)
    y2 = rng.normal(size=50).astype(np.float32)

    def build(storage):
        return (
            ft.GaussianProcessBuilder(x, y)
            .set_kernel(fk.SquaredExp(ls=1.0, ampl=1.0))
            .set_noise(0.1)
            .set_dtype("float32")
            .set_backend("streamed")
            .set_factor_storage(storage)
            .set_capacity(600)
            .train()
        )

    gp32, gpbf = build(None), build("bf16")
    gp32.add_samples(x2, y2)
    gpbf.add_samples(x2, y2)  # raised CholeskyError before the rebuild path
    assert gpbf.num_samples == 550
    assert gpbf.state.l.dtype == jnp.bfloat16
    lml32, lmlbf = gp32.log_marginal_likelihood(), gpbf.log_marginal_likelihood()
    assert np.isfinite(lmlbf)
    assert abs(lmlbf - lml32) < 5.0 + 0.01 * abs(lml32)


def test_bf16_storage_set_hyperparameters_rebuild():
    x = RNG.normal(size=(32, 2)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    gp = (
        ft.GaussianProcessBuilder(x, y)
        .set_kernel(fk.SquaredExp(ls=0.7, ampl=1.0))
        .set_noise(0.3)
        .set_dtype("float32")
        .set_backend("streamed")
        .set_factor_storage("bf16")
        .train()
    )
    gp.set_hyperparameters(kernel=fk.SquaredExp(ls=1.3, ampl=0.9), noise=0.2)
    assert gp.state.l.dtype == jnp.bfloat16
    assert np.isfinite(gp.log_marginal_likelihood())


def test_bf16_storage_serialization_roundtrip(tmp_path):
    x = RNG.normal(size=(40, 2)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    xq = RNG.normal(size=(5, 2)).astype(np.float32)
    gp = (
        ft.GaussianProcessBuilder(x, y)
        .set_kernel(fk.SquaredExp(ls=1.0, ampl=1.0))
        .set_noise(0.3)
        .set_dtype("float32")
        .set_backend("streamed")
        .set_factor_storage("bf16")
        .train()
    )
    path = str(tmp_path / "model_bf16")
    gp.save(path)
    loaded = ft.GaussianProcess.load(path)
    assert loaded.state.l.dtype == jnp.bfloat16
    assert loaded.state.storage == "bf16"
    np.testing.assert_array_equal(
        np.asarray(gp.predict(xq)), np.asarray(loaded.predict(xq))
    )


def test_blocked_solves_accept_bf16_factor():
    """The blocked sweeps read a bf16 factor natively: panel GEMMs promote
    to f32, diagonal blocks are inverted in f32 (``lower_inverse``)."""
    from friedrich_tpu.ops.blocked_solve import (
        blocked_cho_solve, blocked_solve_lower, blocked_solve_lower_t,
        panel_inverses,
    )

    n, m = 64, 3
    a = RNG.normal(size=(n, n))
    k = (a @ a.T + n * np.eye(n)).astype(np.float32)
    l_f32 = np.linalg.cholesky(k).astype(np.float32)
    l_bf = jnp.asarray(l_f32).astype(jnp.bfloat16)
    c = jnp.asarray(RNG.normal(size=(n, m)), jnp.float32)

    # reference: solve against the ROUNDED factor in f64 (tests the sweep
    # mechanics, not the rounding)
    l_ref = np.asarray(l_bf, np.float64)
    y_ref = np.linalg.solve(l_ref, np.asarray(c, np.float64))
    for unroll in (True, False):
        y = blocked_solve_lower(l_bf, c, block=16, unroll=unroll)
        assert y.dtype == jnp.float32
        np.testing.assert_allclose(np.asarray(y, np.float64), y_ref, atol=2e-3)
    x_ref = np.linalg.solve(l_ref.T, y_ref)
    np.testing.assert_allclose(
        np.asarray(blocked_cho_solve(l_bf, c, block=16), np.float64),
        x_ref, atol=5e-3,
    )
    xt = blocked_solve_lower_t(l_bf, jnp.asarray(y_ref, jnp.float32), block=16)
    np.testing.assert_allclose(np.asarray(xt, np.float64), x_ref, atol=5e-3)

    # precomputed panel inverses come out f32 and give the same sweep
    inv = panel_inverses(l_bf, block=16)
    assert inv.dtype == jnp.float32
    y2 = blocked_solve_lower(l_bf, c, diag_inv=inv)
    np.testing.assert_allclose(
        np.asarray(y2, np.float64), y_ref, atol=2e-3
    )


def test_bf16_storage_fit_map_smoke():
    """Hyperparameter fitting composes with the bf16-stored factor (the
    rebuild inside the fit loop keeps the storage mode)."""
    x = RNG.normal(size=(32, 2)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    gp = (
        ft.GaussianProcessBuilder(x, y)
        .set_kernel(fk.SquaredExp(ls=0.9, ampl=1.0))
        .set_noise(0.3)
        .set_dtype("float32")
        .set_backend("streamed")
        .set_factor_storage("bf16")
        .train()
    )
    before = gp.log_marginal_likelihood()
    gp.fit_map(num_steps=10, learning_rate=0.05)
    assert gp.state.l.dtype == jnp.bfloat16
    assert np.isfinite(gp.log_marginal_likelihood())
    assert gp.log_marginal_likelihood() >= before - 1.0


# ---------------------------------------------------------------------------
# Distributed bf16 storage (8 virtual devices)
# ---------------------------------------------------------------------------

import jax  # noqa: E402


def _dist_problem(cap=128, n=100, d=3):
    rng = np.random.default_rng(11)
    x = jnp.zeros((cap, d), jnp.float32).at[:n].set(
        jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    )
    return x, n


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_distributed_bf16_storage_factor_close():
    from friedrich_tpu.parallel.distributed_cholesky import (
        distributed_cholesky_factor,
    )
    from friedrich_tpu.parallel.mesh import make_matrix_mesh

    kern = fk.SquaredExp(ls=jnp.float32(0.9), ampl=jnp.float32(1.4))
    x, n = _dist_problem()
    mesh = make_matrix_mesh(8)
    want, okw = distributed_cholesky_factor(
        mesh, kern, x, n, jnp.float32(0.3), block=16
    )
    got, ok = distributed_cholesky_factor(
        mesh, kern, x, n, jnp.float32(0.3), block=16, storage="bf16"
    )
    assert bool(ok) and bool(okw)
    assert got.dtype == jnp.bfloat16
    a = np.asarray(want, np.float64)
    b = np.asarray(got, np.float64)
    assert np.max(np.abs(a - b)) < 3e-2
    with pytest.raises(ValueError, match="float32 inputs"):
        distributed_cholesky_factor(
            mesh, kern, x.astype(jnp.float64), n, 0.3, block=16,
            storage="bf16",
        )


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 virtual devices")
def test_large_scale_bf16_storage_end_to_end():
    """LargeScaleGP with a bf16-stored sharded factor: predict/lml close
    to the f32-stored model; append rebuilds and matches retrain; the
    jitted fit step keeps the storage mode."""
    from friedrich_tpu.parallel.large_scale import LargeScaleGP
    from friedrich_tpu.parallel.mesh import make_matrix_mesh
    from friedrich_tpu.priors import ZeroPrior

    rng = np.random.default_rng(13)
    n, d = 96, 3
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.sin(x.sum(axis=1)) + 0.05 * jnp.asarray(
        rng.normal(size=(n,)), jnp.float32
    )
    xq = jnp.asarray(rng.normal(size=(9, d)), jnp.float32)
    mesh = make_matrix_mesh(8)
    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))

    gp32 = LargeScaleGP(mesh, kern, ZeroPrior(), 0.2, x, y, block=16,
                        capacity=160)
    gpbf = LargeScaleGP(mesh, kern, ZeroPrior(), 0.2, x, y, block=16,
                        capacity=160, storage="bf16")
    assert gpbf.l_sharded.dtype == jnp.bfloat16
    np.testing.assert_allclose(
        np.asarray(gpbf.predict(xq)), np.asarray(gp32.predict(xq)), atol=0.05
    )
    m32, v32 = gp32.predict_mean_variance(xq)
    mbf, vbf = gpbf.predict_mean_variance(xq)
    np.testing.assert_allclose(np.asarray(mbf), np.asarray(m32), atol=0.05)
    np.testing.assert_allclose(np.asarray(vbf), np.asarray(v32), atol=0.05)
    lml32, lmlbf = gp32.log_marginal_likelihood(), gpbf.log_marginal_likelihood()
    assert abs(lmlbf - lml32) < 2.0 + 0.02 * abs(lml32)

    # append: rebuild path (rank-update would go indefinite vs the rounded
    # factor); result matches a from-scratch bf16 model on the same data
    x2 = jnp.asarray(rng.normal(size=(16, d)), jnp.float32)
    y2 = jnp.sin(x2.sum(axis=1))
    gpbf.add_samples(x2, y2)
    assert gpbf.n == n + 16
    assert gpbf.l_sharded.dtype == jnp.bfloat16
    retrained = LargeScaleGP(
        mesh, kern, ZeroPrior(), 0.2,
        jnp.concatenate([x, x2]), jnp.concatenate([y, y2]),
        block=16, capacity=160, storage="bf16",
    )
    np.testing.assert_allclose(
        np.asarray(gpbf.predict(xq)), np.asarray(retrained.predict(xq)),
        atol=1e-4,
    )

    # fit smoke: the jitted iteration factors with the same storage
    gpbf.fit_scaled(max_iter=2)
    assert gpbf.l_sharded.dtype == jnp.bfloat16
    assert np.isfinite(gpbf.log_marginal_likelihood())
