"""Large-scale distributed GP: sharded solves and the Hutchinson-trace fit
must agree with the single-device engine at overlapping sizes."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.ops.covariance import gradient_covariances_padded
from friedrich_tpu.ops.streamed_matvec import streamed_grad_matvec
from friedrich_tpu.parallel.large_scale import LargeScaleGP
from friedrich_tpu.parallel.mesh import make_matrix_mesh

RNG = np.random.default_rng(31)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices"
)


def _data(n=160, d=2):
    x = jnp.asarray(RNG.normal(size=(n, d)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.1 * RNG.normal(size=n))
    return x, y


def test_streamed_grad_matvec_matches_dense():
    x, _ = _data(96)
    kern = fk.SquaredExp(ls=0.8, ampl=1.3)
    cap = 96
    v = jnp.asarray(RNG.normal(size=(cap, 3)))
    want = jnp.einsum(
        "pij,jm->pim", gradient_covariances_padded(kern, x, 80, method="gram"), v
    )
    got = streamed_grad_matvec(kern, x, 80, v, block=16)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-9, atol=1e-11)


def test_large_scale_predict_matches_reference_engine():
    x, y = _data()
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.Matern2(ls=1.1, ampl=0.9), fp.ConstantPrior(c=0.2), 0.25, x, y,
        block=16,
    )
    ref = ft.GaussianProcess.new(
        fp.ConstantPrior(c=0.2), fk.Matern2(ls=1.1, ampl=0.9), 0.25, None, x, y
    )
    xq = jnp.asarray(RNG.normal(size=(7, 2)))
    m1, v1 = big.predict_mean_variance(xq)
    m2, v2 = ref.predict_mean_variance(xq)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(
        np.asarray(big.predict(xq)), np.asarray(m2), rtol=1e-9, atol=1e-11
    )
    np.testing.assert_allclose(
        big.log_marginal_likelihood(), ref.log_marginal_likelihood(), rtol=1e-9
    )


def test_large_scale_fit_improves_lml():
    x, y = _data(n=120)
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.SquaredExp(ls=1.0, ampl=1.0), fp.ZeroPrior(), 0.3, x, y, block=16
    )
    before = big.log_marginal_likelihood()
    big.fit_scaled(max_iter=10, convergence_fraction=1e-12, num_probes=8)
    after = big.log_marginal_likelihood()
    assert np.isfinite(after)
    assert after > before


def test_large_scale_capacity_rounding():
    # n not divisible by device count: capacity padded up, results unchanged
    x, y = _data(n=150)  # 150 % 8 != 0
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.SquaredExp(ls=1.0, ampl=1.0), fp.ZeroPrior(), 0.3, x, y, block=16
    )
    ref = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None, x, y
    )
    xq = jnp.asarray(RNG.normal(size=(4, 2)))
    np.testing.assert_allclose(
        np.asarray(big.predict(xq)), np.asarray(ref.predict(xq)),
        rtol=1e-9, atol=1e-11,
    )


def test_distributed_add_samples_matches_retrain():
    # n=115, k=12 straddles a shard boundary (local_rows=20 at cap=160/8)
    x, y = _data(n=115)
    xn = jnp.asarray(RNG.normal(size=(12, 2)))
    yn = jnp.asarray(RNG.normal(size=(12,)))
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.SquaredExp(ls=1.0, ampl=1.2), fp.ConstantPrior(c=0.1),
        0.25, x, y, block=16, capacity=160,
    )
    big.add_samples(xn, yn)
    assert big.n == 127
    ref = ft.GaussianProcess.new(
        fp.ConstantPrior(c=0.1), fk.SquaredExp(ls=1.0, ampl=1.2), 0.25, None,
        jnp.concatenate([x, xn]), jnp.concatenate([y, yn]),
    )
    xq = jnp.asarray(RNG.normal(size=(6, 2)))
    m1, v1 = big.predict_mean_variance(xq)
    m2, v2 = ref.predict_mean_variance(xq)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m2), rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v2), rtol=1e-8, atol=1e-11)
    with pytest.raises(ValueError):
        big.add_samples(jnp.zeros((100, 2)), jnp.zeros((100,)))


def test_large_scale_generic_fit_tracks_exact_reference_path():
    """The Hutchinson generic fit must follow the exact reference
    trajectory (the reference's multiplicative ADAM itself may or may not
    improve the LML on a given problem — parity with it is the criterion,
    matching `optimizer.rs:69-149` behavior)."""
    x, y = _data(n=120)
    mesh = make_matrix_mesh(8)
    # RationalQuadratic is not scalable -> exercises the generic path
    big = LargeScaleGP(
        mesh, fk.RationalQuadratic(alpha=1.0, ls=1.0), fp.ZeroPrior(), 0.3,
        x, y, block=16,
    )
    big.fit_generic(max_iter=6, convergence_fraction=1e-12, num_probes=16)

    ref = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.RationalQuadratic(alpha=1.0, ls=1.0), 0.3, None, x, y
    )
    ref.fit_parameters(False, True, max_iter=6, convergence_fraction=1e-12)

    np.testing.assert_allclose(
        np.asarray(big.kernel.get_params()),
        np.asarray(ref.kernel.get_params()),
        rtol=0.1,
    )
    np.testing.assert_allclose(float(big.noise), ref.noise, rtol=0.1)
    assert np.isfinite(big.log_marginal_likelihood())


def test_large_scale_likelihood_and_sampler_match_reference_engine():
    x, y = _data(n=120)
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.SquaredExp(ls=1.0, ampl=1.2), fp.ConstantPrior(c=0.1),
        0.25, x, y, block=16,
    )
    ref = ft.GaussianProcess.new(
        fp.ConstantPrior(c=0.1), fk.SquaredExp(ls=1.0, ampl=1.2), 0.25, None, x, y
    )
    np.testing.assert_allclose(big.likelihood(), ref.likelihood(), rtol=1e-9)
    xq = jnp.asarray(RNG.normal(size=(4, 2)))
    s_big = big.sample_at(xq)
    s_ref = ref.sample_at(xq)
    np.testing.assert_allclose(
        np.asarray(s_big.mean()), np.asarray(s_ref.mean()), rtol=1e-9, atol=1e-11
    )
    draw = s_big.sample(jax.random.PRNGKey(0))
    assert np.all(np.isfinite(np.asarray(draw)))


def test_large_scale_predict_in_batches():
    x, y = _data(n=120)
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.SquaredExp(ls=1.0, ampl=1.2), fp.ZeroPrior(), 0.25, x, y,
        block=16,
    )
    xq = jnp.asarray(RNG.normal(size=(37, 2)))
    mb, vb = big.predict_in_batches(xq, batch_size=16)
    m, v = big.predict_mean_variance(xq)
    # different chunk widths change GEMM reduction order -> fp tolerance
    np.testing.assert_allclose(np.asarray(mb), np.asarray(m), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(vb), np.asarray(v), rtol=1e-10, atol=1e-13)


def test_large_scale_weights_cache_reuse_and_invalidation():
    """The (beta, alpha) cache must be derived once, reused across calls,
    and dropped on every mutation (fit, add_samples) — a stale cache would
    silently corrupt predictions."""
    x, y = _data(n=96)
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.SquaredExp(ls=1.0, ampl=1.1), fp.ZeroPrior(), 0.3, x, y,
        block=16, capacity=112,
    )
    assert big._cached_weights is None
    xq = jnp.asarray(RNG.normal(size=(5, 2)))
    before = np.asarray(big.predict(xq))
    w0 = big._cached_weights
    assert w0 is not None
    _ = big.predict_mean_variance(xq)
    assert big._cached_weights is w0  # reused, not re-derived

    big.fit_scaled(max_iter=2, convergence_fraction=1e-12)
    assert big._cached_weights is None  # fit dropped it
    after_fit = np.asarray(big.predict(xq))
    assert not np.allclose(before, after_fit)

    xn = jnp.asarray(RNG.normal(size=(6, 2)))
    yn = jnp.asarray(RNG.normal(size=(6,)))
    big.add_samples(xn, yn)
    assert big._cached_weights is None  # append dropped it
    got = np.asarray(big.predict(xq))
    # must agree with a fresh model on the union + identical hyperparams
    fresh = LargeScaleGP(
        mesh, big.kernel, fp.ZeroPrior(), float(big.noise),
        jnp.concatenate([x, xn]), jnp.concatenate([y, yn]), block=16,
    )
    np.testing.assert_allclose(
        got, np.asarray(fresh.predict(xq)), rtol=1e-8, atol=1e-10
    )


def test_large_scale_auto_grow_append():
    x, y = _data(n=64)
    mesh = make_matrix_mesh(8)
    big = LargeScaleGP(
        mesh, fk.SquaredExp(ls=1.0, ampl=1.0), fp.ZeroPrior(), 0.3, x, y,
        block=16,  # capacity == n: any append overflows
    )
    xn = jnp.asarray(RNG.normal(size=(8, 2)))
    yn = jnp.asarray(RNG.normal(size=(8,)))
    with pytest.raises(ValueError):
        big.add_samples(xn, yn)
    big.add_samples(xn, yn, auto_grow=True)  # 1.5x re-sharded rebuild
    assert big.n == 72
    ref = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None,
        jnp.concatenate([x, xn]), jnp.concatenate([y, yn]),
    )
    xq = jnp.asarray(RNG.normal(size=(4, 2)))
    np.testing.assert_allclose(
        np.asarray(big.predict(xq)), np.asarray(ref.predict(xq)),
        rtol=1e-9, atol=1e-11,
    )
