"""Mixed-precision (bfloat16) covariance-build path.

``method="gram_bf16"`` computes the pairwise GEMM with bfloat16 inputs and
float32 MXU accumulation (SURVEY §7 dtype policy); norms, the kernel's
elementwise map, and the factorization stay full-precision. Accuracy bound:
input rounding gives a relative feature error ~2^-8, so covariance entries
carry O(1e-2) relative error for O(1) features — a documented performance
trade, not a parity path.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.ops.covariance import cross_covariance
from friedrich_tpu.ops.distance import pairwise_features

RNG = np.random.default_rng(0)


def test_gram_bf16_features_close_to_f32():
    x1 = jnp.asarray(RNG.normal(size=(32, 8)), jnp.float32)
    x2 = jnp.asarray(RNG.normal(size=(24, 8)), jnp.float32)
    needs = frozenset({"dot", "sqdist", "dist"})
    f32 = pairwise_features(x1, x2, needs, method="gram")
    bf16 = pairwise_features(x1, x2, needs, method="gram_bf16")
    for name in needs:
        a, b = np.asarray(f32[name]), np.asarray(bf16[name])
        assert b.dtype == a.dtype  # output dtype unchanged (f32 here)
        scale = np.maximum(np.abs(a), 1.0)
        assert np.max(np.abs(a - b) / scale) < 0.05
    # and it is genuinely lower precision (the cast really happened)
    assert np.max(np.abs(np.asarray(f32["dot"]) - np.asarray(bf16["dot"]))) > 0


def test_gram_bf16_covariance_close():
    kern = fk.SquaredExp(ls=1.5, ampl=2.0)
    x1 = jnp.asarray(RNG.normal(size=(40, 6)), jnp.float32)
    k32 = np.asarray(cross_covariance(kern, x1, x1, method="gram"))
    kbf = np.asarray(cross_covariance(kern, x1, x1, method="gram_bf16"))
    assert np.max(np.abs(k32 - kbf)) < 0.05 * np.max(np.abs(k32))


def test_gram_bf16_end_to_end_gp():
    """Full train+predict through the builder with the bf16 build: close to
    the f32 path, exact same shapes/API."""
    x = RNG.normal(size=(64, 3)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    xq = RNG.normal(size=(9, 3)).astype(np.float32)

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
        .set_distance_method("gram_bf16")
        .train()
    )
    m32 = np.asarray(gp32.predict(xq))
    mbf = np.asarray(gpbf.predict(xq))
    v32 = np.asarray(gp32.predict_variance(xq))
    vbf = np.asarray(gpbf.predict_variance(xq))
    np.testing.assert_allclose(mbf, m32, atol=0.1)
    np.testing.assert_allclose(vbf, v32, atol=0.05)


def test_gram_bf16_in_streamed_and_hybrid_backends():
    """The mixed-precision build threads through the fused factorizers."""
    from friedrich_tpu.ops.hybrid import hybrid_cholesky_factor
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
    n = 64
    x = jnp.asarray(RNG.normal(size=(n, 4)), jnp.float32)
    noise = jnp.float32(0.5)
    l32, ok32 = streamed_cholesky_factor(kern, x, n, noise, block=16)
    lbf, okbf = streamed_cholesky_factor(
        kern, x, n, noise, block=16, method="gram_bf16"
    )
    assert bool(ok32) and bool(okbf)
    assert float(jnp.max(jnp.abs(l32 - lbf))) < 0.1
    lh, okh = hybrid_cholesky_factor(
        kern, x, n, noise, block=16, method="gram_bf16"
    )
    assert bool(okh)
    assert float(jnp.max(jnp.abs(l32 - lh))) < 0.1


def test_builder_rejects_unknown_method():
    from friedrich_tpu.utils.errors import ConfigError

    x = RNG.normal(size=(8, 2))
    y = RNG.normal(size=8)
    with pytest.raises(ConfigError):
        ft.GaussianProcessBuilder(x, y).set_distance_method("fp8")


def test_matmul_precision_scope():
    """config.matmul_precision pins the MXU mode for everything traced
    inside the scope (on CPU all modes are f32-exact; this pins the API:
    valid modes work end-to-end, invalid modes raise)."""
    from friedrich_tpu import config
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    kern = fk.SquaredExp(ls=jnp.float32(0.9), ampl=jnp.float32(1.0))
    x = jnp.asarray(RNG.normal(size=(64, 3)), jnp.float32)
    ref, _ = streamed_cholesky_factor(kern, x, 64, jnp.float32(0.5), block=16)
    for mode in ("bf16", "f32x3", "f32"):
        with config.matmul_precision(mode):
            l_mode, ok = streamed_cholesky_factor(
                kern, x, 64, jnp.float32(0.5), block=16
            )
        assert bool(ok)
        np.testing.assert_allclose(
            np.asarray(l_mode), np.asarray(ref), atol=3e-2
        )
    with pytest.raises(ValueError):
        config.matmul_precision("fp8")


def test_analytic_diagonal_exact():
    """The training-covariance diagonal is k(x,x) + noise^2 with distance
    EXACTLY zero — taken from the analytic per-row kernel diagonal, not
    the gram tile, whose |x|^2+|x|^2-2x.x cancellation puts matmul
    rounding directly on the pivots (catastrophic at bf16 MXU precision:
    measured ~11%% rel diag error at n=8192 before the fix). Large-norm
    f32 inputs make the gram rounding visible even on CPU."""
    from friedrich_tpu.ops.covariance import (
        kernel_diag, train_covariance_padded,
    )
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    kern = fk.SquaredExp(ls=jnp.float32(40.0), ampl=jnp.float32(2.0))
    n = 64
    x = jnp.asarray(RNG.normal(size=(n, 5)) * 100.0, jnp.float32)
    noise = jnp.float32(0.25)
    expect = np.asarray(kernel_diag(kern, x)) + 0.25**2

    k = train_covariance_padded(kern, x, n, noise, method="gram")
    np.testing.assert_array_equal(np.asarray(jnp.diagonal(k)), expect)

    # the fused streamed factorizer's panel strips carry the same diagonal:
    # reconstruct K from the factor and check the diagonal tightly
    l_mat, ok = streamed_cholesky_factor(kern, x, n, noise, block=16)
    assert bool(ok)
    rec = np.asarray(l_mat) @ np.asarray(l_mat).T
    np.testing.assert_allclose(
        np.diagonal(rec), expect, rtol=2e-5
    )


def test_analytic_gradient_diagonal_exact():
    """Per-parameter gradient matrices carry the analytic zero-distance
    diagonal too (they feed the optimizer's tr(K^-1 dK) directly)."""
    from friedrich_tpu.ops.covariance import gradient_covariances_padded
    from friedrich_tpu.ops.distance import diag_features
    from friedrich_tpu.ops.streamed_matvec import streamed_grad_matvec

    kern = fk.SquaredExp(ls=jnp.float32(40.0), ampl=jnp.float32(2.0))
    n = 64
    x = jnp.asarray(RNG.normal(size=(n, 5)) * 100.0, jnp.float32)
    expect = np.stack(
        [np.asarray(g) for g in
         kern.pointwise_grads(diag_features(x, kern.needs))]
    )
    grads = gradient_covariances_padded(kern, x, n)
    got = np.stack([np.diagonal(np.asarray(grads[p])) for p in range(2)])
    np.testing.assert_array_equal(got, expect)

    # the streamed dK @ v path agrees with the materialized matrices
    v = jnp.asarray(RNG.normal(size=(n, 3)), jnp.float32)
    gv = streamed_grad_matvec(kern, x, n, v, block=16)
    ref = np.einsum("pij,jm->pim", np.asarray(grads), np.asarray(v))
    np.testing.assert_allclose(np.asarray(gv), ref, rtol=2e-5, atol=2e-4)
