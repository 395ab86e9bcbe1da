"""Out-of-core (host-RAM factor) streamed Cholesky + streamed solves.

The device never holds more than one column panel + one working strip;
results must match the in-HBM paths exactly (same math, same panel
algorithm — only the residency of L changes).
"""

import numpy as np
import jax.numpy as jnp
import pytest
import scipy.linalg

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.covariance import train_covariance_padded
from friedrich_tpu.ops.outofcore import (
    outofcore_cho_solve,
    outofcore_cholesky_factor,
    outofcore_solve_lower,
    outofcore_solve_lower_t,
)

RNG = np.random.default_rng(5)


def _problem(cap=256, n=200, d=4):
    x = jnp.zeros((cap, d), jnp.float32).at[:n].set(
        jnp.asarray(RNG.normal(size=(n, d)), jnp.float32)
    )
    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.2))
    noise = jnp.float32(0.4)
    return x, n, kern, noise


def test_outofcore_factor_matches_dense():
    x, n, kern, noise = _problem()
    k64 = np.asarray(train_covariance_padded(kern, x, n, noise), np.float64)
    want = np.linalg.cholesky(k64)
    l_host, ok = outofcore_cholesky_factor(kern, x, n, noise, block=32)
    assert ok
    assert isinstance(l_host, np.ndarray) and l_host.dtype == np.float32
    np.testing.assert_allclose(
        np.asarray(l_host, np.float64), want, atol=5e-5
    )


def test_outofcore_factor_eps_substitution():
    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
    # duplicate points, zero noise: rank-deficient live block
    x = jnp.zeros((64, 1), jnp.float32).at[:20].set(1.0)
    l_host, ok = outofcore_cholesky_factor(
        kern, x, 20, jnp.float32(0.0), eps=1e-6, block=16
    )
    assert ok
    assert np.isfinite(l_host).all()
    d = np.diagonal(l_host)[:20]
    assert np.sum(np.isclose(d, np.sqrt(1e-6))) >= 1


def test_outofcore_factor_detects_failure():
    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
    x = jnp.zeros((32, 1), jnp.float32).at[:8].set(2.0)
    _, ok = outofcore_cholesky_factor(kern, x, 8, jnp.float32(0.0), block=8)
    assert not ok  # duplicate points, no noise, no eps -> NaN factor


def test_outofcore_solves_match_scipy():
    x, n, kern, noise = _problem()
    l_host, ok = outofcore_cholesky_factor(kern, x, n, noise, block=32)
    assert ok
    c = jnp.asarray(RNG.normal(size=(256, 3)), jnp.float32)
    l64 = np.asarray(l_host, np.float64)
    c64 = np.asarray(c, np.float64)
    y = outofcore_solve_lower(l_host, c)
    np.testing.assert_allclose(
        np.asarray(y, np.float64),
        scipy.linalg.solve_triangular(l64, c64, lower=True),
        atol=2e-4,
    )
    xt = outofcore_solve_lower_t(l_host, c)
    np.testing.assert_allclose(
        np.asarray(xt, np.float64),
        scipy.linalg.solve_triangular(l64.T, c64, lower=False),
        atol=2e-4,
    )
    w = outofcore_cho_solve(l_host, c)
    np.testing.assert_allclose(
        np.asarray(w, np.float64),
        np.linalg.solve(l64 @ l64.T, c64),
        atol=5e-3,
    )
    # 1-D rhs round-trips shape
    v = outofcore_solve_lower(l_host, c[:, 0])
    assert v.shape == (256,)


def test_outofcore_bf16_host_storage():
    import ml_dtypes

    x, n, kern, noise = _problem()
    l32, _ = outofcore_cholesky_factor(kern, x, n, noise, block=32)
    lbf, ok = outofcore_cholesky_factor(
        kern, x, n, noise, block=32, storage="bf16"
    )
    assert ok and lbf.dtype == ml_dtypes.bfloat16
    assert np.max(np.abs(
        np.asarray(l32, np.float64) - np.asarray(lbf, np.float64)
    )) < 3e-2
    # the streamed sweeps read the bf16 host factor natively
    c = jnp.asarray(RNG.normal(size=(256, 2)), jnp.float32)
    y = outofcore_solve_lower(lbf, c)
    assert y.dtype == jnp.float32
    y_ref = scipy.linalg.solve_triangular(
        np.asarray(lbf, np.float64), np.asarray(c, np.float64), lower=True
    )
    np.testing.assert_allclose(np.asarray(y, np.float64), y_ref, atol=5e-3)


def test_outofcore_matches_in_hbm_streamed():
    """Bit-level agreement with the in-HBM streamed factorizer is NOT
    required (different GEMM shapes), but both are factors of the same
    covariance to f32 accuracy."""
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    x, n, kern, noise = _problem(cap=128, n=100)
    l_hbm, ok1 = streamed_cholesky_factor(kern, x, n, noise, block=32)
    l_ooc, ok2 = outofcore_cholesky_factor(kern, x, n, noise, block=32)
    assert bool(ok1) and ok2
    np.testing.assert_allclose(
        np.asarray(l_ooc, np.float64), np.asarray(l_hbm, np.float64),
        atol=5e-5,
    )


def test_outofcore_validation():
    x, n, kern, noise = _problem(cap=64, n=50)
    with pytest.raises(ValueError, match="storage"):
        outofcore_cholesky_factor(kern, x, n, noise, storage="f8")
    with pytest.raises(ValueError, match="float32"):
        outofcore_cholesky_factor(
            kern, x.astype(jnp.float64), n, noise, block=16
        )


@pytest.mark.parametrize("kern", [
    fk.Matern2(ls=1.1, ampl=0.8),
    fk.SquaredExp(ls=0.7, ampl=1.0) + fk.Linear(c=0.2),
    fk.RationalQuadratic(alpha=1.2, ls=0.9),
], ids=lambda k: type(k).__name__)
def test_outofcore_factor_kernel_sweep(kern):
    """Out-of-core build+factor across kernel families (incl. composition)
    matches the dense factorization — same parity net as the in-HBM
    backends (tests/test_f32_backends.py)."""
    rng = np.random.default_rng(9)
    n, cap = 100, 128
    x = jnp.zeros((cap, 3), jnp.float32).at[:n].set(
        jnp.asarray(rng.normal(size=(n, 3)), jnp.float32)
    )
    noise = jnp.float32(0.35)
    k64 = np.asarray(train_covariance_padded(kern, x, n, noise), np.float64)
    want = np.linalg.cholesky(k64)
    l_host, ok = outofcore_cholesky_factor(kern, x, n, noise, block=16)
    assert ok
    np.testing.assert_allclose(
        np.asarray(l_host, np.float64), want, atol=5e-5
    )
