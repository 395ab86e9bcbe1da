"""Float32 performance-path factorizations vs a float64 reference.

The f32 panel paths replace TPU-slow TRSMs with inverse-GEMMs
(``ops/cholesky.rsolve_lower_t``: TPU TRSM measured ~6x slower than a
same-shape GEMM); the f64 parity paths keep back-substitution. This
pins the f32 backends' accuracy at normal single-precision error against
an f64 dense factorization.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.covariance import train_covariance_padded
from friedrich_tpu.ops.hybrid import hybrid_cholesky_factor
from friedrich_tpu.ops.streamed import streamed_cholesky_factor
from friedrich_tpu.ops.tiled import tiled_cholesky_factor

RNG = np.random.default_rng(0)


def _setup(n=256, d=4):
    x = jnp.asarray(RNG.normal(size=(n, d)), jnp.float32)
    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
    noise = jnp.float32(0.5)
    k64 = np.asarray(
        train_covariance_padded(kern, x, n, noise), np.float64
    )
    want = np.linalg.cholesky(k64)
    return x, kern, noise, want


BACKENDS = [
    ("streamed", lambda k, x, n, s: streamed_cholesky_factor(k, x, n, s, block=32)),
    (
        "streamed-unrolled",
        lambda k, x, n, s: streamed_cholesky_factor(
            k, x, n, s, block=32, unroll=True
        ),
    ),
    (
        "streamed-fori",
        lambda k, x, n, s: streamed_cholesky_factor(
            k, x, n, s, block=32, unroll=False
        ),
    ),
    ("tiled", lambda k, x, n, s: tiled_cholesky_factor(k, x, n, s, block=32)),
    ("hybrid", lambda k, x, n, s: hybrid_cholesky_factor(k, x, n, s, block=32)),
    (
        "hybrid-l2",
        lambda k, x, n, s: hybrid_cholesky_factor(k, x, n, s, block=32, levels=2),
    ),
]


@pytest.mark.parametrize("name,factor", BACKENDS, ids=[b[0] for b in BACKENDS])
def test_f32_backend_matches_f64_dense(name, factor):
    n = 256
    x, kern, noise, want = _setup(n)
    l_mat, ok = factor(kern, x, n, noise)
    assert l_mat.dtype == jnp.float32
    assert bool(ok)
    err = np.max(np.abs(np.asarray(l_mat, np.float64) - want))
    assert err < 5e-6, f"{name}: {err}"


def test_f32_backend_with_epsilon_substitute():
    """The eps path's strip solve also runs the f32 inverse-GEMM; a
    well-conditioned problem must be unaffected by eps."""
    n = 128
    x, kern, noise, want = _setup(n)
    l_mat, ok = streamed_cholesky_factor(kern, x, n, noise, eps=1e-6, block=32)
    assert bool(ok)
    err = np.max(np.abs(np.asarray(l_mat, np.float64) - want))
    assert err < 5e-6
