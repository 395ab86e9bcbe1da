"""Fused panel megakernel (build + downdate): interpret-mode parity with
the plain unrolled streamed path and a hand-rolled oracle strip."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.covariance import cross_covariance
from friedrich_tpu.ops.pallas.panel_fused import (
    fused_panel_strip,
    fused_supported,
)
from friedrich_tpu.ops.streamed import streamed_cholesky_factor

RNG = np.random.default_rng(11)
CAP, BLOCK, N, D = 1024, 512, 900, 3


def _setup(dtype=jnp.float32):
    x = jnp.asarray(RNG.normal(size=(CAP, D)), dtype)
    noise = jnp.asarray(0.7, dtype)
    return x, noise


def _oracle_strip(kernel, x_pad, j0, n, noise, block, l_full):
    """S = masked K strip - L[j0:, :j0] @ L[j0:j0+B, :j0]^T in plain XLA."""
    cap = x_pad.shape[0]
    xj = x_pad[j0 : j0 + block]
    k = cross_covariance(kernel, x_pad[j0:], xj)
    rows = j0 + jnp.arange(cap - j0)[:, None]
    cols = j0 + jnp.arange(block)[None, :]
    diag = rows == cols
    k = k + jnp.where(diag, noise * noise, 0.0)
    live = (rows < n) & (cols < n)
    k = jnp.where(live, k, jnp.where(diag, 1.0, 0.0))
    if j0 > 0:
        k = k - l_full[j0:, :j0] @ l_full[j0 : j0 + block, :j0].T
    return k


@pytest.mark.parametrize(
    "kern",
    [
        fk.SquaredExp(0.9, 1.1),
        fk.Matern1(0.8, 1.0),
        fk.SquaredExp(1.0, 0.8) + fk.Linear(0.2),
    ],
    ids=["sqexp", "matern1", "sum"],
)
def test_fused_strip_matches_oracle(kern):
    x, noise = _setup()
    # a pretend factored prefix: lower-triangular random block column
    l_full = jnp.zeros((CAP, CAP), jnp.float32)
    tri = np.tril(RNG.normal(size=(CAP, BLOCK)) * 0.1)
    l_full = l_full.at[:, :BLOCK].set(jnp.asarray(tri, jnp.float32))
    for j0 in (0, BLOCK):
        with pltpu.force_tpu_interpret_mode():
            got = fused_panel_strip(
                kern, x[j0:], x[j0 : j0 + BLOCK], l_full, N, noise, j0, BLOCK
            )
        want = _oracle_strip(kern, x, j0, N, noise, BLOCK, l_full)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4
        )


def test_fused_factor_matches_unfused():
    x, noise = _setup()
    kern = fk.SquaredExp(0.9, 1.1)
    l_plain, ok_plain = streamed_cholesky_factor(
        kern, x, N, noise, block=BLOCK, unroll=True, fused=False
    )
    with pltpu.force_tpu_interpret_mode():
        l_fused, ok_fused = streamed_cholesky_factor(
            kern, x, N, noise, block=BLOCK, unroll=True, fused=True
        )
    assert bool(ok_plain) and bool(ok_fused)
    np.testing.assert_allclose(
        np.asarray(l_fused), np.asarray(l_plain), atol=5e-4
    )


def test_fused_gate():
    assert fused_supported(1024, 512, jnp.float32)
    assert not fused_supported(1024, 512, jnp.float64)
    assert not fused_supported(1000, 500, jnp.float32)  # 500 % 512 != 0
    with pytest.raises(ValueError):
        x, noise = _setup(jnp.float64)
        streamed_cholesky_factor(
            fk.SquaredExp(0.9, 1.1), x, N, noise, block=BLOCK,
            unroll=True, fused=True,
        )
