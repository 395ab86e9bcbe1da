"""Pallas fused covariance kernel: interpret-mode parity with the XLA
builders (compiled-mode parity + roofline measured on hardware, see
BASELINE.md)."""

import jax.numpy as jnp
import numpy as np
import pytest
from jax.experimental.pallas import tpu as pltpu

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.covariance import (
    cross_covariance_train_padded,
    train_covariance_padded,
)
from friedrich_tpu.ops.pallas.covariance_pallas import (
    cross_covariance_train_pallas,
    train_covariance_pallas,
)

RNG = np.random.default_rng(51)


@pytest.mark.parametrize("kern", [
    fk.SquaredExp(ls=0.9, ampl=1.3),
    fk.Matern2(ls=1.1, ampl=0.7),
    fk.SquaredExp(ls=0.9, ampl=1.3) + fk.Matern2(ls=1.1, ampl=0.7),
    fk.Linear(c=0.4),
], ids=lambda k: type(k).__name__)
def test_pallas_train_cov_interpret(kern):
    cap, n, d = 512, 400, 8
    x = jnp.asarray(RNG.normal(size=(cap, d)), jnp.float32)
    noise = jnp.asarray(0.3, jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = train_covariance_pallas(kern, x, n, noise)
    want = train_covariance_padded(kern, x, n, noise)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_cross_cov_interpret():
    kern = fk.SquaredExp(ls=0.9, ampl=1.3)
    cap, m, d = 512, 256, 8
    x = jnp.asarray(RNG.normal(size=(cap, d)), jnp.float32)
    xq = jnp.asarray(RNG.normal(size=(m, d)), jnp.float32)
    with pltpu.force_tpu_interpret_mode():
        got = cross_covariance_train_pallas(kern, x, 400, xq)
    want = cross_covariance_train_padded(kern, x, 400, xq)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), atol=2e-5)


def test_pallas_falls_back_on_unaligned_capacity():
    kern = fk.SquaredExp(ls=1.0, ampl=1.0)
    x = jnp.asarray(RNG.normal(size=(100, 3)), jnp.float32)  # 100 % 256 != 0
    got = train_covariance_pallas(kern, x, 80, jnp.asarray(0.2, jnp.float32))
    want = train_covariance_padded(kern, x, 80, jnp.asarray(0.2, jnp.float32))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want), rtol=1e-6)
