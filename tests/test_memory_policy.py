"""Device-parameterized memory policy (VERDICT round-4 weak #5).

The single-chip capacity constants were measured on a 16 GB v5e; these
tests pin (a) the reference-chip values are reproduced exactly when the
device reports 16 GB (or nothing), (b) O(cap^2)-footprint thresholds
scale with sqrt(HBM) when the device is larger, (c) explicit
``set_memory_policy`` pins win over derivation, and (d) the fault-measured
MCMC envelopes do NOT silently scale (override-only by design).
"""

from __future__ import annotations

import pytest

from friedrich_tpu import config
from friedrich_tpu.mcmc import nuts as nuts_mod
from friedrich_tpu.models import gp as gp_mod


@pytest.fixture(autouse=True)
def _restore_policy():
    yield
    config._reset_memory_policy_for_testing()


def test_reference_chip_reproduces_measured_constants():
    config._reset_memory_policy_for_testing(config.REFERENCE_HBM_BYTES)
    assert gp_mod.panel_inverse_cap() == gp_mod.PANEL_INVERSE_CAP
    assert gp_mod.auto_large_threshold() == gp_mod._AUTO_LARGE_THRESHOLD
    assert config.memory_scale() == 1.0


def test_cpu_backend_falls_back_to_reference():
    # conftest pins JAX_PLATFORMS=cpu: derivation must not consult host RAM
    config._reset_memory_policy_for_testing()
    assert config.device_hbm_bytes() == config.REFERENCE_HBM_BYTES


def test_quadratic_footprint_thresholds_scale_sqrt():
    config._reset_memory_policy_for_testing(4 * config.REFERENCE_HBM_BYTES)
    assert config.memory_scale() == 4.0
    assert gp_mod.panel_inverse_cap() == 2 * gp_mod.PANEL_INVERSE_CAP
    assert gp_mod.auto_large_threshold() == 2 * gp_mod._AUTO_LARGE_THRESHOLD


def test_explicit_pin_beats_derivation():
    config._reset_memory_policy_for_testing(4 * config.REFERENCE_HBM_BYTES)
    config.set_memory_policy(panel_inverse_cap=42_000)
    assert gp_mod.panel_inverse_cap() == 42_000
    config.set_memory_policy(panel_inverse_cap=None)  # restore derived
    assert gp_mod.panel_inverse_cap() == 2 * gp_mod.PANEL_INVERSE_CAP


def test_unknown_knob_rejected():
    with pytest.raises(ValueError, match="unknown memory-policy knob"):
        config.set_memory_policy(nonsense=1)


def test_mcmc_envelopes_are_override_only():
    """The chain envelope / scan budget are measured runtime-FAULT
    boundaries, not HBM limits: a bigger chip must NOT silently move
    them (scaling a crash boundary from memory size would be a guess),
    but an explicit pin must."""
    config._reset_memory_policy_for_testing(8 * config.REFERENCE_HBM_BYTES)
    assert nuts_mod._chain_envelope() == nuts_mod.TPU_CHAIN_ENVELOPE
    assert nuts_mod._scan_work_budget() == nuts_mod.TPU_SCAN_WORK_BUDGET
    config.set_memory_policy(chain_envelope=65536, scan_work_budget=5e13)
    assert nuts_mod._chain_envelope() == 65536
    assert nuts_mod._scan_work_budget() == 5e13


def test_predict_batch_cliff_uses_scaled_frontier():
    """predict_in_batches' 1024-row frontier chunking must follow the
    scaled frontier capacity (and an explicit frontier_capacity pin)."""
    import jax.numpy as jnp
    import numpy as np

    import friedrich_tpu as ft

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(32, 3)))
    y = jnp.asarray(rng.normal(size=(32,)))
    gp = ft.GaussianProcess.new(
        ft.priors.ConstantPrior(0.0), ft.kernels.SquaredExp(1.0, 1.0),
        0.3, None, x, y,
    )
    # tiny capacity is far below any frontier: default batch is 8192 —
    # exercised by just running it; with frontier pinned below the
    # capacity the 1024 path engages (observable only via correctness)
    config.set_memory_policy(frontier_capacity=16)
    mean_small, var_small = gp.predict_in_batches(x)
    config.set_memory_policy(frontier_capacity=None)
    mean_big, var_big = gp.predict_in_batches(x)
    np.testing.assert_allclose(
        np.asarray(mean_small), np.asarray(mean_big), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(var_small), np.asarray(var_big), rtol=1e-12
    )
