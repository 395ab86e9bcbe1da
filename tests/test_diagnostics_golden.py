"""Golden tests for the MCMC diagnostics (VERDICT round-4 weak #7).

No third-party MCMC diagnostics package exists in this image (arviz /
tfp / numpyro all absent), so the grounding is twofold:

1. **Closed-form truth**: an AR(1) chain with coefficient phi has
   integrated autocorrelation time tau = (1+phi)/(1-phi), so
   ESS = N / tau exactly in expectation. This pins the estimator against
   math, not another implementation.
2. **Independent transcription**: a direct NumPy implementation of the
   published Stan/Vehtari-et-al-2021 algorithm (split chains, var+,
   Geyer initial-positive + initial-monotone pair sums), written from the
   algorithm description — structurally independent of the FFT-based
   library code path.

The round-4 verdict flagged that the old fixed ``max_lag=100`` cap could
bias ESS optimistic when tau approaches the cap; the phi=0.995 case
(tau ~ 400) exercises exactly that regime.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np
import pytest

from friedrich_tpu.mcmc.diagnostics import ess, rhat, split_chains


def _ar1(phi: float, s: int, c: int, seed: int = 0) -> np.ndarray:
    """Stationary AR(1) chains, unit marginal variance, shape (s, c, 1)."""
    rng = np.random.default_rng(seed)
    x = np.zeros((s, c))
    x[0] = rng.normal(size=c)  # stationary start
    innov = rng.normal(size=(s, c)) * np.sqrt(1.0 - phi * phi)
    for t in range(1, s):
        x[t] = phi * x[t - 1] + innov[t]
    return x[..., None]


def _ess_reference(samples: np.ndarray) -> np.ndarray:
    """Independent NumPy transcription of the Stan ESS-bulk algorithm
    (Vehtari et al. 2021): split chains, var+ normalization, direct-sum
    autocovariances, Geyer initial positive sequence with the monotone
    refinement."""
    s_full = samples.shape[0] - (samples.shape[0] % 2)
    x = np.concatenate(
        [samples[: s_full // 2], samples[s_full // 2: s_full]], axis=1
    )
    s, c, d = x.shape
    out = np.empty(d)
    for j in range(d):
        ch = x[:, :, j]
        mean = ch.mean(axis=0, keepdims=True)
        xc = ch - mean
        w = ch.var(axis=0, ddof=1).mean()
        b = s * mean[0].var(ddof=1)
        var_plus = (s - 1) / s * w + b / s
        # direct-sum (O(s^2)) autocovariance, averaged over chains
        acov = np.array([
            np.mean([(xc[: s - t, k] * xc[t:, k]).sum() / s
                     for k in range(c)])
            for t in range(s - 1)
        ])
        rho = 1.0 - (w - acov) / var_plus
        # Geyer: pair sums until the first non-positive, then monotone
        tau = 0.0
        prev = np.inf
        k = 0
        while 2 * k + 1 < len(rho):
            pair = rho[2 * k] + rho[2 * k + 1]
            if pair <= 0:
                break
            pair = min(pair, prev)
            tau += pair
            prev = pair
            k += 1
        tau = max(2.0 * tau - 1.0, 1e-3)
        out[j] = s * c / tau
    return out


@pytest.mark.parametrize("phi", [0.0, 0.5, 0.9])
def test_ess_matches_ar1_closed_form(phi):
    s, c = 4000, 8
    samples = jnp.asarray(_ar1(phi, s, c))
    tau_true = (1 + phi) / (1 - phi)
    expected = s * c / tau_true
    got = float(ess(samples)[0])
    # single-realization estimator noise: 15% tolerance
    assert abs(got - expected) / expected < 0.15, (phi, got, expected)


def test_ess_no_truncation_bias_at_long_tau():
    """tau ~ 400 >> the old 100-lag cap: the adaptive rule must not
    report optimistically inflated ESS (the old cap would truncate the
    positive-rho tail and underestimate tau by ~4x here)."""
    phi = 0.995
    s, c = 20000, 4
    samples = jnp.asarray(_ar1(phi, s, c, seed=3))
    tau_true = (1 + phi) / (1 - phi)  # = 399
    expected = s * c / tau_true  # ~200
    got = float(ess(samples)[0])
    # long-tau estimates are noisier; the failure mode being tested is a
    # ~4x optimistic bias, so a 2x band is decisive
    assert got < 2.0 * expected, (got, expected)
    assert got > 0.4 * expected, (got, expected)


@pytest.mark.parametrize("phi", [0.3, 0.8])
def test_ess_matches_independent_transcription(phi):
    s, c = 1200, 4
    samples = _ar1(phi, s, c, seed=1)
    ref = _ess_reference(samples)[0]
    got = float(ess(jnp.asarray(samples))[0])
    # same algorithm, different code path (FFT vs direct sums): tight
    assert abs(got - ref) / ref < 1e-6, (got, ref)


def test_ess_max_lag_cap_still_supported():
    samples = jnp.asarray(_ar1(0.5, 2000, 4))
    capped = float(ess(samples, max_lag=100)[0])
    full = float(ess(samples)[0])
    # phi=0.5 has tau=3 — both see the whole positive sequence
    assert abs(capped - full) / full < 1e-6


def test_rhat_closed_form_split_detection():
    """A chain whose halves have different means must trip split-R-hat."""
    rng = np.random.default_rng(0)
    s, c = 1000, 4
    x = rng.normal(size=(s, c, 1))
    x[s // 2:] += 3.0  # drift within every chain
    r = float(rhat(jnp.asarray(x))[0])
    assert r > 1.5
    good = rng.normal(size=(s, c, 1))
    assert float(rhat(jnp.asarray(good))[0]) < 1.01


def test_unmixed_chains_collapse_ess():
    """Chains stuck at different modes: var+ must crush ESS, not inflate."""
    rng = np.random.default_rng(0)
    s, c = 1000, 4
    x = rng.normal(size=(s, c, 1)) * 0.1
    x += np.arange(c)[None, :, None] * 5.0  # separated chains
    assert float(ess(jnp.asarray(x))[0]) < 50


def test_split_chains_shape():
    x = jnp.zeros((11, 3, 2))
    assert split_chains(x).shape == (5, 6, 2)
