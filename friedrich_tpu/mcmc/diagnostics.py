"""MCMC diagnostics: split R-hat and effective sample size.

Standard definitions (Gelman et al., BDA3 / Vehtari et al. 2021 split-R^):
computed per parameter over (num_samples, chains, dim) draws.
"""

from __future__ import annotations

import jax.numpy as jnp

Array = jnp.ndarray


def split_chains(samples: Array) -> Array:
    """(s, c, d) -> (s//2, 2c, d): each chain split in half."""
    s = samples.shape[0] - (samples.shape[0] % 2)
    first, second = samples[: s // 2], samples[s // 2 : s]
    return jnp.concatenate([first, second], axis=1)


def rhat(samples: Array) -> Array:
    """Split-R-hat per dimension. Values near 1.0 indicate convergence."""
    x = split_chains(samples)
    s, c, _ = x.shape
    chain_mean = jnp.mean(x, axis=0)  # (c, d)
    chain_var = jnp.var(x, axis=0, ddof=1)  # (c, d)
    between = s * jnp.var(chain_mean, axis=0, ddof=1)  # (d,)
    within = jnp.mean(chain_var, axis=0)  # (d,)
    var_est = (s - 1) / s * within + between / s
    return jnp.sqrt(var_est / within)


def _autocovariance_fft(xc: Array) -> Array:
    """Biased (/s) per-chain autocovariance at every lag, via FFT.

    ``xc``: (s, c, d) chain-mean-centered draws. Returns (s, c, d).
    O(s log s) per chain/dim — this is what lets the Geyer stopping rule
    see EVERY lag instead of a fixed truncation window.
    """
    s = xc.shape[0]
    nfft = 1
    while nfft < 2 * s:  # zero-pad to avoid circular wrap-around
        nfft *= 2
    f = jnp.fft.rfft(xc, n=nfft, axis=0)
    acov = jnp.fft.irfft(f * jnp.conj(f), n=nfft, axis=0)[:s]
    return jnp.real(acov) / s


def ess(samples: Array, max_lag: int | None = None) -> Array:
    """Bulk effective sample size per dimension (Vehtari et al. 2021:
    combined-chain correlations via var+; Geyer initial positive sequence
    with the initial monotone refinement, adaptively stopped — no fixed
    lag cap).

    ``max_lag``: optional hard cap on the number of lags considered
    (default: all ``s - 1`` available lags; the adaptive stopping rule
    makes the cap unnecessary — it exists only to bound work on very long
    chains).

    Between-chain mean disagreement enters through ``var_plus`` in the
    correlation normalization, so unmixed chains (large R-hat) collapse the
    ESS instead of inflating it.
    """
    x = split_chains(samples)
    s, c, d = x.shape
    chain_mean = jnp.mean(x, axis=0, keepdims=True)
    xc = x - chain_mean
    chain_var = jnp.var(x, axis=0, ddof=1)  # (c, d)
    w = jnp.mean(chain_var, axis=0)  # (d,)
    b = s * jnp.var(chain_mean[0], axis=0, ddof=1)  # (d,)
    var_plus = (s - 1) / s * w + b / s
    n_lag = s - 1 if max_lag is None else min(max_lag, s - 1)

    acov = jnp.mean(_autocovariance_fft(xc), axis=1)[:n_lag]  # (n_lag, d)
    rho = 1.0 - (w[None, :] - acov) / jnp.maximum(var_plus[None, :], 1e-30)
    # Geyer initial positive sequence: pair sums P_k = rho_{2k} + rho_{2k+1}
    # are truncated at the first non-positive pair...
    m = (n_lag // 2) * 2
    pair = rho[0:m:2] + rho[1:m:2]  # (m/2, d)
    pos = jnp.cumprod(pair > 0, axis=0).astype(rho.dtype)
    # ...and the initial monotone refinement replaces each surviving pair
    # with the running minimum (the true pair-sum sequence is
    # non-increasing; sampling noise above it only inflates tau)
    mono = jnp.minimum.accumulate(
        jnp.where(pos > 0, pair, jnp.inf), axis=0
    )
    tau = 2.0 * jnp.sum(jnp.where(pos > 0, mono, 0.0), axis=0) - 1.0
    tau = jnp.maximum(tau, 1e-3)
    # antithetic chains can legitimately exceed s*c, but a degenerate tau
    # must not report millions of effective draws — cap like Stan
    cap_val = s * c * jnp.log10(jnp.maximum(float(s * c), 10.0))
    return jnp.minimum(s * c / tau, cap_val)


def summary(samples: Array) -> dict:
    """Posterior summary dict (mean, std, R-hat, ESS) per dimension."""
    return {
        "mean": jnp.mean(samples, axis=(0, 1)),
        "std": jnp.std(samples, axis=(0, 1)),
        "rhat": rhat(samples),
        "ess": ess(samples),
    }
