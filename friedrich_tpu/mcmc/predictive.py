"""Fully-Bayesian prediction: marginalize over hyperparameter draws.

The point of the hyperparameter posterior (BASELINE config 4): instead of
plugging in one fitted (kernel, noise), average the GP predictive over
MCMC draws theta_s ~ p(theta | data):

    p(y* | x*, D) ~= 1/S sum_s N(m_s(x*), v_s(x*))

Mixture moments:  mean = E_s[m_s],  var = E_s[v_s + m_s^2] - mean^2.

Each draw rebuilds the covariance factor at its hyperparameters — one
n^3/3 factorization per draw, vmapped so XLA batches the factorizations
across draws. Parameter reconstruction uses the same fixed sign vector as
the sampling target (negative kernel parameters stay negative), and draws
whose factorization fails numerically are excluded from the mixture
instead of poisoning it with NaN.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..models.gp import GPState
from ..ops.cholesky import cholesky
from ..ops.covariance import (
    cross_covariance_train_padded,
    kernel_diag,
    train_covariance_padded,
)
from .logprob import initial_signs
from jax.scipy.linalg import cho_solve, solve_triangular

Array = jnp.ndarray


def _rebuild(state: GPState, theta: Array, signs: Array):
    """(kernel, noise, L, ok) at a posterior draw (signed log-magnitudes)."""
    nb = state.kernel.nb_params
    raw = signs * jnp.exp(theta)
    kernel = state.kernel.with_params(raw[:nb])
    noise = jnp.abs(raw[nb])
    k_pad = train_covariance_padded(
        kernel, state.x, state.n, noise, method=state.method
    )
    l_pad, ok = cholesky(k_pad)
    return kernel, noise, l_pad, ok


def predictive_mixture(
    state: GPState,
    theta_samples: Array,
    xq: Array,
    max_draws: int = 64,
    chunk_size: int = 4,
) -> tuple[Array, Array]:
    """(mean, variance) of the hyperparameter-marginalized predictive.

    ``theta_samples``: draws of log-magnitude hyperparameters as returned
    by :func:`sample_hyperparameters` — any shape (..., dim); flattened and
    thinned evenly to at most ``max_draws``. Non-PSD draws are dropped from
    the average.

    Each draw rebuilds a (cap, cap) covariance + factor, so a naive vmap
    over S draws allocates S * cap^2 floats at once (OOM at modest n on a
    16 GB chip). Draws are therefore processed ``chunk_size`` at a time
    (vmapped within a chunk, sequential across chunks via ``lax.map``):
    peak memory is bounded by ``chunk_size * cap^2`` floats regardless of
    ``max_draws`` — at f32, cap=8k, the default chunk is ~1 GB.
    """
    signs = initial_signs(state)
    flat = theta_samples.reshape(-1, theta_samples.shape[-1])
    s = flat.shape[0]
    take = min(max_draws, s)
    idx = jnp.linspace(0, s - 1, take).astype(jnp.int32)
    thetas = flat[idx]

    def one_draw(theta):
        kernel, _, l_pad, ok = _rebuild(state, theta, signs)
        c = cross_covariance_train_padded(
            kernel, state.x, state.n, xq, method=state.method
        )
        kl = solve_triangular(l_pad, c, lower=True)
        w = solve_triangular(l_pad, kl, lower=True, trans=1)
        mean = state.prior.mean(xq) + w.T @ state.resid
        var = kernel_diag(kernel, xq) - jnp.sum(kl * kl, axis=0)
        ok = ok & jnp.all(jnp.isfinite(mean)) & jnp.all(jnp.isfinite(var))
        zero = jnp.zeros_like(mean)
        return jnp.where(ok, mean, zero), jnp.where(ok, var, zero), ok

    means, variances, oks = jax.lax.map(
        one_draw, thetas, batch_size=min(chunk_size, take)
    )  # (S, m), (S, m), (S,)
    weight = oks.astype(means.dtype)
    total = jnp.maximum(jnp.sum(weight), 1.0)
    mix_mean = jnp.einsum("s,sm->m", weight, means) / total
    second = jnp.einsum("s,sm->m", weight, variances + means**2) / total
    return mix_mean, second - mix_mean**2


def sample_predictive(
    state: GPState,
    theta_samples: Array,
    xq: Array,
    key: jax.Array,
    num_draws: int = 32,
    chunk_size: int = 4,
) -> Array:
    """Draw from the marginalized predictive: pick a random theta per draw,
    then sample the corresponding posterior GP at ``xq``. Shape
    (num_draws, m). Non-PSD draws fall back to the posterior mean.

    Memory-bounded like :func:`predictive_mixture`: at most ``chunk_size``
    covariance rebuilds live at once."""
    signs = initial_signs(state)
    flat = theta_samples.reshape(-1, theta_samples.shape[-1])
    key_idx, key_norm = jax.random.split(key)
    idx = jax.random.randint(key_idx, (num_draws,), 0, flat.shape[0])
    thetas = flat[idx]
    zs = jax.random.normal(key_norm, (num_draws, xq.shape[0]), state.x.dtype)

    def one(theta, z):
        kernel, _, l_pad, ok = _rebuild(state, theta, signs)
        c = cross_covariance_train_padded(
            kernel, state.x, state.n, xq, method=state.method
        )
        w = cho_solve((l_pad, True), c)
        from ..ops.covariance import cross_covariance

        kqq = cross_covariance(kernel, xq, xq, method=state.method)
        cov = kqq - c.T @ w
        mean = state.prior.mean(xq) + w.T @ state.resid
        # jitter for numerical PSD-ness of the posterior covariance
        l_cov = jnp.linalg.cholesky(
            cov + 1e-10 * jnp.eye(cov.shape[0], dtype=cov.dtype)
        )
        draw = mean + l_cov @ z
        ok = ok & jnp.all(jnp.isfinite(draw))
        return jnp.where(ok, draw, jnp.where(jnp.isfinite(mean), mean, 0.0))

    return jax.lax.map(
        lambda tz: one(tz[0], tz[1]),
        (thetas, zs),
        batch_size=min(chunk_size, num_draws),
    )
