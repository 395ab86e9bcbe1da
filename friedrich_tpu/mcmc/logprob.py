"""Hyperparameter log-posterior for MCMC.

Net-new capability (the reference has no MCMC): the target density over GP
hyperparameters is the EXACT log marginal likelihood (not the reference's
approximation — ``gaussian_process/mod.rs:208-213`` — since MCMC needs a
true density) plus a proper hyperprior, in log-space:

    theta = log([kernel params..., noise])
    logp(theta) = LML(exp(theta)) + sum log N(theta; mu0, sigma0)

Log-space makes positivity automatic and mirrors the optimizer's treatment
of the noise (``optimizer.rs:98``). Gradients come from autodiff through
the covariance build + Cholesky (both differentiable in JAX).
"""

from __future__ import annotations

import math
from typing import Callable

import jax.numpy as jnp

from ..models.gp import GPState
from ..ops.cholesky import cholesky
from ..ops.covariance import train_covariance_padded
from jax.scipy.linalg import solve_triangular

Array = jnp.ndarray

LOG_2PI = math.log(2.0 * math.pi)


def make_hyperparam_logprob(
    state: GPState,
    prior_mu: float = 0.0,
    prior_sigma: float = 5.0,
) -> Callable[[Array], Array]:
    """Return ``logp(theta)`` over log-hyperparameters for the given data.

    ``theta`` has length ``kernel.nb_params + 1`` (noise last). The GP prior
    mean (state.prior) is held fixed at its current value; residuals are the
    state's.
    """
    nb = state.kernel.nb_params

    def logp(theta: Array) -> Array:
        raw = jnp.exp(theta)
        kernel = state.kernel.with_params(raw[:nb])
        noise = raw[nb]
        k_pad = train_covariance_padded(
            kernel, state.x, state.n, noise, method=state.method
        )
        l_pad, _ = cholesky(k_pad)
        ol = solve_triangular(l_pad, state.resid, lower=True)
        data_fit = jnp.sum(ol * ol)
        live = jnp.arange(state.capacity) < state.n
        logdet = 2.0 * jnp.sum(
            jnp.where(live, jnp.log(jnp.diagonal(l_pad)), 0.0)
        )
        n_f = state.n.astype(data_fit.dtype)
        lml = -(data_fit + logdet + n_f * LOG_2PI) / 2.0
        hyper = -0.5 * jnp.sum(((theta - prior_mu) / prior_sigma) ** 2)
        # NaN-safe: a failed factorization (non-PSD draw) gets -inf density
        return jnp.where(jnp.isfinite(lml), lml + hyper, -jnp.inf)

    return logp


def initial_theta(state: GPState) -> Array:
    """Start chains at the current (e.g. heuristic-fitted) hyperparameters."""
    raw = jnp.concatenate(
        [state.kernel.get_params(), jnp.asarray(state.noise)[None]]
    )
    return jnp.log(jnp.abs(raw) + 1e-12)
