"""Hyperparameter log-posterior for MCMC.

Net-new capability (the reference has no MCMC): the target density over GP
hyperparameters is the EXACT log marginal likelihood (not the reference's
approximation — ``gaussian_process/mod.rs:208-213`` — since MCMC needs a
true density) plus a proper hyperprior, in log-space:

    theta = log(|params|)   with params = [kernel params..., noise]
    logp(theta) = LML(signs * exp(theta)) + sum log N(theta; mu0, sigma0)

Log-magnitude parameterization makes scale exploration natural and mirrors
the optimizer's treatment of the noise (``optimizer.rs:98``); parameter
SIGNS are held fixed at their initial values (the reference's
multiplicative optimizer cannot cross zero either). Gradients come from
autodiff through the covariance build + Cholesky.

The returned closure captures only the fields it reads (inputs, residuals,
live count, kernel template) — NOT the (cap, cap) Cholesky factor, which
would otherwise stay pinned in HBM for the whole MCMC run.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

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
    signs: Optional[Array] = None,
) -> Callable[[Array], Array]:
    """Return ``logp(theta)`` over log-magnitude hyperparameters.

    ``theta`` has length ``kernel.nb_params + 1`` (noise last). ``signs``
    (same length) fixes each raw parameter's sign; default all-positive.
    The GP prior mean (state.prior) is held fixed; residuals are the
    state's.
    """
    # capture only what the closure reads — never the (cap, cap) factor
    x_pad = state.x
    resid = state.resid
    n_live = state.n
    cap = state.capacity
    method = state.method
    eps = state.eps
    kernel_template = state.kernel
    nb = kernel_template.nb_params
    if signs is None:
        sign_vec = jnp.ones((nb + 1,), dtype=x_pad.dtype)
    else:
        sign_vec = jnp.asarray(signs, dtype=x_pad.dtype)

    def logp(theta: Array) -> Array:
        raw = sign_vec * jnp.exp(theta)
        kernel = kernel_template.with_params(raw[:nb])
        noise = raw[nb]
        k_pad = train_covariance_padded(kernel, x_pad, n_live, noise, method=method)
        if eps is not None:
            # the state's cholesky_epsilon carries over: per-pivot
            # substitution keeps the density (and its gradient) finite at
            # non-PSD hyperparameter draws
            from ..ops.cholesky import cholesky_with_substitute

            l_pad = cholesky_with_substitute(k_pad, eps)
        else:
            l_pad, _ = cholesky(k_pad)
        ol = solve_triangular(l_pad, resid, lower=True)
        data_fit = jnp.sum(ol * ol)
        live = jnp.arange(cap) < n_live
        logdet = 2.0 * jnp.sum(
            jnp.where(live, jnp.log(jnp.diagonal(l_pad)), 0.0)
        )
        n_f = n_live.astype(data_fit.dtype)
        lml = -(data_fit + logdet + n_f * LOG_2PI) / 2.0
        hyper = -0.5 * jnp.sum(((theta - prior_mu) / prior_sigma) ** 2)
        # NaN-safe: a failed factorization (non-PSD draw) gets -inf density
        return jnp.where(jnp.isfinite(lml), lml + hyper, -jnp.inf)

    return logp


def initial_theta(state: GPState) -> Array:
    """Start chains at the current (e.g. heuristic-fitted) hyperparameters
    (log magnitudes)."""
    raw = jnp.concatenate(
        [state.kernel.get_params(), jnp.asarray(state.noise)[None]]
    )
    return jnp.log(jnp.abs(raw) + 1e-12)


def initial_signs(state: GPState) -> Array:
    """Fixed sign vector matching :func:`initial_theta` (zero -> +1)."""
    raw = jnp.concatenate(
        [state.kernel.get_params(), jnp.asarray(state.noise)[None]]
    )
    return jnp.where(raw < 0, -1.0, 1.0).astype(state.x.dtype)
