"""Exact-likelihood MAP/MLE hyperparameter fit (corrected variant).

The replicated reference optimizer (``models/optimizer.py``) uses the
reference's hand-derived per-kernel gradient formulas — including their
quirks — and its multiplicative ADAM rules. This module is the corrected
alternative the survey calls for: maximize the EXACT log marginal
likelihood (optionally + log-hyperprior = MAP) by autodiff through the
covariance build and Cholesky, with standard additive Adam (optax) in
log-magnitude space.

Parameter SIGNS are held fixed at their starting values (a negative
``Linear.c`` stays negative): like the reference's multiplicative update,
the fit explores each parameter's magnitude and cannot cross zero. Works
for every kernel composition — no hand-derived gradients needed.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..mcmc.logprob import initial_signs, initial_theta, make_hyperparam_logprob
from ..utils.errors import CholeskyError
from .gp import GPState, rebuild_cholesky

Array = jnp.ndarray


def fit_map(
    state: GPState,
    num_steps: int = 200,
    learning_rate: float = 0.05,
    prior_sigma: Optional[float] = None,
    tol: float = 1e-6,
) -> GPState:
    """Fit kernel params + noise by maximizing exact LML (or the MAP
    objective when ``prior_sigma`` is set). Returns the refitted state.
    """
    nb = state.kernel.nb_params
    signs = initial_signs(state)
    logp = make_hyperparam_logprob(
        state,
        prior_sigma=prior_sigma if prior_sigma is not None else 1e6,
        signs=signs,
    )
    theta = initial_theta(state)
    opt = optax.adam(learning_rate)
    opt_state = opt.init(theta)

    @jax.jit
    def step(theta, opt_state):
        loss, g = jax.value_and_grad(lambda t: -logp(t))(theta)
        # at a numerically non-PSD point the density is -inf and the
        # gradient non-finite; freeze rather than poison the iterate
        g = jnp.where(jnp.isfinite(g), g, 0.0)
        updates, opt_state = opt.update(g, opt_state)
        theta = optax.apply_updates(theta, updates)
        return theta, opt_state, loss

    prev = jnp.inf
    for _ in range(num_steps):
        theta, opt_state, loss = step(theta, opt_state)
        if bool(jnp.abs(prev - loss) < tol):
            break
        prev = loss

    raw = signs * jnp.exp(theta)
    kernel = state.kernel.with_params(raw[:nb])
    state = state.replace(kernel=kernel, noise=jnp.abs(raw[nb]))
    state, ok = rebuild_cholesky(state)
    if not bool(ok):
        raise CholeskyError(
            "MAP fit ended at hyperparameters whose covariance is not PSD; "
            "consider `cholesky_epsilon` or a hyperprior (prior_sigma)."
        )
    return state
