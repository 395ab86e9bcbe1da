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

Why this exists as a POLICY and not just an alternative (round-5): the
replicated multiplicative-ADAM convergence rule (every ``|delta| <=
convergence_fraction`` — ``optimizer.rs:120-121``) stops while the
amplitude is still inflated on some trajectories: the round-4 sensitivity
study (BASELINE.md) shows the full n=50k fit and the s=20k sub-fit both
land on LML ~ -76k / ampl ~ 3 while s in {5k, 10k} escape to ~ -74.7k.
:func:`polish_map` runs a short exact-LML Adam from the ADAM endpoint —
at the early-stopped point the exact gradient is NOT small, so the polish
walks out of it; at a true optimum it is a no-op. The builder applies it
after sub-fits (``set_fit_polish``).
"""

from __future__ import annotations

import time
from typing import Optional

import jax
import jax.numpy as jnp
import optax

from ..mcmc.logprob import initial_signs, initial_theta, make_hyperparam_logprob
from ..utils.errors import CholeskyError
from .gp import GPState, rebuild_cholesky

Array = jnp.ndarray


def _run_adam_on_exact_lml(
    state: GPState,
    num_steps: int,
    learning_rate: float,
    prior_sigma: Optional[float],
    tol: float,
    precision: Optional[str],
    num_probes: int,
    max_time: float,
) -> Array:
    """Shared driver: optax Adam on the exact-LML density from the
    state's hyperparameters; returns the final theta (log magnitudes)."""
    signs = initial_signs(state)
    logp = make_hyperparam_logprob(
        state,
        prior_sigma=prior_sigma if prior_sigma is not None else 1e6,
        signs=signs,
        precision=precision,
        num_probes=num_probes,
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

    t0 = time.monotonic()
    prev = jnp.inf
    for _ in range(num_steps):
        theta, opt_state, loss = step(theta, opt_state)
        if bool(jnp.abs(prev - loss) < tol):
            break
        prev = loss
        if time.monotonic() - t0 > max_time:
            break
    return theta


def _apply_theta(state: GPState, theta: Array) -> GPState:
    nb = state.kernel.nb_params
    signs = initial_signs(state)
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


def fit_map(
    state: GPState,
    num_steps: int = 200,
    learning_rate: float = 0.05,
    prior_sigma: Optional[float] = None,
    tol: float = 1e-6,
    precision: Optional[str] = None,
    num_probes: int = 16,
    max_time: float = 3600.0,
) -> GPState:
    """Fit kernel params + noise by maximizing exact LML (or the MAP
    objective when ``prior_sigma`` is set). Returns the refitted state.

    ``precision``: MXU matmul precision of the density (TPU at n >= 10k
    needs ``"f32"`` — the heuristic-init covariance is not factorizable
    in the ambient single-pass mode, BASELINE.md round 3). ``num_probes``
    configures the streamed density's Hutchinson trace gradient;
    ``max_time`` bounds wall-clock like the reference optimizer's cutoff.
    """
    theta = _run_adam_on_exact_lml(
        state, num_steps, learning_rate, prior_sigma, tol, precision,
        num_probes, max_time,
    )
    return _apply_theta(state, theta)


def polish_map(
    state: GPState,
    num_steps: int = 40,
    learning_rate: float = 0.05,
    tol: float = 1e-4,
    precision: Optional[str] = None,
    num_probes: int = 16,
    max_time: float = 3600.0,
) -> GPState:
    """Short exact-LML Adam from the CURRENT hyperparameters — the
    early-stop remedy (see module docstring). Same mechanics as
    :func:`fit_map` but tuned as a cheap corrective pass: fewer steps, a
    looser loss-delta tolerance, and a start point that is already a
    near-optimum (the replicated ADAM's endpoint), so converged fits
    no-op in a handful of cheap steps."""
    theta = _run_adam_on_exact_lml(
        state, num_steps, learning_rate, None, tol, precision, num_probes,
        max_time,
    )
    return _apply_theta(state, theta)
