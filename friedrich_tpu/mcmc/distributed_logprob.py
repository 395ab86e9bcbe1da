"""Hyperparameter log-posterior with a MESH-DISTRIBUTED factorization.

Lifts the single-device MCMC target (``mcmc/logprob.py``) past one chip's
dense capacity: every density evaluation runs the row-sharded streamed
Cholesky (``parallel/distributed_cholesky.py``) and distributed triangular
sweeps, so NUTS/HMC hyperparameter posteriors work at n where a single
device cannot hold or factor K (the VERDICT-r1 gap: chains were sharded
but each chain's LML was single-device).

Gradients come from a ``jax.custom_vjp`` built on the analytic LML
gradient (``optimizer.rs:24-60``'s math, mesh-native):

    d LML / d p = 1/2 alpha^T (dK/dp) alpha - 1/2 tr(K^-1 dK/dp),
    alpha = K^-1 r

- the VALUE is exact: data-fit via distributed sweeps, log-det from the
  sharded factor's diagonal;
- the alpha^T dK alpha terms are exact (streamed dK matvecs — dK never
  materialized);
- the trace terms use a FIXED-SEED Hutchinson estimator
  (``tr(K^-1 dK) ~= mean_z (K^-1 z)^T (dK z)``, z Rademacher, the same
  estimator as ``LargeScaleGP``'s fit). Fixed probes make the gradient a
  deterministic function of theta, so leapfrog remains reversible and
  volume-preserving and the MH correction — computed with the EXACT
  energy — keeps the sampler's stationary distribution exact; probe noise
  only perturbs proposal quality (acceptance), not correctness.

Autodiff THROUGH the shard_map panel loops would require checkpointing
every panel of every factorization per leapfrog step — the custom VJP
replaces that with two extra distributed solves.
"""

from __future__ import annotations

import math
from typing import Callable, Optional

import jax
import jax.numpy as jnp
from jax.sharding import Mesh

from ..ops.streamed_matvec import streamed_grad_matvec
from ..parallel.distributed_cholesky import distributed_cholesky_factor
from ..parallel.distributed_solve import (
    distributed_cho_solve,
    distributed_solve_lower,
    distributed_solve_lower_t,
)

Array = jnp.ndarray

LOG_2PI = math.log(2.0 * math.pi)


def make_distributed_hyperparam_logprob(
    mesh: Mesh,
    state,
    prior_mu: float = 0.0,
    prior_sigma: float = 5.0,
    signs: Optional[Array] = None,
    block: int = 512,
    num_probes: int = 16,
    probe_seed: int = 0,
) -> Callable[[Array], Array]:
    """Return ``logp(theta)`` over log-magnitude hyperparameters whose
    inner factorization runs on ``mesh``.

    Same parameterization as :func:`~friedrich_tpu.mcmc.make_hyperparam_logprob`
    (``theta = log|params|``, noise last, fixed signs); ``state`` is a
    :class:`~friedrich_tpu.models.gp.GPState` (only inputs/resid/n/kernel
    template are captured — never its factor). Requires
    ``state.capacity % mesh.size == 0``.
    """
    x_pad = state.x
    resid = state.resid
    n_live = state.n
    cap = state.capacity
    method = state.method
    eps = state.eps
    kernel_template = state.kernel
    nb = kernel_template.nb_params
    dtype = x_pad.dtype
    if signs is None:
        sign_vec = jnp.ones((nb + 1,), dtype=dtype)
    else:
        sign_vec = jnp.asarray(signs, dtype=dtype)

    # fixed Rademacher probes, zeroed on dead rows (identity-padded K
    # contributes nothing to the live trace)
    key = jax.random.PRNGKey(probe_seed)
    probes = jnp.sign(jax.random.normal(key, (cap, num_probes), dtype=dtype))
    live_col = (jnp.arange(cap) < n_live)[:, None]
    probes = jnp.where(live_col, probes, 0.0)

    def _rebuild(theta):
        raw = sign_vec * jnp.exp(theta)
        kernel = kernel_template.with_params(raw[:nb])
        noise = raw[nb]
        return raw, kernel, noise

    def _forward(theta):
        raw, kernel, noise = _rebuild(theta)
        l_sharded, ok = distributed_cholesky_factor(
            mesh, kernel, x_pad, n_live, noise,
            eps=eps, block=block, method=method,
        )
        ol = distributed_solve_lower(mesh, l_sharded, resid[:, None], block)[:, 0]
        alpha = distributed_solve_lower_t(mesh, l_sharded, ol[:, None], block)[:, 0]
        kinv_z = distributed_cho_solve(mesh, l_sharded, probes, block)
        data_fit = jnp.sum(ol * ol)
        live = jnp.arange(cap) < n_live
        logdet = 2.0 * jnp.sum(
            jnp.where(live, jnp.log(jnp.diagonal(l_sharded)), 0.0)
        )
        n_f = n_live.astype(dtype)
        lml = -(data_fit + logdet + n_f * LOG_2PI) / 2.0
        hyper = -0.5 * jnp.sum(((theta - prior_mu) / prior_sigma) ** 2)
        val = jnp.where(
            ok & jnp.isfinite(lml), lml + hyper, -jnp.asarray(jnp.inf, dtype)
        )
        return val, alpha, kinv_z

    @jax.custom_vjp
    def logp(theta: Array) -> Array:
        val, _, _ = _forward(theta)
        return val

    def logp_fwd(theta):
        val, alpha, kinv_z = _forward(theta)
        return val, (theta, alpha, kinv_z)

    def logp_bwd(res, g):
        theta, alpha, kinv_z = res
        raw, kernel, noise = _rebuild(theta)

        # exact data-fit terms: alpha^T dK_p alpha (streamed, no dK matrix)
        dk_alpha = streamed_grad_matvec(
            kernel, x_pad, n_live, alpha, method=method
        )  # (p, cap)
        data_terms = dk_alpha @ alpha  # (p,)

        # Hutchinson trace terms: mean_z (K^-1 z).(dK_p z)
        dk_z = streamed_grad_matvec(
            kernel, x_pad, n_live, probes, method=method
        )  # (p, cap, s)
        trace_terms = jnp.mean(
            jnp.einsum("is,pis->ps", kinv_z, dk_z), axis=1
        )  # (p,)
        grad_kernel_raw = (data_terms - trace_terms) / 2.0

        # noise: dK/dnoise = 2 noise I on the live block (optimizer.rs:52-57)
        tr_kinv = jnp.mean(jnp.einsum("is,is->s", probes, kinv_z))
        grad_noise_raw = noise * (jnp.dot(alpha, alpha) - tr_kinv)

        grad_raw = jnp.concatenate([grad_kernel_raw, grad_noise_raw[None]])
        # chain rule through raw = sign * exp(theta): d raw/d theta = raw
        grad_theta = grad_raw * raw
        grad_theta = grad_theta - (theta - prior_mu) / (prior_sigma**2)
        return (g * grad_theta,)

    logp.defvjp(logp_fwd, logp_bwd)
    return logp


def sample_hyperparameters_distributed(
    mesh: Mesh,
    state,
    key: jax.Array,
    num_warmup: int = 200,
    num_samples: int = 300,
    num_chains: int = 2,
    max_depth: int = 6,
    block: int = 512,
    num_probes: int = 16,
    prior_mu: float = 0.0,
    prior_sigma: float = 5.0,
):
    """NUTS over GP hyperparameters with every density evaluation running
    the mesh-sharded factorization.

    Chains run SEQUENTIALLY (each chain's log-prob already uses the whole
    mesh — the opposite trade from ``mcmc/sharded.py``, where cheap
    single-device densities are vmapped/sharded across chains). Returns a
    :class:`~friedrich_tpu.mcmc.nuts.NUTSResult` with samples stacked as
    (num_samples, num_chains, dim).
    """
    from .logprob import initial_signs, initial_theta
    from .nuts import NUTSResult, sample_nuts

    signs = initial_signs(state)
    theta0 = initial_theta(state)
    logp = make_distributed_hyperparam_logprob(
        mesh, state, prior_mu=prior_mu, prior_sigma=prior_sigma,
        signs=signs, block=block, num_probes=num_probes,
    )
    results = []
    for c in range(num_chains):
        key, sub = jax.random.split(key)
        results.append(
            sample_nuts(
                logp, theta0, sub, num_warmup=num_warmup,
                num_samples=num_samples, num_chains=1, max_depth=max_depth,
            )
        )
    return NUTSResult(
        samples=jnp.concatenate([r.samples for r in results], axis=1),
        accept_prob=jnp.concatenate([r.accept_prob for r in results], axis=1),
        step_size=jnp.stack([r.step_size for r in results]),
        inv_mass=jnp.stack([r.inv_mass for r in results]),
        tree_depth=jnp.concatenate([r.tree_depth for r in results], axis=1),
        divergent=jnp.concatenate([r.divergent for r in results], axis=1),
    )
