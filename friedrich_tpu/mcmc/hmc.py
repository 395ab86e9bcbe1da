"""Chain-parallel Hamiltonian Monte Carlo with warmup adaptation.

Net-new capability per the project north star (the reference has no MCMC).
Design points:

- **Chains are vmapped** (one program, many chains) and the chain axis can
  be sharded across devices/hosts (see ``parallel/mesh.py``'s ``chains``
  axis) — the GP analogue of data parallelism; all chains advance in
  lockstep inside one jitted ``lax.scan``.
- **Pooled warmup adaptation**: dual-averaging step size (Nesterov/NUTS
  paper constants: gamma=0.05, t0=10, kappa=0.75, target accept 0.8)
  driven by the MEAN acceptance across chains — a cross-chain reduction
  that becomes a ``psum`` when the chain axis is device-sharded. Diagonal
  mass matrix from Welford variance of the second warmup half, also pooled.
- Leapfrog integration with a fixed step count; energies computed with the
  exact LML target of ``logprob.py``.
"""

from __future__ import annotations

from functools import partial
from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

TARGET_ACCEPT = 0.8
DA_GAMMA = 0.05
DA_T0 = 10.0
DA_KAPPA = 0.75


class HMCResult(NamedTuple):
    samples: Array  # (num_samples, chains, dim)
    accept_prob: Array  # (num_samples, chains)
    step_size: Array  # () adapted step size
    inv_mass: Array  # (dim,) adapted diagonal inverse mass
    final_logp: Array  # (chains,)


def _leapfrog(logp_grad, theta, p, eps, inv_mass, num_steps):
    def body(_, carry):
        theta, p = carry
        _, g = logp_grad(theta)
        p = p + 0.5 * eps * g
        theta = theta + eps * inv_mass * p
        _, g = logp_grad(theta)
        p = p + 0.5 * eps * g
        return theta, p

    return lax.fori_loop(0, num_steps, body, (theta, p))


def _hamiltonian(logp_val, p, inv_mass):
    return -logp_val + 0.5 * jnp.sum(p * p * inv_mass)


def sample_hmc(
    logp: Callable[[Array], Array],
    init_theta: Array,
    key: jax.Array,
    num_warmup: int = 300,
    num_samples: int = 500,
    num_chains: int = 4,
    num_leapfrog: int = 16,
    init_step_size: float = 0.1,
    jitter: float = 0.2,
    pool_mean=None,
    pool_sum=None,
    step_size=None,
    inv_mass=None,
) -> HMCResult:
    """Run ``num_chains`` HMC chains; returns post-warmup draws.

    Pass ``step_size`` and ``inv_mass`` (e.g. from a previous run's result)
    to SKIP warmup entirely — chain resumption: restart with
    ``init_theta=prev.samples[-1]`` plus the saved adaptation.

    ``init_theta``: (dim,) start point (chains are jittered around it) or
    (chains, dim) explicit per-chain starts.

    ``pool_mean`` / ``pool_sum`` pool warmup statistics across a sharded
    chain axis (``lax.pmean``/``lax.psum`` under shard_map); default:
    local-only (identity).
    """
    pool_mean = pool_mean or (lambda v: v)
    pool_sum = pool_sum or (lambda v: v)
    dim = init_theta.shape[-1]
    dtype = init_theta.dtype
    val_grad = jax.value_and_grad(logp)

    if init_theta.ndim == 1:
        key, sub = jax.random.split(key)
        theta0 = init_theta[None, :] + 0.1 * jax.random.normal(
            sub, (num_chains, dim), dtype=dtype
        )
    else:
        theta0 = init_theta

    def one_chain_step(theta, logp_v, eps, inv_mass, k):
        k_mom, k_acc, k_jit = jax.random.split(k, 3)
        # per-chain step-size jitter decorrelates trajectory lengths
        u = jax.random.uniform(k_jit, (), dtype=dtype)
        eps_c = eps * (1.0 + jitter * (2.0 * u - 1.0))
        p = jax.random.normal(k_mom, (dim,), dtype=dtype) / jnp.sqrt(inv_mass)
        h0 = _hamiltonian(logp_v, p, inv_mass)
        theta_new, p_new = _leapfrog(val_grad, theta, p, eps_c, inv_mass, num_leapfrog)
        logp_new, _ = val_grad(theta_new)
        h1 = _hamiltonian(logp_new, p_new, inv_mass)
        log_accept = jnp.minimum(0.0, h0 - h1)
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, (), dtype=dtype)) < log_accept
        theta = jnp.where(accept, theta_new, theta)
        logp_v = jnp.where(accept, logp_new, logp_v)
        return theta, logp_v, jnp.exp(log_accept)

    chain_step = jax.vmap(one_chain_step, in_axes=(0, 0, None, None, 0))

    logp0 = jax.vmap(logp)(theta0)

    if step_size is not None and inv_mass is not None:
        step_size = jnp.asarray(step_size, dtype)
        inv_mass = jnp.asarray(inv_mass, dtype)
        return _run_sampling(
            chain_step, theta0, logp0, step_size, inv_mass, key, num_samples
        )

    # ---- warmup: dual averaging + Welford mass ----
    mu = jnp.log(10.0 * init_step_size)

    def warmup_step(carry, inputs):
        i, k = inputs
        theta, logp_v, log_eps, log_eps_bar, h_bar, w_mean, w_m2, w_cnt = carry
        ks = jax.random.split(k, theta.shape[0])
        eps = jnp.exp(log_eps)
        theta, logp_v, acc = chain_step(theta, logp_v, eps, inv_mass_init, ks)
        # pooled acceptance across chains (psum when chain axis is sharded)
        acc_mean = pool_mean(jnp.mean(acc))
        # dual averaging (Hoffman & Gelman 2014, eq. 6)
        t = i.astype(dtype) + 1.0
        h_bar = (1.0 - 1.0 / (t + DA_T0)) * h_bar + (TARGET_ACCEPT - acc_mean) / (
            t + DA_T0
        )
        log_eps = mu - jnp.sqrt(t) / DA_GAMMA * h_bar
        w = t ** (-DA_KAPPA)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        # Welford over the second half of warmup, pooled across chains
        in_window = i >= (num_warmup // 2)
        cnt = w_cnt + jnp.where(in_window, pool_sum(jnp.asarray(theta.shape[0], dtype)), 0.0)
        flat = theta  # (chains, dim)
        delta = flat - w_mean[None, :]
        upd = jnp.where(in_window, 1.0, 0.0)
        w_mean = w_mean + upd * pool_sum(jnp.sum(delta, axis=0)) / jnp.maximum(cnt, 1)
        delta2 = flat - w_mean[None, :]
        w_m2 = w_m2 + upd * pool_sum(jnp.sum(delta * delta2, axis=0))
        return (theta, logp_v, log_eps, log_eps_bar, h_bar, w_mean, w_m2, cnt), None

    inv_mass_init = jnp.ones((dim,), dtype=dtype)
    key, kw = jax.random.split(key)
    warm_keys = jax.random.split(kw, num_warmup)
    carry0 = (
        theta0,
        logp0,
        jnp.log(jnp.asarray(init_step_size, dtype)),
        jnp.log(jnp.asarray(init_step_size, dtype)),
        jnp.asarray(0.0, dtype),
        jnp.zeros((dim,), dtype),
        jnp.zeros((dim,), dtype),
        jnp.asarray(0.0, dtype),
    )
    (theta, logp_v, _, log_eps_bar, _, w_mean, w_m2, w_cnt), _ = lax.scan(
        warmup_step, carry0, (jnp.arange(num_warmup), warm_keys)
    )
    step_size = jnp.exp(log_eps_bar)
    var = w_m2 / jnp.maximum(w_cnt - 1.0, 1.0)
    inv_mass = jnp.where(w_cnt > 2, jnp.maximum(var, 1e-6), 1.0)

    return _run_sampling(
        chain_step, theta, logp_v, step_size, inv_mass, key, num_samples
    )


def _run_sampling(chain_step, theta, logp_v, step_size, inv_mass, key, num_samples):
    def sample_step(carry, k):
        theta, logp_v = carry
        ks = jax.random.split(k, theta.shape[0])
        theta, logp_v, acc = chain_step(theta, logp_v, step_size, inv_mass, ks)
        return (theta, logp_v), (theta, acc)

    key, ks = jax.random.split(key)
    sample_keys = jax.random.split(ks, num_samples)
    (theta, logp_v), (samples, accepts) = lax.scan(
        sample_step, (theta, logp_v), sample_keys
    )
    return HMCResult(
        samples=samples,
        accept_prob=accepts,
        step_size=step_size,
        inv_mass=inv_mass,
        final_logp=logp_v,
    )


sample_hmc_jit = partial(
    jax.jit,
    static_argnames=(
        "logp",
        "num_warmup",
        "num_samples",
        "num_chains",
        "num_leapfrog",
    ),
)(sample_hmc)
