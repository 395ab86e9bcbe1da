"""Chain-parallel Hamiltonian Monte Carlo with warmup adaptation.

Net-new capability per the project north star (the reference has no MCMC).
Design points:

- **Chains are vmapped** (one program, many chains) and the chain axis can
  be sharded across devices/hosts (see ``mcmc/sharded.py``) — the GP
  analogue of data parallelism; all chains advance in lockstep inside one
  jitted ``lax.scan``.
- **Pooled warmup adaptation** shared with NUTS (``mcmc/_adapt.py``):
  dual-averaging step size on the mean cross-chain acceptance (a psum when
  sharded) + Welford diagonal mass from the second warmup half.
- Leapfrog integration carries the gradient between steps (each step costs
  exactly ONE log-posterior gradient — a full covariance build + Cholesky
  for the exact-LML target, so this matters).
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ._adapt import (
    DA_GAMMA,
    DA_KAPPA,
    DA_T0,
    TARGET_ACCEPT,
    check_adaptation_batch,
    dual_averaging_warmup,
)

Array = jnp.ndarray

__all__ = [
    "HMCResult",
    "sample_hmc",
    "TARGET_ACCEPT",
    "DA_GAMMA",
    "DA_KAPPA",
    "DA_T0",
]


class HMCResult(NamedTuple):
    samples: Array  # (num_samples, chains, dim)
    accept_prob: Array  # (num_samples, chains)
    step_size: Array  # () adapted step size
    inv_mass: Array  # (dim,) adapted diagonal inverse mass
    final_logp: Array  # (chains,)


def _leapfrog(val_grad, theta, p, logp_v, g, eps, inv_mass, num_steps):
    """Gradient-carrying leapfrog: N steps = N gradient evaluations."""

    def body(_, carry):
        theta, p, logp_v, g = carry
        p = p + 0.5 * eps * g
        theta = theta + eps * inv_mass * p
        logp_v, g = val_grad(theta)
        p = p + 0.5 * eps * g
        return theta, p, logp_v, g

    return lax.fori_loop(0, num_steps, body, (theta, p, logp_v, g))


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
    chain_batch=None,
    scan_segment=None,
) -> HMCResult:
    """Run ``num_chains`` HMC chains; returns post-warmup draws.

    ``init_theta``: (dim,) start point (chains are jittered around it) or
    (chains, dim) explicit per-chain starts.

    ``pool_mean`` / ``pool_sum`` pool warmup statistics across a sharded
    chain axis (``lax.pmean``/``lax.psum`` under shard_map); default:
    local-only. Pass ``step_size`` and ``inv_mass`` (e.g. from a previous
    run's result) to SKIP warmup entirely — chain resumption: restart with
    ``init_theta=prev.samples[-1]`` plus the saved adaptation.

    ``chain_batch``: run the chains as SEQUENTIAL program launches of
    this many vmapped chains (same semantics as ``sample_nuts`` — see
    its docstring for the measured TPU program-width envelope and the
    per-batch adaptation layout). ``None`` auto-selects from the
    envelope when the density advertises its GP size; pass
    ``num_chains`` to force one program.
    """
    from .nuts import _auto_chain_batch, _auto_scan_segment

    if chain_batch is None:
        chain_batch = _auto_chain_batch(logp, num_chains)
    if scan_segment is None:
        scan_segment = _auto_scan_segment(
            logp, chain_batch if chain_batch else num_chains
        )
    if chain_batch is not None and num_chains > chain_batch:
        if num_chains % chain_batch != 0:
            raise ValueError(
                f"chain_batch={chain_batch} must divide "
                f"num_chains={num_chains}"
            )
        check_adaptation_batch(step_size, inv_mass, num_chains, chain_batch)
        results = []
        for bi in range(num_chains // chain_batch):
            key, sub = jax.random.split(key)
            theta_b = (
                init_theta if init_theta.ndim == 1
                else init_theta[bi * chain_batch:(bi + 1) * chain_batch]
            )
            ss = (
                step_size if step_size is None or jnp.ndim(step_size) == 0
                else step_size[bi]
            )
            im = (
                inv_mass if inv_mass is None or jnp.ndim(inv_mass) <= 1
                else inv_mass[bi]
            )
            results.append(sample_hmc(
                logp, theta_b, sub, num_warmup, num_samples, chain_batch,
                num_leapfrog, init_step_size, jitter, pool_mean, pool_sum,
                ss, im, chain_batch, scan_segment,
            ))
        return HMCResult(
            samples=jnp.concatenate([r.samples for r in results], axis=1),
            accept_prob=jnp.concatenate(
                [r.accept_prob for r in results], axis=1
            ),
            step_size=jnp.stack([r.step_size for r in results]),
            inv_mass=jnp.stack([r.inv_mass for r in results]),
            final_logp=jnp.concatenate(
                [r.final_logp for r in results], axis=0
            ),
        )
    check_adaptation_batch(step_size, inv_mass, num_chains, chain_batch)
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

    def one_chain_step(theta, logp_v, g, eps, inv_mass, k):
        k_mom, k_acc, k_jit = jax.random.split(k, 3)
        # per-chain step-size jitter decorrelates trajectory lengths
        u = jax.random.uniform(k_jit, (), dtype=dtype)
        eps_c = eps * (1.0 + jitter * (2.0 * u - 1.0))
        p = jax.random.normal(k_mom, (dim,), dtype=dtype) / jnp.sqrt(inv_mass)
        h0 = _hamiltonian(logp_v, p, inv_mass)
        theta_new, p_new, logp_new, g_new = _leapfrog(
            val_grad, theta, p, logp_v, g, eps_c, inv_mass, num_leapfrog
        )
        h1 = _hamiltonian(logp_new, p_new, inv_mass)
        log_accept = jnp.minimum(0.0, h0 - h1)
        log_accept = jnp.where(jnp.isfinite(log_accept), log_accept, -jnp.inf)
        accept = jnp.log(jax.random.uniform(k_acc, (), dtype=dtype)) < log_accept
        theta = jnp.where(accept, theta_new, theta)
        logp_v = jnp.where(accept, logp_new, logp_v)
        g = jnp.where(accept, g_new, g)
        return theta, logp_v, g, jnp.exp(log_accept)

    chain_step = jax.vmap(one_chain_step, in_axes=(0, 0, 0, None, None, 0))
    logp0, g0 = jax.vmap(val_grad)(theta0)

    def step_fn(carry, eps, im, k):
        theta, logp_v, g = carry
        ks = jax.random.split(k, theta.shape[0])
        theta, logp_v, g, acc = chain_step(theta, logp_v, g, eps, im, ks)
        return (theta, logp_v, g), acc

    if step_size is None or inv_mass is None:
        key, kw = jax.random.split(key)
        warm = dual_averaging_warmup(
            step_fn, (theta0, logp0, g0), lambda c: c[0], num_warmup, dim,
            dtype, kw, init_step_size, pool_mean, pool_sum,
            segment=scan_segment,
        )
        carry, step_size, inv_mass = warm.carry, warm.step_size, warm.inv_mass
    else:
        carry = (theta0, logp0, g0)
        step_size = jnp.asarray(step_size, dtype)
        inv_mass = jnp.asarray(inv_mass, dtype)

    def sample_step(carry, k):
        carry, acc = step_fn(carry, step_size, inv_mass, k)
        return carry, (carry[0], acc)

    key, ks = jax.random.split(key)
    sample_keys = jax.random.split(ks, num_samples)
    if scan_segment is None or scan_segment <= 0 \
            or num_samples <= scan_segment:
        (theta, logp_v, g), (samples, accepts) = lax.scan(
            sample_step, carry, sample_keys
        )
    else:
        chunks = []
        start = 0
        while start < num_samples:
            end = min(start + scan_segment, num_samples)
            carry, out = lax.scan(sample_step, carry, sample_keys[start:end])
            chunks.append(out)
            start = end
        theta, logp_v, g = carry
        samples = jnp.concatenate([c[0] for c in chunks], axis=0)
        accepts = jnp.concatenate([c[1] for c in chunks], axis=0)
    return HMCResult(
        samples=samples,
        accept_prob=accepts,
        step_size=step_size,
        inv_mass=inv_mass,
        final_logp=logp_v,
    )
