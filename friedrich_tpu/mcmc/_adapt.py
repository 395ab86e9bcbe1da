"""Shared warmup adaptation for HMC and NUTS.

One driver owns the dual-averaging step-size schedule (Hoffman & Gelman
2014 constants: gamma=0.05, t0=10, kappa=0.75, target accept 0.8) and the
pooled Welford diagonal-mass estimate over the second warmup half. The
sampler supplies only its transition kernel; pooling hooks turn the
cross-chain reductions into psum/pmean when the chain axis is sharded.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

Array = jnp.ndarray

#: Set FRIEDRICH_MCMC_DEBUG=1 to print per-segment progress (which
#: segment a TPU runtime crash lands in, and the evolving step size).
import os as _os

_MCMC_DEBUG = _os.environ.get("FRIEDRICH_MCMC_DEBUG") == "1"

TARGET_ACCEPT = 0.8
DA_GAMMA = 0.05
DA_T0 = 10.0
DA_KAPPA = 0.75


class WarmupResult(NamedTuple):
    carry: tuple  # sampler-specific chain state after warmup
    step_size: Array
    inv_mass: Array


def check_adaptation_batch(step_size, inv_mass, num_chains, chain_batch):
    """Validate resumed adaptation arrays against this call's batching.

    Batched runs (``chain_batch < num_chains``) consume a leading batch
    axis on ``step_size``/``inv_mass`` positionally; unbatched runs expect
    a scalar step size and (dim,) mass. JAX clamps out-of-bounds integer
    indexing, so without this check resuming with adaptation saved under a
    DIFFERENT chain_batch silently recycles the wrong batch's step size and
    mass instead of raising. Shared by ``sample_nuts`` and ``sample_hmc``.
    """
    batched = chain_batch is not None and num_chains > chain_batch
    if batched:
        nb = num_chains // chain_batch
        if step_size is not None and jnp.ndim(step_size) > 0 \
                and step_size.shape[0] != nb:
            raise ValueError(
                f"batched step_size has {step_size.shape[0]} rows but "
                f"num_chains={num_chains} / chain_batch={chain_batch} "
                f"= {nb} batches; resume with the same chain_batch the "
                f"adaptation was produced with"
            )
        if inv_mass is not None and jnp.ndim(inv_mass) > 1 \
                and inv_mass.shape[0] != nb:
            raise ValueError(
                f"batched inv_mass has {inv_mass.shape[0]} rows but "
                f"num_chains={num_chains} / chain_batch={chain_batch} "
                f"= {nb} batches; resume with the same chain_batch the "
                f"adaptation was produced with"
            )
    else:
        if step_size is not None and jnp.ndim(step_size) > 0:
            raise ValueError(
                f"step_size has a leading batch axis (shape "
                f"{jnp.shape(step_size)}) but this run is unbatched; pass "
                f"the chain_batch the adaptation was produced with"
            )
        if inv_mass is not None and jnp.ndim(inv_mass) > 1:
            raise ValueError(
                f"inv_mass has a leading batch axis (shape "
                f"{jnp.shape(inv_mass)}) but this run is unbatched; pass "
                f"the chain_batch the adaptation was produced with"
            )


def _da_phase(
    step_fn, carry0, get_positions, num_steps, inv_mass, dim, dtype, key,
    init_step_size, pool_mean, pool_sum, welford_from, segment=None,
):
    """One dual-averaging phase under a FIXED inv_mass; Welford statistics
    collected from step ``welford_from`` onward."""
    mu = jnp.log(10.0 * init_step_size)
    num_local = get_positions(carry0).shape[0]

    def warmup_step(scan_carry, inputs):
        i, k = inputs
        carry, log_eps, log_eps_bar, h_bar, w_mean, w_m2, w_cnt = scan_carry
        carry, alpha = step_fn(carry, jnp.exp(log_eps), inv_mass, k)
        acc_mean = pool_mean(jnp.mean(alpha))
        t = i.astype(dtype) + 1.0
        h_bar = (1.0 - 1.0 / (t + DA_T0)) * h_bar + (TARGET_ACCEPT - acc_mean) / (
            t + DA_T0
        )
        log_eps = mu - jnp.sqrt(t) / DA_GAMMA * h_bar
        w = t ** (-DA_KAPPA)
        log_eps_bar = w * log_eps + (1.0 - w) * log_eps_bar
        # pooled Welford for the mass estimate
        theta = get_positions(carry)
        in_window = i >= welford_from
        cnt = w_cnt + jnp.where(
            in_window, pool_sum(jnp.asarray(num_local, dtype)), 0.0
        )
        delta = theta - w_mean[None, :]
        upd = jnp.where(in_window, 1.0, 0.0)
        w_mean = w_mean + upd * pool_sum(jnp.sum(delta, axis=0)) / jnp.maximum(
            cnt, 1
        )
        delta2 = theta - w_mean[None, :]
        w_m2 = w_m2 + upd * pool_sum(jnp.sum(delta * delta2, axis=0))
        return (carry, log_eps, log_eps_bar, h_bar, w_mean, w_m2, cnt), None

    keys = jax.random.split(key, num_steps)
    init = (
        carry0,
        jnp.log(jnp.asarray(init_step_size, dtype)),
        jnp.log(jnp.asarray(init_step_size, dtype)),
        jnp.asarray(0.0, dtype),
        jnp.zeros((dim,), dtype),
        jnp.zeros((dim,), dtype),
        jnp.asarray(0.0, dtype),
    )
    if segment is None or segment <= 0 or num_steps <= segment:
        (carry, _, log_eps_bar, _, _, w_m2, w_cnt), _ = lax.scan(
            warmup_step, init, (jnp.arange(num_steps), keys)
        )
    else:
        # segmented: run the SAME scan in host-level chunks, feeding the
        # carry back — mathematically identical (the step index rides in
        # the scanned inputs), but each device program stays short.
        # Full-length NUTS scans at realistic GP sizes crash the TPU
        # runtime (BASELINE.md round 4); chunks reuse one compiled
        # program (plus at most one remainder-length program).
        sc = init
        start = 0
        while start < num_steps:
            end = min(start + segment, num_steps)
            sc, _ = lax.scan(
                warmup_step, sc, (jnp.arange(start, end), keys[start:end])
            )
            if _MCMC_DEBUG:
                jax.block_until_ready(sc)
                print(f"[mcmc-debug] warmup segment {start}:{end} ok, "
                      f"eps={float(jnp.exp(sc[1])):.4g}", flush=True)
            start = end
        carry, _, log_eps_bar, _, _, w_m2, w_cnt = sc
    var = w_m2 / jnp.maximum(w_cnt - 1.0, 1.0)
    return carry, jnp.exp(log_eps_bar), var, w_cnt


def dual_averaging_warmup(
    step_fn: Callable,
    carry0: tuple,
    get_positions: Callable[[tuple], Array],
    num_warmup: int,
    dim: int,
    dtype,
    key: jax.Array,
    init_step_size: float = 0.1,
    pool_mean=None,
    pool_sum=None,
    segment=None,
) -> WarmupResult:
    """Two-phase warmup; ``step_fn(carry, eps, inv_mass, key) ->
    (carry, alpha)`` advances all local chains once and returns per-chain
    acceptance statistics; ``get_positions(carry)`` exposes the
    (chains, dim) states for mass estimation.

    Phase 1 (~3/4): dual-average eps under identity mass, collect the
    pooled Welford variance over its second half. Phase 2 (~1/4):
    RE-tune eps under the adapted diagonal mass — without this re-tuning,
    a mass far from identity would multiply the effective step size and
    collapse post-warmup acceptance (Stan's windowed scheme re-tunes for
    the same reason)."""
    pool_mean = pool_mean or (lambda v: v)
    pool_sum = pool_sum or (lambda v: v)
    k1, k2 = jax.random.split(key)

    n1 = max(1, (3 * num_warmup) // 4)
    n2 = max(1, num_warmup - n1)
    inv_mass_init = jnp.ones((dim,), dtype)
    carry, eps1, var, w_cnt = _da_phase(
        step_fn, carry0, get_positions, n1, inv_mass_init, dim, dtype, k1,
        init_step_size, pool_mean, pool_sum, welford_from=n1 // 2,
        segment=segment,
    )
    inv_mass = jnp.where(w_cnt > 2, jnp.maximum(var, 1e-6), 1.0)

    # phase-2 dual averaging restarts anchored at phase-1's adapted eps
    carry, eps2, _, _ = _da_phase(
        step_fn, carry, get_positions, n2, inv_mass, dim, dtype, k2,
        eps1, pool_mean, pool_sum, welford_from=n2 + 1,
        segment=segment,
    )
    return WarmupResult(carry=carry, step_size=eps2, inv_mass=inv_mass)
