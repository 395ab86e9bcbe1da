"""Chain-sharded MCMC: chains distributed across mesh devices/hosts.

The GP analogue of data parallelism (BASELINE config 4): chains are
embarrassingly parallel, so each device runs ``num_chains / n_devices``
vmapped chains inside one ``shard_map``; the ONLY cross-device traffic is
the pooled warmup adaptation — mean acceptance for dual averaging and the
Welford sums for the mass matrix — which become ``psum``/``pmean``
collectives over the chain axis. After warmup every device samples fully
independently.

``shard_map`` is host-count-agnostic: the same code runs on a single
process with 8 virtual devices (tests) and on a multi-host pod slice
(after ``parallel.multihost.initialize()``).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp
from jax import lax
try:  # jax >= 0.8: top-level shard_map, check_rep renamed check_vma
    from jax import shard_map as _shard_map

    def shard_map(f, *, mesh, in_specs, out_specs, check_rep=False):
        return _shard_map(
            f, mesh=mesh, in_specs=in_specs, out_specs=out_specs,
            check_vma=check_rep,
        )
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map
from jax.sharding import Mesh, PartitionSpec as P

from .hmc import sample_hmc
from .nuts import sample_nuts

Array = jnp.ndarray


def _sharded(sampler_fn, mesh: Mesh, logp: Callable, init_theta: Array,
             key: jax.Array, num_chains: int, **kwargs):
    axes = tuple(mesh.axis_names)
    n_dev = mesh.size
    if num_chains % n_dev:
        raise ValueError(f"num_chains {num_chains} % devices {n_dev} != 0")
    local_chains = num_chains // n_dev
    dim = init_theta.shape[-1]

    # per-chain starts + per-device keys
    if init_theta.ndim == 1:
        jkey, key = jax.random.split(key)
        theta0 = init_theta[None, :] + 0.1 * jax.random.normal(
            jkey, (num_chains, dim), init_theta.dtype
        )
    else:
        theta0 = init_theta
    dev_keys = jax.random.split(key, n_dev)

    pool_mean = lambda v: lax.pmean(v, axes)  # noqa: E731
    pool_sum = lambda v: lax.psum(v, axes)  # noqa: E731

    # inside shard_map each device runs local_chains chains as ONE program
    # (pooled adaptation must stay a replicated scalar — the sequential
    # chain_batch path would add a leading batch axis and break the
    # out_specs below); disable sample_nuts' envelope auto-batching unless
    # the caller explicitly asked for batching. Likewise scan segmentation:
    # a host-level chunk loop would UNROLL inside the shard_map trace.
    kwargs.setdefault("chain_batch", local_chains)
    kwargs.setdefault("scan_segment", 0)

    def body(theta_local, keys_local):
        return sampler_fn(
            logp,
            theta_local,
            keys_local[0],
            num_chains=local_chains,
            pool_mean=pool_mean,
            pool_sum=pool_sum,
            **kwargs,
        )

    ax = axes if len(axes) > 1 else axes[0]
    chain_spec = P(ax)
    sc = P(None, ax)  # (num_samples, chains, ...) leaves
    rep = P()  # pooled adaptation outputs are identical on all devices
    if sampler_fn is sample_hmc:
        from .hmc import HMCResult

        out_specs = HMCResult(
            samples=sc, accept_prob=sc, step_size=rep, inv_mass=rep,
            final_logp=chain_spec,
        )
    else:
        from .nuts import NUTSResult

        out_specs = NUTSResult(
            samples=sc, accept_prob=sc, step_size=rep, inv_mass=rep,
            tree_depth=sc, divergent=sc,
        )
    fn = shard_map(
        body,
        mesh=mesh,
        in_specs=(chain_spec, chain_spec),
        out_specs=out_specs,
        check_rep=False,
    )
    return fn(theta0, dev_keys)


def sample_nuts_sharded(mesh, logp, init_theta, key, num_chains=8, **kwargs):
    """NUTS with the chain axis sharded over ``mesh``."""
    return _sharded(sample_nuts, mesh, logp, init_theta, key, num_chains, **kwargs)


def sample_hmc_sharded(mesh, logp, init_theta, key, num_chains=8, **kwargs):
    """HMC with the chain axis sharded over ``mesh``."""
    return _sharded(sample_hmc, mesh, logp, init_theta, key, num_chains, **kwargs)
