"""No-U-Turn Sampler (iterative, multinomial), jit/vmap-native.

Net-new capability (BASELINE config 4). Implementation notes:

- **Iterative tree building** with fixed-size checkpoint buffers instead of
  recursion (TPU-compatible: no dynamic call tree). Within a doubling of
  size 2^k, leaf ``a`` (even) is checkpointed at slot ctz(a) (slot D for
  a=0); at leaf ``i``, every aligned power-of-two block ending at ``i`` is
  U-turn-checked against its start checkpoint — exactly the set of
  subtree checks the recursive algorithm performs. A slot is overwritten
  only after its last use (first new leaf with the same ctz appears one
  step after the old block's largest end).
- **Multinomial sampling** over the trajectory (Betancourt 2017): within a
  subtree, reservoir-sample proposals with probability
  ``exp(logw_leaf - logsumexp)``; across the doubling merge, biased
  progressive (``min(1, w_new/w_old)``) like Stan.
- Generalized U-turn criterion with diagonal mass:
  turn iff ``dz . (inv_mass r_minus) < 0`` or ``dz . (inv_mass r_plus) < 0``.
- Divergence when the energy error exceeds 1000 (Stan's default).
- Dual-averaging warmup on the trajectory-averaged acceptance statistic,
  pooled across vmapped chains (a psum when the chain axis is sharded);
  Welford diagonal mass from the second warmup half — shared with the HMC
  module's adaptation.

Chains vmap over everything; one chain's transition is a pair of nested
``lax.while_loop``s (doublings x leaves) with static shapes.
"""

from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp
from jax import lax

from ._adapt import check_adaptation_batch, dual_averaging_warmup

Array = jnp.ndarray

MAX_DELTA_ENERGY = 1000.0

#: Measured safe (vmapped chains x GP capacity) product per TPU program
#: (BASELINE.md round 3, one v5e chip: 8 chains x n=4096 and 4 x 8192 and
#: 2 x 16384 run; 16 x 4096 and 8 x 8192 fault with an opaque TPU-runtime
#: kernel error, not a clean OOM). ``sample_nuts`` auto-batches requests
#: above this envelope into sequential program launches.
TPU_CHAIN_ENVELOPE = 32768


#: Per-program WORK budget for realistic-n GP densities on TPU, in
#: (vmapped chains) x (scan steps) x n^3 units — one density evaluation
#: costs ~n^3/3 MACs, so this scalar tracks the compute a single
#: program enqueues. Round-4 bisection on one v5e (n^3(4096)=6.9e10):
#: 4 chains x 25 steps at n=4096 (6.9e12) and 8 x 20 (1.1e13) complete;
#: 8 x 25 at n=4096 (1.4e13) and 4 x 25 at n=8192 (5.5e13) crash the
#: TPU runtime. The budget sits at the top of the measured safe region.
#: (Round 3 ran 1.1e14 in one program — the runtime envelope regressed;
#: treat this as an empirical runtime limit, not a hardware law.)
TPU_SCAN_WORK_BUDGET = 1.1e13
MAX_SCAN_SEGMENT = 25


def _chain_envelope() -> int:
    """The effective chains x n envelope: the measured reference-chip
    default, or the user's ``config.set_memory_policy(chain_envelope=...)``
    pin. Deliberately NOT auto-scaled from ``memory_stats``: the envelope
    is a measured TPU-runtime fault boundary (opaque kernel fault, not an
    OOM), so deriving it from HBM size on an unseen chip would be a
    guess presented as measurement — users on larger chips raise it
    explicitly and re-probe with ``scripts/repro_kernel_fault.py``."""
    from .. import config

    override = config.memory_policy_override("chain_envelope")
    return int(override) if override is not None else TPU_CHAIN_ENVELOPE


def _scan_work_budget() -> float:
    """The effective per-program scan work budget (see
    :data:`TPU_SCAN_WORK_BUDGET`); override with
    ``config.set_memory_policy(scan_work_budget=...)`` — same
    measured-fault-boundary rationale as :func:`_chain_envelope`."""
    from .. import config

    override = config.memory_policy_override("scan_work_budget")
    return float(override) if override is not None else TPU_SCAN_WORK_BUDGET


def _auto_scan_segment(logp, chains_per_program: int = 4):
    """Per-program scan length for the measured TPU runtime limit, or
    None. Applies under the same conditions as :func:`_auto_chain_batch`
    (stamped GP density, accelerator backend); the segment shrinks with
    per-program chain width AND the density's n^3 cost, holding
    width x length x n^3 inside :data:`TPU_SCAN_WORK_BUDGET` (floor: one
    transition per program — at large n a single transition is seconds
    of device time, so per-launch overhead is negligible)."""
    gp_n = getattr(logp, "gp_n", None)
    if gp_n is None or jax.default_backend() == "cpu":
        return None
    per_step = max(1, chains_per_program) * float(gp_n) ** 3
    return max(
        1, min(MAX_SCAN_SEGMENT, int(_scan_work_budget() // per_step))
    )


def _auto_chain_batch(logp, num_chains: int):
    """Per-program chain width for the measured TPU envelope, or None.

    Applies only when the density advertises its GP size (``logp.gp_n``,
    set by the ``make_*_hyperparam_logprob`` factories) and the default
    backend is an accelerator; picks the largest divisor of
    ``num_chains`` whose program stays inside :func:`_chain_envelope`.
    """
    gp_n = getattr(logp, "gp_n", None)
    if gp_n is None or num_chains <= 1:
        return None
    if jax.default_backend() == "cpu":
        return None
    limit = max(1, _chain_envelope() // int(gp_n))
    if num_chains <= limit:
        return None
    for c in range(limit, 0, -1):
        if num_chains % c == 0:
            return c
    return 1


class NUTSResult(NamedTuple):
    samples: Array  # (num_samples, chains, dim)
    accept_prob: Array  # (num_samples, chains) trajectory-averaged alpha
    step_size: Array
    inv_mass: Array
    tree_depth: Array  # (num_samples, chains)
    divergent: Array  # (num_samples, chains) bool


def _ctz(i):
    """Count trailing zeros of a positive int32 via popcount((i & -i) - 1)."""
    return jax.lax.population_count((i & -i) - 1)


def _leapfrog(val_grad, z, r, g, eps, inv_mass):
    r = r + 0.5 * eps * g
    z = z + eps * inv_mass * r
    logp, g = val_grad(z)
    r = r + 0.5 * eps * g
    return z, r, logp, g


def _make_transition(logp: Callable, max_depth: int):
    val_grad = jax.value_and_grad(logp)

    def energy(logp_v, r, inv_mass):
        return -logp_v + 0.5 * jnp.sum(r * r * inv_mass)

    def transition(rng, z0, logp0, g0, eps, inv_mass):
      with jax.named_scope("nuts/transition"):
        dim = z0.shape[0]
        dtype = z0.dtype
        r_key, doubling_key = jax.random.split(rng)
        r0 = jax.random.normal(r_key, (dim,), dtype) / jnp.sqrt(inv_mass)
        h0 = energy(logp0, r0, inv_mass)

        # tree state: edges, proposal, multinomial weight, alpha stats
        class_state = dict(
            z_minus=z0, r_minus=r0, g_minus=g0,
            z_plus=z0, r_plus=r0, g_plus=g0,
            z_prop=z0, logp_prop=logp0, g_prop=g0,
            log_weight=jnp.asarray(0.0, dtype),  # log sum of exp(h0 - h)
            sum_alpha=jnp.asarray(0.0, dtype),
            n_alpha=jnp.asarray(0.0, dtype),
            depth=jnp.asarray(0, jnp.int32),
            turning=jnp.asarray(False),
            divergent=jnp.asarray(False),
            key=doubling_key,
        )

        def is_turning(z_m, r_m, z_p, r_p):
            dz = z_p - z_m
            return (jnp.dot(dz, inv_mass * r_m) < 0) | (
                jnp.dot(dz, inv_mass * r_p) < 0
            )

        def build_subtree(key, z_edge, r_edge, g_edge, direction, depth):
            """Simulate 2^depth leaves from the edge in ``direction``.

            Returns new edge, subtree proposal (multinomial within the
            subtree), subtree log-weight, turning/divergence flags, alpha
            stats."""
            num_leaves = jnp.asarray(2, jnp.int32) ** depth
            eps_d = eps * direction.astype(dtype)

            ckpt_z = jnp.zeros((max_depth + 1, dim), dtype)
            ckpt_r = jnp.zeros((max_depth + 1, dim), dtype)

            init = dict(
                i=jnp.asarray(0, jnp.int32),
                z=z_edge, r=r_edge, g=g_edge,
                z_prop=z_edge, logp_prop=jnp.asarray(-jnp.inf, dtype),
                g_prop=g_edge,
                log_weight=jnp.asarray(-jnp.inf, dtype),
                sum_alpha=jnp.asarray(0.0, dtype),
                turning=jnp.asarray(False),
                divergent=jnp.asarray(False),
                ckpt_z=ckpt_z, ckpt_r=ckpt_r,
                key=key,
            )

            def leaf_cond(s):
                return (s["i"] < num_leaves) & (~s["turning"]) & (~s["divergent"])

            def leaf_body(s):
                i = s["i"]
                z, r, logp_v, g = _leapfrog(
                    val_grad, s["z"], s["r"], s["g"], eps_d, inv_mass
                )
                h = energy(logp_v, r, inv_mass)
                delta = h - h0
                divergent = (~jnp.isfinite(h)) | (delta > MAX_DELTA_ENERGY)
                logw = jnp.where(jnp.isfinite(h), -delta, -jnp.inf)
                alpha = jnp.minimum(1.0, jnp.exp(-delta))
                alpha = jnp.where(jnp.isfinite(alpha), alpha, 0.0)

                # multinomial reservoir within the subtree
                new_logsum = jnp.logaddexp(s["log_weight"], logw)
                key, sub = jax.random.split(s["key"])
                take = jnp.log(
                    jax.random.uniform(sub, (), dtype)
                ) < (logw - new_logsum)
                z_prop = jnp.where(take, z, s["z_prop"])
                logp_prop = jnp.where(take, logp_v, s["logp_prop"])
                g_prop = jnp.where(take, g, s["g_prop"])

                # checkpoint even leaves at slot ctz(i) (slot max_depth for 0)
                slot = jnp.where(i == 0, max_depth, _ctz(jnp.maximum(i, 1)))
                is_even = (i % 2) == 0
                ckpt_z = jnp.where(
                    is_even,
                    s["ckpt_z"].at[slot].set(z),
                    s["ckpt_z"],
                )
                ckpt_r = jnp.where(
                    is_even,
                    s["ckpt_r"].at[slot].set(r),
                    s["ckpt_r"],
                )

                # U-turn checks for every aligned block ending at leaf i
                def check_k(k, turning):
                    size = jnp.asarray(2, jnp.int32) ** k
                    applies = ((i + 1) % size == 0) & (i % 2 == 1)
                    a = i + 1 - size
                    slot_a = jnp.where(a == 0, max_depth, _ctz(jnp.maximum(a, 1)))
                    z_a = ckpt_z[slot_a]
                    r_a = ckpt_r[slot_a]
                    # orient minus/plus by direction: the earlier leaf is
                    # "minus" when going forward, "plus" when backward
                    fwd = direction > 0
                    t = jnp.where(
                        fwd,
                        is_turning(z_a, r_a, z, r),
                        is_turning(z, r, z_a, r_a),
                    )
                    return turning | (applies & t)

                turning = lax.fori_loop(
                    1, max_depth + 1, check_k, jnp.asarray(False)
                )

                return dict(
                    i=i + 1, z=z, r=r, g=g,
                    z_prop=z_prop, logp_prop=logp_prop, g_prop=g_prop,
                    log_weight=new_logsum,
                    sum_alpha=s["sum_alpha"] + alpha,
                    turning=turning,
                    divergent=s["divergent"] | divergent,
                    ckpt_z=ckpt_z, ckpt_r=ckpt_r,
                    key=key,
                )

            out = lax.while_loop(leaf_cond, leaf_body, init)
            return out

        def doubling_cond(s):
            return (
                (s["depth"] < max_depth)
                & (~s["turning"])
                & (~s["divergent"])
            )

        def doubling_body(s):
            key, dir_key, merge_key, tree_key = jax.random.split(s["key"], 4)
            go_right = jax.random.bernoulli(dir_key)
            direction = jnp.where(go_right, 1, -1).astype(jnp.int32)
            z_edge = jnp.where(go_right, s["z_plus"], s["z_minus"])
            r_edge = jnp.where(go_right, s["r_plus"], s["r_minus"])
            g_edge = jnp.where(go_right, s["g_plus"], s["g_minus"])

            sub = build_subtree(
                tree_key, z_edge, r_edge, g_edge, direction, s["depth"]
            )

            # update the outer edge that moved
            z_minus = jnp.where(go_right, s["z_minus"], sub["z"])
            r_minus = jnp.where(go_right, s["r_minus"], sub["r"])
            g_minus = jnp.where(go_right, s["g_minus"], sub["g"])
            z_plus = jnp.where(go_right, sub["z"], s["z_plus"])
            r_plus = jnp.where(go_right, sub["r"], s["r_plus"])
            g_plus = jnp.where(go_right, sub["g"], s["g_plus"])

            ok = (~sub["turning"]) & (~sub["divergent"])
            # biased progressive merge (Stan): accept the subtree proposal
            # with prob min(1, w_sub / w_old)
            log_ratio = sub["log_weight"] - s["log_weight"]
            take = ok & (
                jnp.log(jax.random.uniform(merge_key, (), z0.dtype))
                < log_ratio
            )
            z_prop = jnp.where(take, sub["z_prop"], s["z_prop"])
            logp_prop = jnp.where(take, sub["logp_prop"], s["logp_prop"])
            g_prop = jnp.where(take, sub["g_prop"], s["g_prop"])
            log_weight = jnp.where(
                ok, jnp.logaddexp(s["log_weight"], sub["log_weight"]),
                s["log_weight"],
            )

            # whole-trajectory U-turn check after a successful merge
            turning_full = is_turning(z_minus, r_minus, z_plus, r_plus)

            return dict(
                z_minus=z_minus, r_minus=r_minus, g_minus=g_minus,
                z_plus=z_plus, r_plus=r_plus, g_plus=g_plus,
                z_prop=z_prop, logp_prop=logp_prop, g_prop=g_prop,
                log_weight=log_weight,
                sum_alpha=s["sum_alpha"] + sub["sum_alpha"],
                n_alpha=s["n_alpha"] + sub["i"].astype(dtype),
                depth=s["depth"] + 1,
                turning=sub["turning"] | turning_full,
                divergent=s["divergent"] | sub["divergent"],
                key=key,
            )

        out = lax.while_loop(doubling_cond, doubling_body, class_state)
        accept_stat = out["sum_alpha"] / jnp.maximum(out["n_alpha"], 1.0)
        # g_prop is maintained in lockstep with z_prop through every
        # reservoir take and doubling merge — no gradient recomputation
        return (
            out["z_prop"], out["logp_prop"], out["g_prop"],
            accept_stat, out["depth"], out["divergent"],
        )

    return transition


def sample_nuts(
    logp: Callable[[Array], Array],
    init_theta: Array,
    key: jax.Array,
    num_warmup: int = 300,
    num_samples: int = 500,
    num_chains: int = 4,
    max_depth: int = 8,
    init_step_size: float = 0.1,
    pool_mean=None,
    pool_sum=None,
    step_size=None,
    inv_mass=None,
    chain_batch=None,
    scan_segment=None,
) -> NUTSResult:
    """Run vmapped NUTS chains with pooled dual-averaging warmup.

    Pass ``step_size`` and ``inv_mass`` (from a previous result) to SKIP
    warmup — chain resumption: restart with
    ``init_theta=prev.samples[-1]`` plus the saved adaptation.

    ``pool_mean`` / ``pool_sum`` pool warmup statistics across a sharded
    chain axis (``lax.pmean``/``lax.psum`` under shard_map).

    ``chain_batch``: run the chains in SEQUENTIAL program launches of
    this many vmapped chains each (must divide ``num_chains``). The TPU
    runtime faults on too-wide vmapped NUTS programs at realistic GP
    sizes (measured: >=16 chains x n=4096 with the streamed density —
    BASELINE.md round 3); batching keeps each program inside that
    envelope while every batch reuses the same compiled executable
    (identical shapes). ``None`` (default) auto-selects: when the density
    was built by a ``make_*_hyperparam_logprob`` factory (which stamps
    its GP size on the function) and the request exceeds the measured
    envelope ``chains x n <= TPU_CHAIN_ENVELOPE`` on an accelerator
    backend, the largest fitting divisor of ``num_chains`` is used —
    otherwise the run is unbatched. Pass ``num_chains`` explicitly to
    force a single program. Each batch warms up independently — its own
    pooled step size/mass — so the batched result's ``step_size`` /
    ``inv_mass`` carry a leading batch axis; resume by passing them back
    with the SAME ``chain_batch`` (rows are consumed per batch). Warmup
    adaptation is then pooled over ``chain_batch`` chains rather than
    all of them — statistically still valid (any fixed step size is),
    just less sharing.

    ``scan_segment``: maximum transitions per device program. The TPU
    runtime crashes on LONG NUTS scans at realistic GP sizes (measured
    round 4: the same 8-chain n=4096 program runs at 20 transitions and
    faults at 100), so warmup and sampling scans are chunked into
    host-level launches feeding the carry back — mathematically
    identical, one compiled program per distinct chunk length. ``None``
    auto-selects :data:`MAX_SCAN_SEGMENT` under the same conditions as
    chain batching; pass 0 to force single-scan programs.
    """
    pool_mean = pool_mean or (lambda v: v)
    pool_sum = pool_sum or (lambda v: v)
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
        # batched-resume adaptation rows are consumed positionally —
        # validate the leading batch axis against this call's batch count
        # so a mismatched chain_batch cannot silently recycle the wrong
        # step size / mass per chain group
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
            results.append(sample_nuts(
                logp, theta_b, sub, num_warmup, num_samples, chain_batch,
                max_depth, init_step_size, pool_mean, pool_sum, ss, im,
                chain_batch, scan_segment,
            ))
        return NUTSResult(
            samples=jnp.concatenate([r.samples for r in results], axis=1),
            accept_prob=jnp.concatenate(
                [r.accept_prob for r in results], axis=1
            ),
            step_size=jnp.stack([r.step_size for r in results]),
            inv_mass=jnp.stack([r.inv_mass for r in results]),
            tree_depth=jnp.concatenate(
                [r.tree_depth for r in results], axis=1
            ),
            divergent=jnp.concatenate([r.divergent for r in results], axis=1),
        )
    # unbatched run: adaptation must be a scalar step size / (dim,) mass —
    # a leading batch axis here means the arrays came from a chain_batch
    # run and would be consumed as per-chain values silently
    check_adaptation_batch(step_size, inv_mass, num_chains, chain_batch)
    dim = init_theta.shape[-1]
    dtype = init_theta.dtype
    val_grad = jax.value_and_grad(logp)
    transition = _make_transition(logp, max_depth)
    vtrans = jax.vmap(transition, in_axes=(0, 0, 0, 0, None, None))

    if init_theta.ndim == 1:
        key, sub = jax.random.split(key)
        theta0 = init_theta[None, :] + 0.1 * jax.random.normal(
            sub, (num_chains, dim), dtype
        )
    else:
        theta0 = init_theta
    logp0, g0 = jax.vmap(val_grad)(theta0)

    if step_size is not None and inv_mass is not None:
        return _run_sampling(
            vtrans, theta0, logp0, g0,
            jnp.asarray(step_size, dtype), jnp.asarray(inv_mass, dtype),
            key, num_samples, scan_segment,
        )

    def step_fn(carry, eps, im, k):
        theta, logp_v, g = carry
        ks = jax.random.split(k, theta.shape[0])
        theta, logp_v, g, alpha, _, _ = vtrans(ks, theta, logp_v, g, eps, im)
        return (theta, logp_v, g), alpha

    key, kw = jax.random.split(key)
    warm = dual_averaging_warmup(
        step_fn, (theta0, logp0, g0), lambda c: c[0], num_warmup, dim, dtype,
        kw, init_step_size, pool_mean, pool_sum, segment=scan_segment,
    )
    theta, logp_v, g = warm.carry

    return _run_sampling(
        vtrans, theta, logp_v, g, warm.step_size, warm.inv_mass, key,
        num_samples, scan_segment,
    )


def _run_sampling(vtrans, theta, logp_v, g, step_size, inv_mass, key,
                  num_samples, segment=None):
    def sample_step(carry, k):
        theta, logp_v, g = carry
        ks = jax.random.split(k, theta.shape[0])
        theta, logp_v, g, alpha, depth, div = vtrans(
            ks, theta, logp_v, g, step_size, inv_mass
        )
        return (theta, logp_v, g), (theta, alpha, depth, div)

    key, ks = jax.random.split(key)
    sample_keys = jax.random.split(ks, num_samples)
    carry = (theta, logp_v, g)
    if segment is None or segment <= 0 or num_samples <= segment:
        carry, (samples, alphas, depths, divs) = lax.scan(
            sample_step, carry, sample_keys
        )
    else:
        # segmented sampling: short per-program scans feeding the chain
        # state back (see _adapt._da_phase — same TPU runtime limit)
        from ._adapt import _MCMC_DEBUG

        chunks = []
        start = 0
        while start < num_samples:
            end = min(start + segment, num_samples)
            carry, out = lax.scan(
                sample_step, carry, sample_keys[start:end]
            )
            if _MCMC_DEBUG:
                jax.block_until_ready(carry)
                print(f"[mcmc-debug] sampling segment {start}:{end} ok",
                      flush=True)
            chunks.append(out)
            start = end
        samples, alphas, depths, divs = (
            jnp.concatenate([c[i] for c in chunks], axis=0)
            for i in range(4)
        )
    return NUTSResult(
        samples=samples,
        accept_prob=alphas,
        step_size=step_size,
        inv_mass=inv_mass,
        tree_depth=depths,
        divergent=divs,
    )
