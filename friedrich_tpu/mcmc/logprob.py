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

import jax
import jax.numpy as jnp

from ..models.gp import GPState
from ..ops.cholesky import cholesky
from ..ops.covariance import train_covariance_padded
from jax.scipy.linalg import solve_triangular

Array = jnp.ndarray

LOG_2PI = math.log(2.0 * math.pi)


#: ``backend="auto"`` switches the density's inner factorization from the
#: dense build (autodiff-exact gradients) to the streamed one (custom-VJP
#: analytic gradients) above this capacity: the dense VJP checkpoints the
#: (cap, cap) covariance per chain per leapfrog step, which multiplies out
#: of HBM with vmapped chains at realistic n — and on the TPU runtime the
#: dense autodiff program hits a device "kernel fault" at n=4096 where
#: the streamed custom-VJP program runs (measured round 3, BASELINE.md
#: "Realistic-n NUTS").
STREAMED_LOGPROB_THRESHOLD = 2048


def make_hyperparam_logprob(
    state: GPState,
    prior_mu: float = 0.0,
    prior_sigma: float = 5.0,
    signs: Optional[Array] = None,
    backend: str = "auto",
    num_probes: int = 16,
    probe_seed: int = 0,
    precision: Optional[str] = None,
    unroll: Optional[bool] = None,
) -> Callable[[Array], Array]:
    """Return ``logp(theta)`` over log-magnitude hyperparameters.

    ``theta`` has length ``kernel.nb_params + 1`` (noise last). ``signs``
    (same length) fixes each raw parameter's sign; default all-positive.
    The GP prior mean (state.prior) is held fixed; residuals are the
    state's.

    ``backend``: ``"dense"`` (monolithic build+factor, autodiff-exact
    gradient), ``"streamed"`` (fused streamed factorizer + blocked
    sweeps inside the density, analytic custom-VJP gradient with
    fixed-probe Hutchinson traces — see
    :func:`make_streamed_hyperparam_logprob`), or ``"auto"`` (default:
    by capacity, threshold :data:`STREAMED_LOGPROB_THRESHOLD`).
    ``num_probes``/``probe_seed`` configure the streamed gradient;
    ``unroll`` selects the streamed density's program shape (see
    :func:`make_streamed_hyperparam_logprob` — ``None`` auto-selects the
    constant-size fori programs at/above
    :data:`FORI_DENSITY_THRESHOLD`).

    ``precision``: MXU matmul precision for the density's linear algebra
    (``friedrich_tpu.config.MATMUL_PRECISION_MODES``). On TPU the
    ambient default rounds operands to bfloat16 — at realistic n the
    sampler then sees ``-inf`` over the long-lengthscale region (the
    covariance goes computationally non-PSD), which silently truncates
    the posterior. ``"f32"`` keeps the explored region numerically
    honest at ~3x the factorization cost.
    """
    if backend not in ("auto", "dense", "streamed"):
        raise ValueError(f"unknown logprob backend {backend!r}")
    if backend == "auto":
        backend = (
            "streamed"
            if state.capacity > STREAMED_LOGPROB_THRESHOLD
            else "dense"
        )
    if backend == "streamed":
        return make_streamed_hyperparam_logprob(
            state, prior_mu=prior_mu, prior_sigma=prior_sigma, signs=signs,
            num_probes=num_probes, probe_seed=probe_seed,
            precision=precision, unroll=unroll,
        )
    if precision is not None:
        from ..config import MATMUL_PRECISION_MODES

        if precision not in MATMUL_PRECISION_MODES:
            raise ValueError(f"unknown precision {precision!r}")
        base = _make_dense_logprob_impl(
            state, prior_mu, prior_sigma, signs
        )
        mode = MATMUL_PRECISION_MODES[precision]

        def logp_scoped(theta):
            with jax.default_matmul_precision(mode):
                return base(theta)

        logp_scoped.gp_n = int(state.capacity)
        return logp_scoped
    fn = _make_dense_logprob_impl(state, prior_mu, prior_sigma, signs)
    fn.gp_n = int(state.capacity)
    return fn


def _make_dense_logprob_impl(
    state: GPState,
    prior_mu: float = 0.0,
    prior_sigma: float = 5.0,
    signs: Optional[Array] = None,
) -> Callable[[Array], Array]:
    """The dense autodiff density (see :func:`make_hyperparam_logprob`)."""
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


#: At and above this capacity the streamed density builds its
#: factorization and sweeps from the CONSTANT-PROGRAM-SIZE fori_loop
#: variants instead of the trace-time-unrolled ones. The unrolled panel
#: program is FLOP-optimal but its size grows with the panel count, and
#: once the NUTS tree recursion and scan segments multiply it the remote
#: TPU compiler never returns (measured round 4: the cap-8192 segmented
#: NUTS program sat in compilation for 75 minutes; the cap-4096 one
#: compiles fine). The fori variants pay ~3x the downdate MACs for a
#: program whose size is independent of capacity — at cap >= 8k the
#: density is seconds of device time per transition either way, and a
#: program that compiles in minutes beats an optimal one that never does.
FORI_DENSITY_THRESHOLD = 8192


def make_streamed_hyperparam_logprob(
    state: GPState,
    prior_mu: float = 0.0,
    prior_sigma: float = 5.0,
    signs: Optional[Array] = None,
    block: Optional[int] = None,
    num_probes: int = 16,
    probe_seed: int = 0,
    precision: Optional[str] = None,
    unroll: Optional[bool] = None,
) -> Callable[[Array], Array]:
    """``logp(theta)`` whose inner factorization is the single-device
    STREAMED build+factor (K never materialized) with blocked panel
    sweeps — the realistic-n NUTS density for one chip (n = 4k-50k),
    vmappable over chains. ``precision`` scopes ALL of the density's
    matmuls (factorization, sweeps, gradient matvecs) — see
    :func:`make_hyperparam_logprob` for why realistic-n sampling on TPU
    wants ``"f32"``.

    The VALUE is the exact log posterior (data fit from the factor
    sweeps, log-det from the factor diagonal). The GRADIENT is a
    ``jax.custom_vjp`` on the analytic LML gradient (the
    ``optimizer.rs:24-60`` math):

        d LML / d p = 1/2 alpha^T (dK/dp) alpha - 1/2 tr(K^-1 dK/dp)

    with exact data-fit terms (streamed dK matvecs) and FIXED-SEED
    Hutchinson trace terms — the same scheme as the mesh version
    (``mcmc/distributed_logprob.py``), single-device. Fixed probes keep
    the gradient deterministic in theta, so leapfrog stays reversible
    and the MH correction (computed with the EXACT energy) preserves the
    stationary distribution; probe noise perturbs only proposal quality.
    Autodiff through the unrolled panel program would instead checkpoint
    every panel strip per leapfrog step (cap^2 extra per chain).

    ``unroll``: program-shape selection for the density's inner
    factorization and sweeps. ``True`` = trace-time-unrolled
    (FLOP-optimal, program size grows with the panel count), ``False`` =
    constant-program-size ``fori_loop`` variants, ``None`` (default) =
    unrolled below :data:`FORI_DENSITY_THRESHOLD`, fori at/above it —
    the round-4 cap-8192 NUTS program never came back from the remote
    compiler with the unrolled density inlined into the tree recursion
    and scan segments (see the threshold's docstring).
    """
    from ..ops.blocked_solve import (
        blocked_cho_solve,
        blocked_solve_lower,
        blocked_solve_lower_t,
        panel_inverses,
    )
    from ..ops.streamed import streamed_cholesky_factor
    from ..ops.streamed_matvec import streamed_grad_matvec

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

    key = jax.random.PRNGKey(probe_seed)
    probes = jnp.sign(jax.random.normal(key, (cap, num_probes), dtype=dtype))
    live_col = (jnp.arange(cap) < n_live)[:, None]
    probes = jnp.where(live_col, probes, 0.0)

    if unroll is None:
        unroll = cap < FORI_DENSITY_THRESHOLD

    import contextlib

    if precision is None:
        _scope = contextlib.nullcontext
    else:
        from ..config import MATMUL_PRECISION_MODES

        if precision not in MATMUL_PRECISION_MODES:
            raise ValueError(f"unknown precision {precision!r}")
        _mode = MATMUL_PRECISION_MODES[precision]

        def _scope():
            return jax.default_matmul_precision(_mode)

    def _rebuild(theta):
        raw = sign_vec * jnp.exp(theta)
        kernel = kernel_template.with_params(raw[:nb])
        noise = raw[nb]
        return raw, kernel, noise

    def _forward(theta):
        raw, kernel, noise = _rebuild(theta)
        l_pad, ok = streamed_cholesky_factor(
            kernel, x_pad, n_live, noise, eps=eps, block=block,
            method=method, unroll=unroll,
        )
        # fori sweeps take no panel-inverse cache (their diagonal solves
        # are per-panel TRSMs inside the constant-size body)
        diag_inv = (
            panel_inverses(l_pad)
            if dtype == jnp.float32 and unroll else None
        )
        ol = blocked_solve_lower(
            l_pad, resid[:, None], unroll=unroll, diag_inv=diag_inv
        )[:, 0]
        alpha = blocked_solve_lower_t(
            l_pad, ol[:, None], unroll=unroll, diag_inv=diag_inv
        )[:, 0]
        kinv_z = blocked_cho_solve(
            l_pad, probes, unroll=unroll, diag_inv=diag_inv
        )
        data_fit = jnp.sum(ol * ol)
        live = jnp.arange(cap) < n_live
        logdet = 2.0 * jnp.sum(
            jnp.where(live, jnp.log(jnp.diagonal(l_pad)), 0.0)
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
        with _scope():
            val, _, _ = _forward(theta)
        return val

    def logp_fwd(theta):
        with _scope():
            val, alpha, kinv_z = _forward(theta)
        return val, (theta, alpha, kinv_z)

    def logp_bwd(res, g):
        theta, alpha, kinv_z = res
        with _scope():
            raw, kernel, noise = _rebuild(theta)
            dk_alpha = streamed_grad_matvec(
                kernel, x_pad, n_live, alpha, method=method
            )
            data_terms = dk_alpha @ alpha
            dk_z = streamed_grad_matvec(
                kernel, x_pad, n_live, probes, method=method
            )
            trace_terms = jnp.mean(
                jnp.einsum("is,pis->ps", kinv_z, dk_z), axis=1
            )
            grad_kernel_raw = (data_terms - trace_terms) / 2.0
            tr_kinv = jnp.mean(jnp.einsum("is,is->s", probes, kinv_z))
            grad_noise_raw = noise * (jnp.dot(alpha, alpha) - tr_kinv)
        grad_raw = jnp.concatenate([grad_kernel_raw, grad_noise_raw[None]])
        grad_theta = grad_raw * raw  # chain rule: d raw/d theta = raw
        grad_theta = grad_theta - (theta - prior_mu) / (prior_sigma**2)
        return (g * grad_theta,)

    logp.defvjp(logp_fwd, logp_bwd)
    # custom_vjp wrappers forward attribute writes to the wrapped fn via
    # functools.wraps semantics only at trace time; stash the envelope
    # hint on the object the caller actually holds
    try:
        logp.gp_n = int(state.capacity)
    except AttributeError:  # custom_vjp objects accept attributes; belt
        pass
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
