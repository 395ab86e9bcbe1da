"""Hyperparameter fitting: multiplicative-ADAM ascent on the marginal
log-likelihood gradient.

Faithful TPU-native implementation of the reference optimizer
(``gaussian_process/optimizer.rs``), with its exact update rules:

- ADAM constants beta1=0.9, beta2=0.999, eps=1e-8, lr=0.1
  (``optimizer.rs:79-82``);
- **multiplicative** update ``param *= 1 + delta`` (``optimizer.rs:121``);
- convergence when every ``|delta| <= convergence_fraction``
  (``optimizer.rs:120,138``) plus a wall-clock cutoff (host-side, like the
  reference's chrono check at ``optimizer.rs:138``);
- zero parameters replaced by 1e-8 at start (``optimizer.rs:88-97``);
- generic path fits the noise in log-space (``optimizer.rs:98,108-110``);
- scaled path (``is_scalable`` kernels, per arXiv:1604.01250 as cited at
  ``optimizer.rs:6``): closed-form ``scale = r^T K^-1 r / n``
  (``optimizer.rs:174``), data-fit term divided by the scale
  (``optimizer.rs:180-186``), then ``kernel.rescale(scale)`` and
  ``noise *= scale`` (NOT sqrt(scale) — ``optimizer.rs:262-263``);
- the full covariance Cholesky is rebuilt EVERY iteration
  (``optimizer.rs:133-136, 267-270``).

Each iteration is one jitted device step (gradients + ADAM + rebuild); the
Python loop only checks the converged flag and the clock. The reference's
O(n^3) explicit inverse (``optimizer.rs:32,169``) becomes a padded
``cho_solve`` against the identity; the dead-block identity contributes
``cap - n`` to ``trace(K^-1)``, which is subtracted where it matters.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct
from jax.scipy.linalg import cho_solve

from ..config import (
    DEFAULT_CONVERGENCE_FRACTION,
    DEFAULT_MAX_ITER,
    DEFAULT_MAX_TIME,
)
from ..ops.covariance import gradient_covariances_padded
from ..utils.errors import CholeskyError
from .gp import GPState, rebuild_cholesky

Array = jnp.ndarray

BETA1 = 0.9
BETA2 = 0.999
ADAM_EPS = 1e-8
LEARNING_RATE = 0.1


@struct.dataclass
class AdamState:
    params: Array  # parameter vector being optimized
    m: Array  # first-moment accumulator
    v: Array  # second-moment accumulator


def _adam_delta(adam: AdamState, grads: Array, i) -> tuple[AdamState, Array]:
    """One ADAM update; returns new accumulators and the multiplicative
    deltas (``optimizer.rs:113-122``)."""
    m = BETA1 * adam.m + (1.0 - BETA1) * grads
    v = BETA2 * adam.v + (1.0 - BETA2) * grads * grads
    i_f = i.astype(grads.dtype) if hasattr(i, "astype") else jnp.asarray(i, grads.dtype)
    mb = m / (1.0 - BETA1**i_f)
    vb = v / (1.0 - BETA2**i_f)
    delta = LEARNING_RATE * mb / (jnp.sqrt(vb) + ADAM_EPS)
    params = adam.params * (1.0 + delta)
    return AdamState(params=params, m=m, v=v), delta


def _inverse_and_alpha(state: GPState) -> tuple[Array, Array]:
    """K^-1 (padded: identity in the dead block) and alpha = K^-1 r."""
    cap = state.capacity
    # bf16-STORAGE factors solve in the residual (compute) dtype
    l_mat = (
        state.l if state.l.dtype == state.resid.dtype
        else state.l.astype(state.resid.dtype)
    )
    eye = jnp.eye(cap, dtype=l_mat.dtype)
    cov_inv = cho_solve((l_mat, True), eye)
    alpha = cho_solve((l_mat, True), state.resid)
    return cov_inv, alpha


def _per_param_grads(state: GPState, cov_inv: Array, alpha: Array) -> tuple[Array, Array]:
    """data-fit and complexity terms per kernel parameter
    (``optimizer.rs:36-50``): ``alpha^T dK alpha`` and ``tr(K^-1 dK)``."""
    dks = gradient_covariances_padded(
        state.kernel, state.x, state.n, method=state.method
    )
    dk_alpha = jnp.einsum("pij,j->pi", dks, alpha)
    data_fit = jnp.einsum("pi,i->p", dk_alpha, alpha)
    complexity = jnp.einsum("ij,pij->p", cov_inv, dks)
    return data_fit, complexity


@jax.jit
def _generic_step(state: GPState, adam: AdamState, i, convergence_fraction):
    """One iteration of the non-scalable fit (``optimize_parameters``,
    ``optimizer.rs:69-149``). Parameter vector = kernel params + ln(noise).

    Returns ``(state, adam, progress, ok, info)`` where ``info`` carries
    per-iteration observability scalars (``max_delta``; the reference only
    had commented-out prints here, ``optimizer.rs:145-148``)."""
    with jax.named_scope("fit/gradients"):
        cov_inv, alpha = _inverse_and_alpha(state)
        data_fit, complexity = _per_param_grads(state, cov_inv, alpha)
        grads_kernel = (data_fit - complexity) / 2.0

        # noise gradient (``optimizer.rs:52-57``): gradient(K, noise) =
        # 2 noise I; the padded identity block inflates trace(K^-1) by
        # (cap - n) — subtract.
        noise_data_fit = jnp.dot(alpha, alpha)
        cap = state.capacity
        noise_complexity = jnp.trace(cov_inv) - (cap - state.n).astype(alpha.dtype)
        noise_grad = state.noise * (noise_data_fit - noise_complexity)
        # log-space correction (``optimizer.rs:105-110``)
        noise_grad = noise_grad * state.noise

        grads = jnp.concatenate([grads_kernel, noise_grad[None]])
    with jax.named_scope("fit/adam"):
        adam, delta = _adam_delta(adam, grads, i)
        max_delta = jnp.max(jnp.abs(delta))
        progress = max_delta > convergence_fraction

        kernel = state.kernel.with_params(adam.params[:-1])
        noise = jnp.exp(adam.params[-1])
        state = state.replace(kernel=kernel, noise=noise)
    with jax.named_scope("fit/rebuild"):
        state, ok = rebuild_cholesky(state)
    info = {"max_delta": max_delta, "scale": jnp.ones_like(max_delta)}
    return state, adam, progress, ok, info


@jax.jit
def _scaled_step(state: GPState, adam: AdamState, i, convergence_fraction):
    """One iteration of the scaled fit (``scaled_optimize_parameters``,
    ``optimizer.rs:211-283``). Parameter vector = kernel params only.

    Returns ``(state, adam, progress, ok, info)``; ``info`` carries the
    closed-form ``scale`` (``optimizer.rs:174``) and ``max_delta``."""
    with jax.named_scope("fit/gradients"):
        cov_inv, alpha = _inverse_and_alpha(state)
        scale = jnp.dot(state.resid, alpha) / state.n.astype(alpha.dtype)
        data_fit, complexity = _per_param_grads(state, cov_inv, alpha)
        grads = (data_fit / scale - complexity) / 2.0  # optimizer.rs:180-192

    with jax.named_scope("fit/adam"):
        adam, delta = _adam_delta(adam, grads, i)
        max_delta = jnp.max(jnp.abs(delta))
        progress = max_delta > convergence_fraction

        kernel = state.kernel.with_params(adam.params)
        kernel = kernel.rescale(scale)  # optimizer.rs:262
        noise = state.noise * scale  # optimizer.rs:263 (noise *= scale, not sqrt)
        # read parameters back post-rescale (optimizer.rs:264)
        adam = adam.replace(params=kernel.get_params())
        state = state.replace(kernel=kernel, noise=noise)
    with jax.named_scope("fit/rebuild"):
        state, ok = rebuild_cholesky(state)
    info = {"max_delta": max_delta, "scale": scale}
    return state, adam, progress, ok, info


def _init_params(vec: Array) -> Array:
    """Replace exact zeros with 1e-8 so the multiplicative update can move
    them (``optimizer.rs:88-97``)."""
    return jnp.where(vec == 0.0, ADAM_EPS, vec)


@partial(jax.jit, static_argnames=("scalable",))
def _guarded_exact_step(state: GPState, adam: AdamState, i,
                        convergence_fraction, done, ok, scalable: bool):
    """One GUARDED exact-fit iteration: run the scaled/generic step unless
    a previous iteration converged (``done``) or failed (``~ok``), in which
    case pass everything through an identity branch.

    Lets ``fit_kernel_noise`` enqueue iterations back-to-back and read the
    flags only every :data:`SYNC_EVERY` steps instead of paying two
    device->host round-trips per iteration (measured ~0.2-0.5 s each over
    a remote-chip tunnel — see ``models/large_fit.py``, which applies the
    same treatment to the streamed path). Unlike the streamed path, the
    converging iteration's sub-threshold update IS applied before ``done``
    latches — the reference's exact order (``optimizer.rs:256-270``)."""

    def run(operand):
        st, ad = operand
        step = _scaled_step if scalable else _generic_step
        st2, ad2, progress, ok2, _ = step(st, ad, i, convergence_fraction)
        # pin dtypes to the inputs' so the conditional's branches agree
        # (f64 params can narrow through f32 data terms — see
        # models/large_fit.py::_fused_fit_step_body)
        cast = lambda new, old: (
            new.astype(old.dtype) if hasattr(old, "dtype") else new
        )
        st2 = st2.replace(
            kernel=jax.tree_util.tree_map(cast, st2.kernel, st.kernel),
            noise=st2.noise.astype(st.noise.dtype),
        )
        ad2 = jax.tree_util.tree_map(cast, ad2, ad)
        return st2, ad2, jnp.logical_not(progress), jnp.asarray(ok2, bool)

    def skip(operand):
        st, ad = operand
        return st, ad, done, ok

    return jax.lax.cond(
        jnp.logical_and(jnp.logical_not(done), ok), run, skip, (state, adam)
    )


#: Sync cadence of the guarded fit loops (here and in
#: ``models/large_fit.py``): the device-side ``done``/``ok`` flags are
#: read only every this many iterations — each read is a device->host
#: sync costing a full round-trip over a remote-chip tunnel (measured
#: ~0.2-0.5 s in scripts/profile_fit.py), while an over-enqueued
#: iteration after convergence costs one skipped device conditional.
SYNC_EVERY = 8


def _sync_now(i: int, max_iter: int, sync_every: int) -> bool:
    """Sync points of the guarded fit loops: the FIRST iteration (so an
    immediately-failing Cholesky raises fast and ``max_time`` cannot
    silently overshoot by a full cadence of O(n^3) rebuilds — the
    reference checks the clock every iteration, ``optimizer.rs:138``),
    then every ``sync_every`` iterations, then the last."""
    return i == 1 or i % sync_every == 0 or i == max_iter


#: ``gradient="auto"`` switches from the exact dense gradient terms to
#: the streamed/Hutchinson large-n fit above this capacity: the exact
#: path materializes K^-1 (cap^2) plus a (p, cap, cap) gradient stack
#: (``optimizer.rs:32,169``; ``algebra/mod.rs:129-155``) — 40 GB at
#: n=50k f32 where the streamed fit needs only the factor.
LARGE_FIT_THRESHOLD = 8192


#: ``subsample="auto"`` policy boundary: below this n the subsampled
#: strategy cannot shrink the per-iteration cost enough to pay for its
#: extra full-n factorization (the sub-fit would use >~ n/3 of the data).
AUTO_SUBSAMPLE_THRESHOLD = 3 * LARGE_FIT_THRESHOLD  # 24576


def auto_subsample(n: int) -> Optional[int]:
    """Default subsample-size policy for ``subsample="auto"``.

    Returns ``None`` (full fit) below :data:`AUTO_SUBSAMPLE_THRESHOLD`,
    else ``max(LARGE_FIT_THRESHOLD, n // 5)``. Rationale (measured,
    BASELINE.md round 3/4): at n=50k the s=10k sub-fit converges in more
    iterations but each costs O(s^3) instead of O(n^3), and the final
    full-n rebuild is the only large factorization — 12.4 s vs 27.1 s
    with a BETTER final model (the full fit's convergence test stops it
    early). The full fit remains preferable when (a) exact reference
    trajectory semantics are required (``optimizer.rs:244-277``), or
    (b) the dataset is so heterogeneous that a random subset
    misestimates the lengthscale — see the round-4 sensitivity study in
    BASELINE.md for the measured scatter across subset sizes and seeds.
    """
    if n < AUTO_SUBSAMPLE_THRESHOLD:
        return None
    return max(LARGE_FIT_THRESHOLD, n // 5)


def fit_kernel_noise(
    state: GPState,
    max_iter: int = DEFAULT_MAX_ITER,
    convergence_fraction: float = DEFAULT_CONVERGENCE_FRACTION,
    max_time: float = DEFAULT_MAX_TIME,
    fit_log=None,
    gradient: str = "auto",
    num_probes: int = 8,
    seed: int = 0,
    sync_every: int = SYNC_EVERY,
) -> GPState:
    """Run the ADAM fit until convergence / max_iter / max_time.

    Dispatches on ``kernel.is_scalable`` exactly like ``fit_parameters``
    (``mod.rs:434-444``). Pass a :class:`~friedrich_tpu.utils.fitlog.FitLog`
    as ``fit_log`` for structured per-iteration records (the observability
    the reference left as commented-out prints, ``optimizer.rs:145-148``).

    ``gradient``: ``"exact"`` (the reference's dense gradient terms —
    parity path, O(cap^2) memory x(p+1)), ``"hutchinson"`` (streamed
    factor-based terms sized for large n — ``models/large_fit.py``), or
    ``"auto"`` (default: exact below :data:`LARGE_FIT_THRESHOLD`,
    streamed above). ``num_probes``/``seed`` configure the Hutchinson
    trace estimator (deterministic for a fixed seed).

    ``sync_every``: cadence of the guarded loop's device->host flag reads
    (see :data:`SYNC_EVERY`; iteration 1 always syncs). ``max_time`` and
    Cholesky failures are only observed at sync points, so a tight
    ``max_time`` contract wants ``sync_every=1`` (per-iteration checks —
    the reference's behavior, ``optimizer.rs:138``) at the cost of one
    round-trip per iteration.
    """
    if gradient not in ("auto", "exact", "hutchinson"):
        raise ValueError(f"unknown gradient method {gradient!r}")
    if sync_every < 1:
        raise ValueError(
            f"sync_every must be >= 1, got {sync_every} (1 = check "
            f"convergence/max_time every iteration)"
        )
    if gradient == "auto":
        gradient = (
            "hutchinson" if state.capacity > LARGE_FIT_THRESHOLD else "exact"
        )
    if gradient == "hutchinson":
        from .large_fit import fit_kernel_noise_large

        return fit_kernel_noise_large(
            state, max_iter, convergence_fraction, max_time,
            num_probes=num_probes, seed=seed, fit_log=fit_log,
            sync_every=sync_every,
        )
    scalable = state.kernel.is_scalable
    kparams = _init_params(state.kernel.get_params())
    if scalable:
        params = kparams
        step = _scaled_step
    else:
        params = jnp.concatenate([kparams, jnp.log(state.noise)[None]])
        step = _generic_step
    adam = AdamState(params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params))

    conv = jnp.asarray(convergence_fraction, dtype=params.dtype)
    t0 = time.monotonic()
    if fit_log is None:
        # guarded loop: enqueue back-to-back, sync every `sync_every`
        # steps plus iteration 1 (max_time is otherwise only checked at
        # sync points; a failed rebuild raises at the next sync instead
        # of immediately)
        done = jnp.asarray(False)
        ok = jnp.asarray(True)
        for i in range(1, max_iter + 1):
            state, adam, done, ok = _guarded_exact_step(
                state, adam, jnp.asarray(i), conv, done, ok, scalable
            )
            if _sync_now(i, max_iter, sync_every):
                if not bool(ok):
                    raise CholeskyError(
                        "Cholesky decomposition failed during "
                        "hyperparameter fitting; consider setting "
                        "`cholesky_epsilon`."
                    )
                if bool(done) or time.monotonic() - t0 > max_time:
                    break
        return state
    for i in range(1, max_iter + 1):
        state, adam, progress, ok, info = step(state, adam, jnp.asarray(i), conv)
        if not bool(ok):
            raise CholeskyError(
                "Cholesky decomposition failed during hyperparameter fitting; "
                "consider setting `cholesky_epsilon`."
            )
        if fit_log is not None:
            from .gp import log_marginal_likelihood

            # exact LML from the freshly rebuilt factor — one O(n^2)
            # triangular solve, only paid when a log is requested
            fit_log.log(
                iteration=i,
                params=[float(v) for v in adam.params],
                noise=float(state.noise),
                scale=float(info["scale"]) if scalable else None,
                max_delta=float(info["max_delta"]),
                likelihood=float(log_marginal_likelihood(state)),
            )
        if (not bool(progress)) or (time.monotonic() - t0 > max_time):
            break
    return state


@jax.jit
def _fit_prior_small(prior, x, resid, n):
    """The O(n d) part of the prior refit as ONE jitted program.

    Deliberately excludes the cap^2 factor from inputs/outputs: jitting
    the whole-state refit would either copy the factor as a pass-through
    output (2x peak HBM at n=50k) or require donation; and running it
    eagerly costs ~3 s at n=50k in per-op dispatch over a remote-chip
    tunnel (measured, scripts/profile_fit.py) for ~milliseconds of
    device work."""
    live = jnp.arange(x.shape[0]) < n
    y_pad = resid + jnp.where(live, prior.mean(x), 0.0)
    prior = prior.fit_padded(x, y_pad, live)
    resid = jnp.where(live, y_pad - prior.mean(x), 0.0)
    return prior, resid


def fit_prior_padded(state: GPState) -> GPState:
    """Refit the prior on the original outputs and re-residualize
    (``fit_parameters``, ``mod.rs:414-421``). Jittable (masked fits)."""
    prior, resid = _fit_prior_small(
        state.prior, state.x, state.resid, state.n
    )
    return state.replace(prior=prior, resid=resid)


def fit_subsampled(
    state: GPState,
    subsample: int,
    max_iter: int = DEFAULT_MAX_ITER,
    convergence_fraction: float = DEFAULT_CONVERGENCE_FRACTION,
    max_time: float = DEFAULT_MAX_TIME,
    fit_log=None,
    gradient: str = "auto",
    num_probes: int = 8,
    seed: int = 0,
    sync_every: int = SYNC_EVERY,
) -> GPState:
    """Fit kernel/noise on a RANDOM SUBSET, then one full-n rebuild.

    Net-new strategy beyond the reference: the hyperparameters are
    low-dimensional, but the reference fit pays a full O(n^3)
    factorization per ADAM iteration (``optimizer.rs:267-270``). Fitting
    on ``subsample`` points costs O(s^3) per iteration and the full model
    pays exactly ONE final factorization — the practical route to
    fit+predict inside the north-star budget at n=100k. The subset is
    drawn with a fixed PRNG key (deterministic); the scaled path's
    closed-form amplitude is recomputed implicitly by the final rebuild's
    residual solves. Expect hyperparameters within sampling error of the
    full fit (tested); for exact reference semantics use the full fit.
    """
    n = int(state.n)
    s = min(subsample, n)
    if s <= 0:
        raise ValueError(f"subsample must be positive, got {subsample}")
    if s < n:
        idx = jax.random.permutation(jax.random.PRNGKey(seed), n)[:s]
        idx = jnp.sort(idx)
        x_sub = state.x[idx]
        r_sub = state.resid[idx]
        from .gp import make_state

        sub_state, ok = make_state(
            state.kernel, state.prior, state.noise, x_sub,
            r_sub + state.prior.mean(x_sub), eps=state.eps,
            method=state.method,
            backend="streamed" if s > 8192 else "dense",
            precision=state.precision,
        )
        if not bool(ok):
            raise CholeskyError()
        sub_state = fit_kernel_noise(
            sub_state, max_iter, convergence_fraction, max_time,
            fit_log=fit_log, gradient=gradient, num_probes=num_probes,
            seed=seed, sync_every=sync_every,
        )
        state = state.replace(
            kernel=sub_state.kernel, noise=sub_state.noise
        )
    else:
        return fit_kernel_noise(
            state, max_iter, convergence_fraction, max_time,
            fit_log=fit_log, gradient=gradient, num_probes=num_probes,
            seed=seed, sync_every=sync_every,
        )
    state, ok = rebuild_cholesky(state, reuse_buffer=True)
    if not bool(ok):
        raise CholeskyError()
    return state


def fit_parameters(
    state: GPState,
    fit_prior: bool = True,
    fit_kernel: bool = True,
    max_iter: int = DEFAULT_MAX_ITER,
    convergence_fraction: float = DEFAULT_CONVERGENCE_FRACTION,
    max_time: float = DEFAULT_MAX_TIME,
    fit_log=None,
    gradient: str = "auto",
    num_probes: int = 8,
    seed: int = 0,
    subsample: Optional[int] = None,
    sync_every: int = SYNC_EVERY,
) -> GPState:
    """Full fit dispatch, mirroring ``fit_parameters`` (``mod.rs:406-445``):
    optionally refit the prior (rebuilding the factor if the kernel is not
    also being fitted), then run the gradient fit (``gradient`` selects the
    exact parity path or the streamed large-n path — see
    :func:`fit_kernel_noise`; ``subsample`` fits hyperparameters on a
    random subset with one final full-n rebuild — see
    :func:`fit_subsampled`; pass ``subsample="auto"`` for the measured
    default policy :func:`auto_subsample`)."""
    if subsample == "auto":
        subsample = auto_subsample(int(state.n))
    if fit_prior:
        state = fit_prior_padded(state)
        if not fit_kernel:
            # host-level rebuild: donate the old factor's buffer so old
            # and new L never coexist (2x peak HBM at large n). On a
            # failed rebuild the donated state is unrecoverable — same
            # effective contract as the reference, which panics here
            # (algebra/mod.rs:90).
            state, ok = rebuild_cholesky(state, reuse_buffer=True)
            if not bool(ok):
                raise CholeskyError()
    if fit_kernel:
        if subsample is not None:
            state = fit_subsampled(
                state, subsample, max_iter, convergence_fraction, max_time,
                fit_log=fit_log, gradient=gradient, num_probes=num_probes,
                seed=seed, sync_every=sync_every,
            )
        else:
            state = fit_kernel_noise(
                state, max_iter, convergence_fraction, max_time,
                fit_log=fit_log,
                gradient=gradient, num_probes=num_probes, seed=seed,
                sync_every=sync_every,
            )
    return state


# Convenience: a single jitted training step (prior refit + one scaled ADAM
# iteration), used by the multi-chip dry-run and benchmarks. Returns the
# step's (state, adam, progress, ok) — per-iteration info is dropped here.
@partial(jax.jit, static_argnames=("do_fit_prior",))
def train_step(state: GPState, adam: AdamState, i, do_fit_prior: bool = False):
    if do_fit_prior:
        state = fit_prior_padded(state)
    if state.kernel.is_scalable:
        step = _scaled_step
    else:
        step = _generic_step
    state, adam, progress, ok, _ = step(
        state, adam, i, jnp.asarray(DEFAULT_CONVERGENCE_FRACTION)
    )
    return state, adam, progress, ok
