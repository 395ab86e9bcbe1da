"""Single-chip large-n hyperparameter fit (the north-star op at scale).

The exact fit in ``models/optimizer.py`` replicates the reference
optimizer (``gaussian_process/optimizer.rs``) including its O(n^3)
explicit inverse and the (p, cap, cap) gradient-matrix stack
(``optimizer.rs:32,169``; ``algebra/mod.rs:129-155``) — fine for parity
sizes, but at n=50k f32 the inverse alone is a second 10 GB buffer and
the gradient stack 30 GB: it cannot run where the streamed factorizer
does. This module is the same ADAM-multiplicative fit with the two
dense quantities replaced by factor-based solves, sized to run wherever
the factor itself fits:

    alpha           = K^-1 r            (blocked panel sweeps on L)
    data-fit terms  = alpha^T dK alpha  (streamed dK matvec — EXACT)
    tr(K^-1 dK_p)  ~= mean_z (K^-1 z)^T (dK_p z)   (Hutchinson)
    tr(K^-1)       ~= mean_z z^T (K^-1 z)          (generic path only)

with fixed Rademacher probes (deterministic fit). The estimator is the
standard unbiased one (cf. GPyTorch, arXiv:1809.11165); the exact
small-n path remains the parity reference, and the two agree within
Monte-Carlo tolerance (tested).

Iteration structure (per-iteration cost = one O(n^2 (1+s)) solve pass +
one streamed-factorizer rebuild):

- gradients + ADAM deltas are ONE jitted program reading the current
  factor;
- the convergence test runs BEFORE the update is applied: when every
  ``|delta| <= convergence_fraction`` the fit stops WITHOUT the final
  apply+rebuild — saving one O(n^3) factorization vs the reference,
  which applies the final (sub-threshold, <= 5%-per-parameter) update
  and rebuilds before noticing it converged (``optimizer.rs:256-270``).
  Deliberate deviation, documented here; the parity-exact loop in
  ``models/optimizer.py`` keeps the reference order.
- the apply+rebuild step DONATES the previous factor's buffer
  (``rebuild_cholesky(reuse_buffer=True)``), so old and new L never
  coexist — the same buffer discipline as the headline factorizer.

This is what ``GaussianProcess.fit_parameters`` dispatches to above the
large-n threshold (see ``models/optimizer.py``); the distributed twin
with mesh-sharded solves is ``parallel/large_scale.py``.
"""

from __future__ import annotations

import time
from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp

from jax import lax

from ..utils.errors import CholeskyError
from .gp import GPState, rebuild_cholesky
from .optimizer import ADAM_EPS, SYNC_EVERY, AdamState, _adam_delta, _sync_now

Array = jnp.ndarray


def make_probes(state: GPState, num_probes: int, seed: int) -> Array:
    """Fixed-seed Rademacher probes, zeroed on dead rows — the estimator
    then sees only the live block (the padded identity contributes
    nothing, unlike the exact path's explicit ``cap - n`` correction,
    ``models/optimizer.py::_generic_step``)."""
    cap = state.capacity
    key = jax.random.PRNGKey(seed)
    probes = jnp.sign(
        jax.random.normal(key, (cap, num_probes), dtype=state.resid.dtype)
    )
    live = (jnp.arange(cap) < state.n)[:, None]
    return jnp.where(live, probes, 0.0)


#: Above this capacity the FUSED fit step builds its gradient solves from
#: the constant-program-size fori sweeps instead of the trace-time-unrolled
#: ones (+ panel-inverse cache). The unrolled sweeps add ~2 x cap/block
#: panel bodies to the fused program, and at frontier capacities that
#: program (solves + grad matvecs + conditional unrolled rebuild) is what
#: the remote TPU compiler rejects (HTTP 500 at n=50k f32, BASELINE.md
#: round 4). The fori sweeps cost one small per-panel TRSM on a ~9-wide
#: RHS — microseconds against the iteration's O(n^3) rebuild — for a
#: program whose solve section no longer grows with capacity. The
#: per-iteration fallback loop keeps the unrolled+cached solves (its
#: programs are small enough).
FUSED_SOLVES_FORI_THRESHOLD = 16384

#: Optional second program-size lever: above this capacity the fused
#: step's conditional REBUILD also switches to the constant-size fori
#: factorizer (``None`` disables — the unrolled rebuild is FLOP-optimal
#: and compiles alone at n=50k, so this only helps if the remote
#: compiler still rejects the slimmed fused program; the fori rebuild
#: costs ~3x the downdate MACs). bf16-storage states never switch (the
#: fori factorizer has no storage mode); they keep the unrolled rebuild.
FUSED_REBUILD_FORI_THRESHOLD: Optional[int] = None


def _solves(state: GPState, rhs: Array, unroll=None) -> Array:
    """``K^-1 rhs`` via the blocked panel sweeps (reads bf16 factors
    natively; precomputes the per-iteration panel inverses so both sweeps
    are pure GEMM — unrolled path only; the fori path solves each
    diagonal panel directly inside its constant-size body)."""
    from ..ops.blocked_solve import blocked_cho_solve, panel_inverses

    diag_inv = None
    if state.l.dtype in (jnp.float32, jnp.bfloat16) and unroll is not False:
        diag_inv = panel_inverses(state.l)
    return blocked_cho_solve(state.l, rhs, unroll=unroll, diag_inv=diag_inv)


@partial(jax.jit, static_argnames=("scalable",))
def _grad_step_large(state: GPState, adam: AdamState, probes: Array, i,
                     convergence_fraction, scalable: bool):
    """Gradient terms + ADAM deltas from the CURRENT factor — no rebuild
    (the host applies the update and rebuilds only while progressing).

    Returns ``(adam', kernel', noise', progress, info)`` where the primed
    values already include this iteration's multiplicative update
    (``optimizer.rs:113-122``) and, on the scaled path, the closed-form
    rescale (``optimizer.rs:174,262-263``)."""
    return _grad_step_large_impl(
        state, adam, probes, i, convergence_fraction, scalable
    )


def _grad_step_large_impl(state: GPState, adam: AdamState, probes: Array, i,
                          convergence_fraction, scalable: bool,
                          solve_unroll=None):
    from ..ops.streamed_matvec import streamed_grad_matvec

    with jax.named_scope("fit_large/solves"):
        rhs = jnp.concatenate([state.resid[:, None], probes], axis=1)
        sol = _solves(state, rhs, unroll=solve_unroll)
        alpha, kinv_z = sol[:, 0], sol[:, 1:]
    with jax.named_scope("fit_large/grad_matvec"):
        v = jnp.concatenate([alpha[:, None], probes], axis=1)
        dk_v = streamed_grad_matvec(
            state.kernel, state.x, state.n, v, method=state.method
        )  # (p, cap, 1 + s)
        data_fit = dk_v[:, :, 0] @ alpha  # alpha^T dK_p alpha — exact
        complexity = jnp.mean(
            jnp.einsum("is,pis->ps", kinv_z, dk_v[:, :, 1:]), axis=1
        )  # Hutchinson tr(K^-1 dK_p)
    with jax.named_scope("fit_large/adam"):
        if scalable:
            scale = (state.resid @ alpha) / state.n.astype(alpha.dtype)
            grads = (data_fit / scale - complexity) / 2.0  # optimizer.rs:180-192
            adam, delta = _adam_delta(adam, grads, i)
            kernel = state.kernel.with_params(adam.params)
            kernel = kernel.rescale(scale)  # optimizer.rs:262
            noise = state.noise * scale  # optimizer.rs:263 (NOT sqrt)
            adam = adam.replace(params=kernel.get_params())
        else:
            grads_kernel = (data_fit - complexity) / 2.0
            # Hutchinson tr(K^-1) over the live block (probes are zero on
            # dead rows); log-space noise update (optimizer.rs:98-110)
            tr_kinv = jnp.mean(jnp.einsum("is,is->s", probes, kinv_z))
            noise_grad = state.noise * (alpha @ alpha - tr_kinv) * state.noise
            grads = jnp.concatenate([grads_kernel, noise_grad[None]])
            adam, delta = _adam_delta(adam, grads, i)
            kernel = state.kernel.with_params(adam.params[:-1])
            noise = jnp.exp(adam.params[-1])
            scale = jnp.ones(())
        max_delta = jnp.max(jnp.abs(delta))
        progress = max_delta > convergence_fraction
    info = {"max_delta": max_delta, "scale": scale}
    return adam, kernel, noise, progress, info


def _fused_fit_step_body(l: Array, state: GPState, adam: AdamState,
                         probes: Array, i, convergence_fraction, done, ok,
                         scalable: bool):
    """One GUARDED fit iteration — gradient step + conditional
    apply/rebuild — as a SINGLE device program.

    Same math as ``_grad_step_large`` + host apply + ``rebuild_cholesky``
    but fused, so the host never has to read ``progress`` between
    iterations: the whole ADAM loop is enqueued back-to-back and the
    ``done``/``ok`` flags are read only every :data:`SYNC_EVERY` steps
    (``fit_kernel_noise_large``). Once ``done`` (converged — WITHOUT the
    final sub-threshold apply, see the module docstring) or ``ok``
    dropped (factorization failed), later steps pass everything through
    an identity branch, so over-enqueued iterations cost one device
    conditional, not an O(n^3) rebuild.

    The factor rides as a SEPARATE first argument so the streamed entry
    can donate it alone (``_fused_fit_step_donate``): the rebuild's fresh
    factor chain lands in the old factor's buffer once the gradient
    solves have consumed it — the single-factor HBM discipline of the
    two-program loop's ``reuse_buffer=True`` — while the caller's
    ``x``/``resid`` buffers stay valid.

    The program carries exactly ONE conditional (around the apply+
    rebuild): the gradient step runs unguarded even after convergence
    (~0.1 s of wasted solves per over-enqueued iteration at n=50k — at
    most SYNC_EVERY-1 of them), because a second guard level means a
    cond-in-cond program that the remote TPU compile helper rejects at
    headline sizes (HTTP 500, reproduced twice at n=50k).
    """
    state = state.replace(l=l)
    # constant-size solve programs above the threshold keep the fused
    # step's total program inside what the remote compiler accepts
    solve_unroll = (
        False if state.capacity > FUSED_SOLVES_FORI_THRESHOLD else None
    )
    adam2, kernel, noise, progress, _ = _grad_step_large_impl(
        state, adam, probes, i, convergence_fraction, scalable,
        solve_unroll=solve_unroll,
    )
    # pin the updated hyperparameters to the input dtypes: the
    # conditional's branches must agree exactly, and the gradient math
    # may narrow f64 params through f32 data terms (the host loop
    # tolerated that drift; the fused branch may not)
    kernel = jax.tree_util.tree_map(
        lambda new, old: new.astype(old.dtype)
        if hasattr(old, "dtype") else new,
        kernel, state.kernel,
    )
    noise = noise.astype(state.noise.dtype)
    adam2 = jax.tree_util.tree_map(
        lambda new, old: new.astype(old.dtype), adam2, adam
    )

    # rebuild only while progressing AND not yet converged AND healthy;
    # `done` latches at the first sub-threshold iteration, so a later
    # spurious `progress` can never un-converge the frozen state
    do_rebuild = jnp.logical_and(
        progress, jnp.logical_and(jnp.logical_not(done), ok)
    )

    rebuild_unroll = None
    if (
        FUSED_REBUILD_FORI_THRESHOLD is not None
        and state.capacity > FUSED_REBUILD_FORI_THRESHOLD
        and state.storage is None
    ):
        rebuild_unroll = False

    def apply_rebuild(st):
        st = st.replace(kernel=kernel, noise=noise)
        # reuse_buffer threads the (traced) factor as the rebuild chain's
        # workspace: the gradient solves above are its last reads, so XLA
        # can alias the chain in place of the donated input buffer —
        # without it the chain's result is a SECOND (cap, cap) temp,
        # which exceeds HBM at n=50k f32 (measured round 5: the slimmed
        # fused program compiled and then RESOURCE_EXHAUSTED)
        st2, ok2 = rebuild_cholesky(
            st, reuse_buffer=True, unroll=rebuild_unroll
        )
        return st2, jnp.asarray(ok2, bool)

    def keep(st):
        return st, ok

    state2, ok2 = lax.cond(do_rebuild, apply_rebuild, keep, state)
    done2 = jnp.logical_or(done, jnp.logical_not(progress))
    return state2.l, state2.replace(l=None), adam2, done2, ok2


#: Streamed-backend entry: the factor buffer is DONATED across iterations
#: (the caller's ``state.l`` is consumed, like ``reuse_buffer=True``).
_fused_fit_step_donate = partial(
    jax.jit, static_argnames=("scalable",), donate_argnums=(0,)
)(_fused_fit_step_body)

#: Dense-backend entry (parity sizes): nothing is donated — callers may
#: keep using their input state, matching the two-program loop, where
#: only streamed-unrolled rebuilds ever donate (``ops/streamed.py``).
_fused_fit_step_nodonate = partial(
    jax.jit, static_argnames=("scalable",)
)(_fused_fit_step_body)

#: (capacity, backend) pairs whose fused step the compile stack rejected
#: this process — later fits skip straight to the per-iteration loop.
_FUSED_STEP_UNCOMPILABLE: set = set()


def fit_kernel_noise_large(
    state: GPState,
    max_iter: int,
    convergence_fraction: float,
    max_time: float,
    num_probes: int = 8,
    seed: int = 0,
    fit_log=None,
    sync_every: int = SYNC_EVERY,
) -> GPState:
    """Run the large-n ADAM fit until convergence / max_iter / max_time.

    Dispatches on ``kernel.is_scalable`` like ``fit_parameters``
    (``mod.rs:434-444``). On the STREAMED backend the input state's
    factor buffer is DONATED — consumed UNCONDITIONALLY by the very
    first fused step, even when the fit converges immediately without a
    rebuild — so callers must not retain/reuse the input ``state`` after
    this call (use the returned state; a retained input hits JAX's
    deleted-buffer error). On a failed rebuild the state is
    unrecoverable and a :class:`CholeskyError` is raised (the reference
    panics here, ``algebra/mod.rs:90``).

    Without a ``fit_log`` the loop runs FUSED (:func:`_fused_fit_step`):
    iterations are enqueued back-to-back and the convergence flag is read
    only at iteration 1 and then every ``sync_every`` steps (default
    :data:`SYNC_EVERY`), eliminating the two per-iteration device->host
    round-trips (the measured dispatch residual of the round-3 fit
    decomposition, scripts/profile_fit.py). Consequences: ``max_time``
    is also only checked at sync points, and a failed rebuild raises
    after the sync instead of immediately — pass ``sync_every=1`` for
    per-iteration checks. Passing a ``fit_log`` keeps the per-iteration
    loop (each record needs host values anyway).
    """
    if sync_every < 1:
        raise ValueError(
            f"sync_every must be >= 1, got {sync_every} (1 = check "
            f"convergence/max_time every iteration)"
        )
    scalable = state.kernel.is_scalable
    kparams = jnp.where(state.kernel.get_params() == 0.0, ADAM_EPS,
                        state.kernel.get_params())
    if scalable:
        params = kparams
    else:
        params = jnp.concatenate([kparams, jnp.log(state.noise)[None]])
    adam = AdamState(
        params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params)
    )
    probes = make_probes(state, num_probes, seed)

    conv = jnp.asarray(convergence_fraction, dtype=params.dtype)
    t0 = time.monotonic()
    if fit_log is None:
        from .gp import auto_large_threshold

        resolved = state.backend
        if resolved == "auto":
            resolved = (
                "streamed" if state.capacity > auto_large_threshold()
                else "dense"
            )
        if resolved != "streamed" and jax.default_backend() != "cpu":
            from .. import config as ftconfig

            factor_bytes = state.capacity ** 2 * state.l.dtype.itemsize
            if 2 * factor_bytes > 0.85 * ftconfig.device_hbm_bytes():
                from ..utils.errors import ConfigError

                # only the streamed backend donates the factor across
                # fit iterations; every other backend's rebuild holds
                # old + new factor, which cannot fit at this capacity —
                # fail with the remedy instead of an opaque device OOM
                # (measured: RESOURCE_EXHAUSTED at cap=50k f32 'hybrid')
                raise ConfigError(
                    f"hyperparameter fitting at capacity "
                    f"{state.capacity} needs the 'streamed' backend "
                    f"(two {factor_bytes / 2**30:.1f} GB factors cannot "
                    f"coexist in device memory; streamed rebuilds donate "
                    f"the factor buffer). Use set_backend('streamed') or "
                    f"'auto'."
                )
        step_fn = (
            _fused_fit_step_donate if resolved == "streamed"
            else _fused_fit_step_nodonate
        )
        # a failed fused compile is deterministic for a given capacity —
        # don't pay the (tens of seconds) remote-compile attempt again on
        # every subsequent fit in this process
        if (state.capacity, resolved) in _FUSED_STEP_UNCOMPILABLE:
            return _per_iteration_fit(
                state, adam, probes, conv, max_iter, max_time, t0,
                scalable, None,
            )
        l, rest = state.l, state.replace(l=None)
        done = jnp.asarray(False)
        ok = jnp.asarray(True)
        for i in range(1, max_iter + 1):
            try:
                l, rest, adam, done, ok = step_fn(
                    l, rest, adam, probes, jnp.asarray(i), conv, done, ok,
                    scalable,
                )
            except Exception as e:  # noqa: BLE001
                # The fused step is one large conditional program; at
                # headline sizes some TPU compile stacks reject it
                # (remote helper HTTP 500, reproduced at n=50k f32
                # 6-pass). Compilation failures happen BEFORE execution,
                # so the donated factor is still intact on the first
                # iteration — fall back to the two-program per-iteration
                # loop (the measured round-3 path) instead of failing
                # the fit.
                if i == 1 and "remote_compile" in str(e):
                    import warnings

                    warnings.warn(
                        "fused fit step failed to compile "
                        f"({str(e)[:120]}...); falling back to the "
                        "per-iteration fit loop",
                        RuntimeWarning,
                        stacklevel=2,
                    )
                    _FUSED_STEP_UNCOMPILABLE.add(
                        (state.capacity, resolved)
                    )
                    return _per_iteration_fit(
                        rest.replace(l=l), adam, probes, conv, max_iter,
                        max_time, t0, scalable, None,
                    )
                raise
            if _sync_now(i, max_iter, sync_every):
                if not bool(ok):
                    raise CholeskyError(
                        "Cholesky decomposition failed during "
                        "hyperparameter fitting; consider setting "
                        "`cholesky_epsilon`."
                    )
                if bool(done) or time.monotonic() - t0 > max_time:
                    break
        return rest.replace(l=l)
    return _per_iteration_fit(
        state, adam, probes, conv, max_iter, max_time, t0, scalable,
        fit_log,
    )


def _per_iteration_fit(state, adam, probes, conv, max_iter, max_time, t0,
                       scalable, fit_log):
    """Two-program loop: gradient step + rebuild per iteration, flags
    read every iteration (the pre-fusion path; also the fallback when
    the fused program cannot compile)."""
    for i in range(1, max_iter + 1):
        adam, kernel, noise, progress, info = _grad_step_large(
            state, adam, probes, jnp.asarray(i), conv, scalable
        )
        if not bool(progress):
            # converged: every |delta| <= convergence_fraction — stop
            # WITHOUT applying the sub-threshold update (saves the final
            # O(n^3) rebuild; see module docstring for the deviation note)
            break
        state = state.replace(kernel=kernel, noise=noise)
        state, ok = rebuild_cholesky(state, reuse_buffer=True)
        if not bool(ok):
            raise CholeskyError(
                "Cholesky decomposition failed during hyperparameter "
                "fitting; consider setting `cholesky_epsilon`."
            )
        if fit_log is not None:
            from .gp import log_marginal_likelihood

            fit_log.log(
                iteration=i,
                params=[float(v) for v in adam.params],
                noise=float(state.noise),
                scale=float(info["scale"]) if scalable else None,
                max_delta=float(info["max_delta"]),
                likelihood=float(log_marginal_likelihood(state)),
            )
        if time.monotonic() - t0 > max_time:
            break
    return state
