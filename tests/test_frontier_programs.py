"""Constant-program-size (fori) variants for frontier shapes (VERDICT
round-4 item #1): the blocked append solve, the fori streamed density,
and the fused fit step's constant-size solve section must match their
trace-time-unrolled / monolithic counterparts bit-for-bit or to
factorization tolerance — the frontier paths differ only in PROGRAM
SHAPE, never in math.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu import config
from friedrich_tpu.models import gp as core


@pytest.fixture(autouse=True)
def _restore_policy():
    yield
    config._reset_memory_policy_for_testing()


def _make_state(n=96, d=3, cap=128, noise=0.3, seed=0, backend="streamed"):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)))
    y = jnp.sin(x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=(n,)))
    kern = fk.SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0))
    state, ok = core.make_state(
        kern, fp.ZeroPrior(), jnp.asarray(noise), x, y, cap=cap,
        backend=backend,
    )
    assert bool(ok)
    return state


def test_append_blocked_solve_matches_monolithic():
    """Above the dispatch threshold cholesky_append_padded swaps the
    monolithic (cap, cap) TRSM — the op the remote compiler rejects at
    cap~50k — for the blocked panel sweep. Same math, same result."""
    from friedrich_tpu.ops.cholesky import cholesky_append_padded

    state = _make_state(n=96, cap=160)
    rng = np.random.default_rng(1)
    k_new = 16
    x_app = jnp.asarray(rng.normal(size=(k_new, 3)))
    x_pad = state.x.at[96:96 + k_new].set(x_app)

    l_mono = cholesky_append_padded(
        state.l, state.kernel, x_pad, state.n, k_new, state.noise
    )
    # force the blocked branch by pinning the threshold below cap
    config.set_memory_policy(auto_large_threshold=64)
    l_blocked = cholesky_append_padded(
        state.l, state.kernel, x_pad, state.n, k_new, state.noise
    )
    np.testing.assert_allclose(
        np.asarray(l_blocked), np.asarray(l_mono), atol=1e-10
    )


def test_append_blocked_equals_retrain():
    """The blocked-append factor must equal a from-scratch factorization
    of the grown training set (the add_samples == retrain property, on
    the frontier program shape)."""
    from friedrich_tpu.ops.cholesky import cholesky_append_padded

    rng = np.random.default_rng(2)
    n, k_new, cap, d = 80, 24, 128, 3
    x_all = jnp.asarray(rng.normal(size=(n + k_new, d)))
    y_all = jnp.sin(x_all[:, 0])
    kern = fk.SquaredExp(ls=jnp.asarray(1.2), ampl=jnp.asarray(0.8))
    noise = jnp.asarray(0.4)

    state0, ok0 = core.make_state(
        kern, fp.ZeroPrior(), noise, x_all[:n], y_all[:n], cap=cap,
        backend="streamed",
    )
    assert bool(ok0)
    x_pad = state0.x.at[n:n + k_new].set(x_all[n:])
    config.set_memory_policy(auto_large_threshold=64)
    l_app = cholesky_append_padded(
        state0.l, kern, x_pad, state0.n, k_new, noise
    )
    state_full, okf = core.make_state(
        kern, fp.ZeroPrior(), noise, x_all, y_all, cap=cap,
        backend="streamed",
    )
    assert bool(okf)
    live = n + k_new
    np.testing.assert_allclose(
        np.asarray(l_app)[:live, :live],
        np.asarray(state_full.l)[:live, :live],
        atol=1e-9,
    )


def test_donated_append_matches_default(monkeypatch):
    """The frontier donated append (old + new factor cannot coexist in
    HBM) must produce the same model as the default atomic path."""
    import friedrich_tpu as ft
    from friedrich_tpu.models import api as api_mod

    rng = np.random.default_rng(5)
    x = rng.normal(size=(64, 3))
    y = np.sin(x[:, 0])
    x_new = rng.normal(size=(8, 3))
    y_new = np.sin(x_new[:, 0])
    xq = rng.normal(size=(16, 3))

    def build():
        return ft.GaussianProcess.new(
            fp.ConstantPrior(0.0), fk.SquaredExp(1.0, 1.0), 0.3, None,
            x, y, capacity=128, backend="streamed",
        )

    gp_ref = build()
    gp_ref.add_samples(x_new, y_new)
    mean_ref, var_ref = gp_ref.predict_mean_variance(xq)

    monkeypatch.setattr(api_mod, "_append_must_donate", lambda s: True)
    gp_don = build()
    gp_don.add_samples(x_new, y_new)
    mean_don, var_don = gp_don.predict_mean_variance(xq)
    np.testing.assert_allclose(
        np.asarray(mean_don), np.asarray(mean_ref), rtol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(var_don), np.asarray(var_ref), rtol=1e-10
    )


def test_donated_append_failure_leaves_model_usable(monkeypatch):
    """A failed donated append must repair the factor's dead rows and
    leave the model answering identically to before the attempt."""
    import friedrich_tpu as ft
    from friedrich_tpu.models import api as api_mod
    from friedrich_tpu.utils.errors import CholeskyError

    rng = np.random.default_rng(6)
    x = rng.normal(size=(64, 3))
    y = np.sin(x[:, 0])
    xq = rng.normal(size=(16, 3))
    gp = ft.GaussianProcess.new(
        fp.ConstantPrior(0.0), fk.SquaredExp(1.0, 1.0), 0.0, None,
        x, y, capacity=128, backend="streamed",
    )
    mean_before, var_before = gp.predict_mean_variance(xq)

    monkeypatch.setattr(api_mod, "_append_must_donate", lambda s: True)
    # duplicating existing points with zero noise makes the appended
    # Schur complement singular -> rank-update fails
    with pytest.raises(CholeskyError, match="left unchanged"):
        gp.add_samples(x[:4], y[:4])
    assert int(gp.state.n) == 64
    mean_after, var_after = gp.predict_mean_variance(xq)
    np.testing.assert_allclose(
        np.asarray(mean_after), np.asarray(mean_before), rtol=1e-12
    )
    np.testing.assert_allclose(
        np.asarray(var_after), np.asarray(var_before), rtol=1e-12
    )
    # and a GOOD append afterwards still works
    x_new = rng.normal(size=(8, 3)) + 5.0
    gp.add_samples(x_new, np.sin(x_new[:, 0]))
    assert int(gp.state.n) == 72
    m2, v2 = gp.predict_mean_variance(xq)
    assert np.all(np.isfinite(np.asarray(m2)))
    assert np.all(np.isfinite(np.asarray(v2)))


def test_fori_density_matches_unrolled():
    """The constant-size fori streamed density (the cap>=8192 NUTS
    program shape) must agree with the unrolled density in value AND
    gradient — the thing it changes is compile scaling, not math."""
    from friedrich_tpu.mcmc.logprob import (
        initial_theta,
        make_streamed_hyperparam_logprob,
    )

    state = _make_state(n=96, cap=128)
    logp_unrolled = make_streamed_hyperparam_logprob(state, unroll=True)
    logp_fori = make_streamed_hyperparam_logprob(state, unroll=False)
    theta0 = initial_theta(state)
    for shift in (0.0, 0.3, -0.5):
        theta = theta0 + shift
        v_u = float(logp_unrolled(theta))
        v_f = float(logp_fori(theta))
        assert np.isfinite(v_u)
        np.testing.assert_allclose(v_f, v_u, rtol=1e-9)
        g_u = np.asarray(jax.grad(logp_unrolled)(theta))
        g_f = np.asarray(jax.grad(logp_fori)(theta))
        np.testing.assert_allclose(g_f, g_u, rtol=1e-7, atol=1e-9)


def test_fori_density_vmapped_chains():
    """NUTS vmaps the density over chains — the fori program must match
    the unrolled one under vmap + jit (value and gradient)."""
    from friedrich_tpu.mcmc.logprob import (
        initial_theta,
        make_streamed_hyperparam_logprob,
    )

    state = _make_state(n=96, cap=128)
    logp_u = make_streamed_hyperparam_logprob(state, unroll=True)
    logp_f = make_streamed_hyperparam_logprob(state, unroll=False)
    theta0 = initial_theta(state)
    thetas = theta0[None, :] + jnp.asarray(
        np.random.default_rng(7).normal(size=(4, theta0.shape[0])) * 0.2
    )
    v_u = jax.jit(jax.vmap(logp_u))(thetas)
    v_f = jax.jit(jax.vmap(logp_f))(thetas)
    np.testing.assert_allclose(np.asarray(v_f), np.asarray(v_u), rtol=1e-9)
    g_u = jax.jit(jax.vmap(jax.grad(logp_u)))(thetas)
    g_f = jax.jit(jax.vmap(jax.grad(logp_f)))(thetas)
    np.testing.assert_allclose(
        np.asarray(g_f), np.asarray(g_u), rtol=1e-7, atol=1e-9
    )


def test_fori_density_auto_threshold():
    """unroll=None resolves by capacity against FORI_DENSITY_THRESHOLD."""
    from friedrich_tpu.mcmc import logprob as lp

    state = _make_state(n=96, cap=128)
    # below the threshold: default is the unrolled program — both
    # explicit settings must agree with the default's value
    theta = lp.initial_theta(state)
    v_default = float(lp.make_streamed_hyperparam_logprob(state)(theta))
    v_unrolled = float(
        lp.make_streamed_hyperparam_logprob(state, unroll=True)(theta)
    )
    np.testing.assert_allclose(v_default, v_unrolled, rtol=1e-12)
    assert lp.FORI_DENSITY_THRESHOLD == 8192


def test_fused_fit_step_fori_solves_match(monkeypatch):
    """With the fused-solve threshold pinned below the capacity, the
    fused fit step runs its gradient solves through the fori sweeps —
    the fitted state must match the unrolled-solve fused step."""
    from friedrich_tpu.models import large_fit

    def run_fit():
        state = _make_state(n=96, cap=128, noise=0.4, seed=3)
        return large_fit.fit_kernel_noise_large(
            state, max_iter=4, convergence_fraction=0.01, max_time=60.0
        )

    ref = run_fit()
    monkeypatch.setattr(large_fit, "FUSED_SOLVES_FORI_THRESHOLD", 64)
    got = run_fit()
    np.testing.assert_allclose(
        np.asarray(got.kernel.get_params()),
        np.asarray(ref.kernel.get_params()),
        rtol=1e-8,
    )
    np.testing.assert_allclose(
        float(got.noise), float(ref.noise), rtol=1e-8
    )


def test_fused_fit_step_fori_rebuild_match(monkeypatch):
    """The optional second lever (fori rebuild inside the fused step)
    must produce the same fit as the unrolled rebuild."""
    from friedrich_tpu.models import large_fit

    def run_fit():
        state = _make_state(n=96, cap=128, noise=0.4, seed=4)
        return large_fit.fit_kernel_noise_large(
            state, max_iter=4, convergence_fraction=0.01, max_time=60.0
        )

    ref = run_fit()
    monkeypatch.setattr(large_fit, "FUSED_SOLVES_FORI_THRESHOLD", 64)
    monkeypatch.setattr(large_fit, "FUSED_REBUILD_FORI_THRESHOLD", 64)
    got = run_fit()
    np.testing.assert_allclose(
        np.asarray(got.kernel.get_params()),
        np.asarray(ref.kernel.get_params()),
        rtol=1e-7,
    )
    np.testing.assert_allclose(
        float(got.noise), float(ref.noise), rtol=1e-7
    )
