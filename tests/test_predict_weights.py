"""Cached predict weights: the one-sweep/sweep-free paths must agree with
the legacy cho_solve paths, and the facade cache must invalidate on every
state mutation (stale weights would silently corrupt predictions)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.models import gp as core

RNG = np.random.default_rng(77)


def _data(n=50, d=3):
    x = RNG.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * RNG.normal(size=n)
    return x, y


def _gp(n=50, d=3, capacity=None):
    x, y = _data(n, d)
    return ft.GaussianProcess.new(
        fp.ConstantPrior(0.3),
        fk.Matern2(ls=0.9, ampl=1.1),
        0.25,
        None,
        x,
        y,
        capacity=capacity,
    )


def test_weights_paths_match_legacy():
    gp = _gp()
    xq = RNG.normal(size=(9, 3))
    state = gp.state
    w = core.derive_weights(state)

    np.testing.assert_allclose(
        np.asarray(core.predict_mean(state, xq, w)),
        np.asarray(core.predict_mean(state, xq)),
        rtol=1e-10, atol=1e-12,
    )
    m1, v1 = core.predict_mean_variance(state, xq, w)
    m0, v0 = core.predict_mean_variance(state, xq)
    np.testing.assert_allclose(np.asarray(m1), np.asarray(m0),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(v1), np.asarray(v0),
                               rtol=1e-9, atol=1e-12)
    pm1, pc1 = core.posterior(state, xq, w)
    pm0, pc0 = core.posterior(state, xq)
    np.testing.assert_allclose(np.asarray(pm1), np.asarray(pm0),
                               rtol=1e-10, atol=1e-12)
    np.testing.assert_allclose(np.asarray(pc1), np.asarray(pc0),
                               rtol=1e-8, atol=1e-11)
    np.testing.assert_allclose(
        float(core.likelihood(state, w)), float(core.likelihood(state)),
        rtol=1e-12,
    )
    np.testing.assert_allclose(
        float(core.log_marginal_likelihood(state, w)),
        float(core.log_marginal_likelihood(state)),
        rtol=1e-12,
    )


def test_weights_alpha_is_kinv_resid():
    gp = _gp()
    state = gp.state
    w = core.derive_weights(state)
    n = int(state.n)
    live = slice(0, n)
    k = np.asarray(
        core.train_covariance_padded(
            state.kernel, state.x, state.n, state.noise, method=state.method
        )
    )[live, live]
    alpha_ref = np.linalg.solve(k, np.asarray(state.resid)[live])
    np.testing.assert_allclose(
        np.asarray(w.alpha)[live], alpha_ref, rtol=1e-8, atol=1e-10
    )
    # dead block stays exactly zero (identity factor, zero residuals)
    assert np.all(np.asarray(w.alpha)[n:] == 0.0)
    assert np.all(np.asarray(w.beta)[n:] == 0.0)


def test_facade_cache_invalidation_on_add_samples():
    gp = _gp(capacity=80)
    xq = RNG.normal(size=(5, 3))
    _ = gp.predict(xq)  # populate the cache
    x_new = RNG.normal(size=(7, 3))
    y_new = np.sin(x_new[:, 0])
    gp.add_samples(x_new, y_new)

    # a fresh model trained on the union must agree exactly in structure
    x_all = np.vstack([np.asarray(gp.state.x)[: gp.num_samples - 7], x_new])
    got = np.asarray(gp.predict(xq))
    assert np.all(np.isfinite(got))
    fresh = ft.GaussianProcess.new(
        fp.ConstantPrior(0.3), fk.Matern2(ls=0.9, ampl=1.1), 0.25, None,
        np.asarray(gp.state.x)[: gp.num_samples],
        np.asarray(
            gp.state.resid + jnp.where(
                jnp.arange(gp.state.capacity) < gp.state.n,
                gp.state.prior.mean(gp.state.x), 0.0,
            )
        )[: gp.num_samples],
    )
    np.testing.assert_allclose(got, np.asarray(fresh.predict(xq)),
                               rtol=1e-8, atol=1e-10)


def test_facade_cache_invalidation_on_fit_and_set():
    gp = _gp()
    xq = RNG.normal(size=(5, 3))
    before = np.asarray(gp.predict(xq))
    gp.set_hyperparameters(kernel=fk.SquaredExp(ls=0.4, ampl=2.0), noise=0.1)
    after = np.asarray(gp.predict(xq))
    assert not np.allclose(before, after)  # stale cache would reproduce before
    want = np.asarray(
        core.predict_mean(gp.state, jnp.asarray(xq))
    )
    np.testing.assert_allclose(after, want, rtol=1e-9, atol=1e-11)

    gp.fit_parameters(fit_prior=False, fit_kernel=True, max_iter=3)
    fitted = np.asarray(gp.predict(xq))
    want = np.asarray(core.predict_mean(gp.state, jnp.asarray(xq)))
    np.testing.assert_allclose(fitted, want, rtol=1e-9, atol=1e-11)


def test_panel_inverses_solve_matches_plain():
    """f32 path with precomputed diagonal inverses ≡ per-call inverses
    (the dtype the cache actually targets on TPU)."""
    from friedrich_tpu.ops.blocked_solve import (
        blocked_solve_lower,
        blocked_solve_lower_t,
        panel_inverses,
    )

    n, m, b = 96, 7, 24
    a = RNG.normal(size=(n, n))
    spd = a @ a.T + n * np.eye(n)
    l32 = jnp.asarray(np.linalg.cholesky(spd), jnp.float32)
    c = jnp.asarray(RNG.normal(size=(n, m)), jnp.float32)
    dinv = panel_inverses(l32, block=b)
    assert dinv.shape == (n // b, b, b)
    for fwd in (blocked_solve_lower, blocked_solve_lower_t):
        want = fwd(l32, c, block=b, unroll=True)
        got = fwd(l32, c, unroll=True, diag_inv=dinv)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-6
        )
    with pytest.raises(ValueError):
        blocked_solve_lower(l32, c, diag_inv=dinv[:-1])


def test_blocked_weights_match_dense_paths():
    """Above the blocked-solve threshold the weights come from panel
    sweeps; force that path with a small threshold monkeypatch."""
    gp = _gp(n=64, capacity=64)
    xq = RNG.normal(size=(6, 3))
    state = gp.state
    want_m, want_v = core.predict_mean_variance(state, xq)
    orig = core._BLOCKED_SOLVE_THRESHOLD
    core._BLOCKED_SOLVE_THRESHOLD = 16
    try:
        w = core.derive_weights(state)
        got_m, got_v = core.predict_mean_variance(state, xq, w)
    finally:
        core._BLOCKED_SOLVE_THRESHOLD = orig
    np.testing.assert_allclose(np.asarray(got_m), np.asarray(want_m),
                               rtol=1e-9, atol=1e-11)
    np.testing.assert_allclose(np.asarray(got_v), np.asarray(want_v),
                               rtol=1e-8, atol=1e-11)
