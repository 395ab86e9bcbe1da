"""Optimizer parity: marginal-likelihood gradients and full ADAM fit
trajectories (both scaled and generic paths) match the reference's exact
update rules, via the direct-loop oracle."""

import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.models.optimizer import (
    _generic_step,
    _inverse_and_alpha,
    _per_param_grads,
    AdamState,
    fit_parameters,
)

import oracle as orc

RNG = np.random.default_rng(3)


def _gp_pair(kern, okern, noise=0.3, n=7, d=2, cap=None):
    x = RNG.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.5 * x[:, 1] + 0.1 * RNG.normal(size=n)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), kern, noise, None, x, y, capacity=cap
    )
    ogp = orc.OracleGP(orc.OZeroPrior(), okern, noise, x, y)
    return gp, ogp


def test_generic_gradients_match_oracle():
    # RationalQuadratic is not scalable -> generic path w/ noise gradient
    gp, ogp = _gp_pair(
        fk.RationalQuadratic(alpha=1.2, ls=0.9), orc.ORationalQuadratic(1.2, 0.9),
        cap=11,  # exercise padding corrections (trace of K^-1)
    )
    state = gp.state
    cov_inv, alpha = _inverse_and_alpha(state)
    data_fit, complexity = _per_param_grads(state, cov_inv, alpha)
    grads_kernel = (np.asarray(data_fit) - np.asarray(complexity)) / 2.0
    want = ogp.gradient_marginal_likelihood()
    np.testing.assert_allclose(grads_kernel, want[:-1], rtol=1e-8)
    # noise gradient with the padded-trace correction
    cap = state.capacity
    noise_grad = float(state.noise) * (
        float(alpha @ alpha)
        - (float(jnp.trace(cov_inv)) - (cap - int(state.n)))
    )
    np.testing.assert_allclose(noise_grad, want[-1], rtol=1e-8)


def test_scaled_scale_matches_oracle():
    gp, ogp = _gp_pair(fk.SquaredExp(ls=0.8, ampl=1.1), orc.OSquaredExp(0.8, 1.1))
    state = gp.state
    _, alpha = _inverse_and_alpha(state)
    scale = float(state.resid @ alpha) / int(state.n)
    oscale, _ = ogp.scaled_gradient_marginal_likelihood()
    np.testing.assert_allclose(scale, oscale, rtol=1e-9)


@pytest.mark.parametrize("iters", [1, 5, 25])
def test_scaled_fit_trajectory_matches_oracle(iters):
    gp, ogp = _gp_pair(fk.SquaredExp(ls=0.9, ampl=1.2), orc.OSquaredExp(0.9, 1.2))
    gp.fit_parameters(False, True, max_iter=iters, convergence_fraction=1e-12)
    ogp.scaled_optimize_parameters(iters, 1e-12)
    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()), ogp.kern.get_parameters(), rtol=1e-6
    )
    np.testing.assert_allclose(gp.noise, ogp.noise, rtol=1e-6)
    xq = RNG.normal(size=(4, 2))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-6, atol=1e-8
    )


@pytest.mark.parametrize("iters", [1, 5, 25])
def test_generic_fit_trajectory_matches_oracle(iters):
    gp, ogp = _gp_pair(
        fk.RationalQuadratic(alpha=1.0, ls=1.0), orc.ORationalQuadratic(1.0, 1.0),
        cap=10,
    )
    gp.fit_parameters(False, True, max_iter=iters, convergence_fraction=1e-12)
    ogp.optimize_parameters(iters, 1e-12)
    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()), ogp.kern.get_parameters(), rtol=1e-6
    )
    np.testing.assert_allclose(gp.noise, ogp.noise, rtol=1e-6)


def test_fit_prior_refits_and_reresidualizes():
    gp, ogp = _gp_pair(fk.SquaredExp(ls=1.0, ampl=1.0), orc.OSquaredExp(1.0, 1.0))
    # replace zero prior with constant prior, fit prior only
    gp._state = gp._state.replace(prior=fp.ConstantPrior(c=0.0))
    ogp.prior = orc.OConstantPrior(0.0)
    gp.fit_parameters(True, False, max_iter=0)
    ogp.fit_parameters(True, False, 0, 0.05)
    np.testing.assert_allclose(float(gp.prior.c), ogp.prior.c, rtol=1e-10)
    xq = RNG.normal(size=(3, 2))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-8, atol=1e-9
    )


def test_linear_prior_fit_padded_matches_live():
    x = RNG.normal(size=(8, 3))
    y = x @ np.array([0.5, -1.0, 2.0]) + 0.3 + 0.01 * RNG.normal(size=8)
    live_fit = fp.LinearPrior.default(3).fit(jnp.asarray(x), jnp.asarray(y))
    x_pad = jnp.zeros((12, 3)).at[:8].set(x)
    y_pad = jnp.zeros((12,)).at[:8].set(y)
    mask = jnp.arange(12) < 8
    pad_fit = fp.LinearPrior.default(3).fit_padded(x_pad, y_pad, mask)
    np.testing.assert_allclose(
        np.asarray(pad_fit.weights), np.asarray(live_fit.weights), rtol=1e-8
    )
    np.testing.assert_allclose(
        float(pad_fit.intercept), float(live_fit.intercept), rtol=1e-8
    )


def test_convergence_stops_early():
    gp, _ = _gp_pair(fk.SquaredExp(ls=1.0, ampl=1.0), orc.OSquaredExp(1.0, 1.0))
    # huge convergence fraction -> should stop after the first iteration
    before = np.asarray(gp.kernel.get_params())
    gp.fit_parameters(False, True, max_iter=100, convergence_fraction=1e6)
    after = np.asarray(gp.kernel.get_params())
    # exactly one multiplicative update applied
    assert not np.allclose(before, after)


def test_default_full_pipeline_matches_oracle():
    """GaussianProcess::default end-to-end: heuristics + prior fit + scaled
    ADAM fit (the reference's main train entry, mod.rs:96-102)."""
    x = [[0.8], [1.2], [3.8], [4.2]]
    y = [3.0, 4.0, -2.0, -2.0]
    gp = ft.GaussianProcess.default(x, y)
    ogp = orc.oracle_default_gp(x, y)
    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()), ogp.kern.get_parameters(), rtol=1e-6
    )
    np.testing.assert_allclose(gp.noise, ogp.noise, rtol=1e-6)
    xq = [[1.0], [2.0], [3.0]]
    np.testing.assert_allclose(gp.predict(xq), ogp.predict(xq), rtol=1e-6, atol=1e-8)
    np.testing.assert_allclose(
        gp.predict_variance(xq), ogp.predict_variance(xq), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(gp.likelihood(), ogp.likelihood(), rtol=1e-6)


def test_map_fit_improves_exact_lml_and_beats_noise_recovery():
    from friedrich_tpu.models.map_fit import fit_map
    from friedrich_tpu.models.gp import log_marginal_likelihood

    n = 50
    x = np.sort(RNG.uniform(-3, 3, size=(n, 1)), axis=0)
    d = np.abs(x - x.T)
    k = 2.0 * np.exp(-(d**2) / (2 * 0.7**2)) + 0.1**2 * np.eye(n)
    y = np.linalg.cholesky(k) @ RNG.normal(size=n)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None, x, y
    )
    before = float(log_marginal_likelihood(gp.state))
    gp.fit_map(num_steps=300)
    after = float(log_marginal_likelihood(gp.state))
    assert after > before
    # fitted noise near the generating noise (log-space factor-2 band)
    assert abs(np.log(gp.noise) - np.log(0.1)) < np.log(2.0)


def test_polish_map_escapes_early_stop_and_noops_at_optimum():
    """polish_map (a) improves a deliberately early-stopped ADAM fit's
    exact LML, (b) moves (almost) nothing from a converged MAP point."""
    from friedrich_tpu.models.gp import log_marginal_likelihood
    from friedrich_tpu.models.map_fit import fit_map, polish_map
    from friedrich_tpu.models.optimizer import fit_kernel_noise

    n = 60
    x = np.sort(RNG.uniform(-3, 3, size=(n, 1)), axis=0)
    d = np.abs(x - x.T)
    k = 2.0 * np.exp(-(d**2) / (2 * 0.7**2)) + 0.1**2 * np.eye(n)
    y = np.linalg.cholesky(k) @ RNG.normal(size=n)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None, x, y
    )
    # a very loose convergence fraction forces the multiplicative rule
    # to stop early (the inflated-amplitude failure mode in miniature)
    early = fit_kernel_noise(
        gp.state, max_iter=100, convergence_fraction=0.5
    )
    lml_early = float(log_marginal_likelihood(early))
    polished = polish_map(early, num_steps=120, tol=1e-8)
    lml_polished = float(log_marginal_likelihood(polished))
    assert lml_polished > lml_early + 0.5, (lml_early, lml_polished)

    # from a converged exact-LML optimum the polish is a near-no-op
    at_opt = fit_map(gp.state, num_steps=400, tol=1e-9)
    lml_opt = float(log_marginal_likelihood(at_opt))
    repolished = polish_map(at_opt, num_steps=40, tol=1e-4)
    lml_re = float(log_marginal_likelihood(repolished))
    assert lml_re >= lml_opt - 0.5, (lml_opt, lml_re)


def test_map_fit_composed_kernel():
    from friedrich_tpu.models.map_fit import fit_map
    from friedrich_tpu.models.gp import log_marginal_likelihood

    x = RNG.normal(size=(30, 2))
    y = np.sin(x[:, 0]) + 0.1 * RNG.normal(size=30)
    kern = fk.Matern2() * fk.RationalQuadratic() + fk.Linear(c=0.1)
    gp = ft.GaussianProcess.new(fp.ZeroPrior(), kern, 0.3, None, x, y)
    before = float(log_marginal_likelihood(gp.state))
    state = fit_map(gp.state, num_steps=60)
    assert float(log_marginal_likelihood(state)) > before


@pytest.mark.parametrize("kern,okern", [
    (fk.Exponential(ls=1.0, ampl=1.0), orc.OExponential(1.0, 1.0)),
    (fk.Matern2(ls=1.0, ampl=1.0), orc.OMatern2(1.0, 1.0)),
], ids=["Exponential", "Matern2"])
def test_baseline_config2_multidim_fitted(kern, okern):
    """BASELINE config 2: multidimensional GP with exponential/Matern
    kernels, fitted kernel+prior+noise — full parity vs the oracle."""
    x = RNG.normal(size=(10, 3))
    y = x @ np.array([0.5, -0.3, 0.8]) + 0.1 * RNG.normal(size=10)
    gp = ft.GaussianProcess.new(
        fp.ConstantPrior(c=0.0), kern, 0.25, None, x, y
    )
    ogp = orc.OracleGP(orc.OConstantPrior(0.0), okern, 0.25, x, y)
    gp.fit_parameters(True, True, max_iter=15, convergence_fraction=1e-12)
    ogp.fit_parameters(True, True, 15, 1e-12)
    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()), ogp.kern.get_parameters(), rtol=1e-6
    )
    np.testing.assert_allclose(gp.noise, ogp.noise, rtol=1e-6)
    np.testing.assert_allclose(float(gp.prior.c), ogp.prior.c, rtol=1e-8)
    xq = RNG.normal(size=(5, 3))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-6, atol=1e-8
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict_variance(xq)), ogp.predict_variance(xq),
        rtol=1e-6, atol=1e-8,
    )


def test_map_fit_preserves_negative_parameter_signs():
    """Regression: fit_map must not flip legitimately negative params."""
    from friedrich_tpu.models.map_fit import fit_map

    # local generator: the shared module RNG made this test's data depend
    # on which tests ran before it on an xdist worker
    rng = np.random.default_rng(3)
    x = rng.normal(size=(20, 2))
    y = x[:, 0] * x[:, 1] + 0.05 * rng.normal(size=20)
    # a negative Linear.c adds c*J to K (lambda_min -> c*n = -1), so
    # noise^2 = 4 keeps K positive-definite FOR ANY DRAW (XX^T and the
    # SquaredExp part are PSD): the test isolates the sign-preservation
    # mechanics of the fit without data-dependent conditioning. (Round 1
    # used noise=0.5 + eps=1e-6 + c=-0.5 here, which silently produced a
    # non-finite substitute factor on unlucky draws — since round 2 the
    # engine detects that garbage and raises CholeskyError instead.)
    kern = fk.SquaredExp(ls=1.0, ampl=1.0) + fk.Linear(c=-0.05)
    gp = ft.GaussianProcess.new(fp.ZeroPrior(), kern, 2.0, None, x, y)
    state = fit_map(gp.state, num_steps=30)
    params = np.asarray(state.kernel.get_params())
    assert params[2] < 0  # Linear.c stays in the negative family
    assert params[0] > 0 and params[1] > 0


def test_sync_now_schedule():
    """Guarded-loop sync points: always iteration 1 (bounds max_time
    overshoot to one iteration and surfaces an immediately-failing
    Cholesky fast — ADVICE r3 medium), then the cadence, then the last."""
    from friedrich_tpu.models.optimizer import SYNC_EVERY, _sync_now

    assert _sync_now(1, 100, SYNC_EVERY)
    assert not _sync_now(2, 100, SYNC_EVERY)
    assert not _sync_now(7, 100, SYNC_EVERY)
    assert _sync_now(8, 100, SYNC_EVERY)
    assert _sync_now(100, 100, SYNC_EVERY)  # last iteration always syncs
    # configurable cadence: sync_every=1 syncs everywhere
    assert all(_sync_now(i, 10, 1) for i in range(1, 11))


def test_fit_sync_every_matches_default():
    """sync_every only changes WHEN flags are read, never the math: a
    per-iteration-synced fit lands on the same hyperparameters."""
    import numpy as np

    from friedrich_tpu.kernels import SquaredExp
    from friedrich_tpu.models.gp import make_state
    from friedrich_tpu.models.optimizer import fit_kernel_noise
    from friedrich_tpu.priors import ConstantPrior

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(64, 2)))
    y = jnp.asarray(np.sin(2.0 * np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=64))
    kernel = SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0))
    state, ok = make_state(kernel, ConstantPrior(jnp.asarray(0.0)), 0.3, x, y)
    assert bool(ok)
    a = fit_kernel_noise(state, max_iter=12, gradient="exact")
    b = fit_kernel_noise(state, max_iter=12, gradient="exact", sync_every=1)
    np.testing.assert_allclose(
        np.asarray(a.kernel.get_params()), np.asarray(b.kernel.get_params())
    )
    np.testing.assert_allclose(float(a.noise), float(b.noise))


def test_auto_subsample_policy():
    from friedrich_tpu.models.optimizer import (
        AUTO_SUBSAMPLE_THRESHOLD,
        LARGE_FIT_THRESHOLD,
        auto_subsample,
    )

    assert auto_subsample(1_000) is None
    assert auto_subsample(AUTO_SUBSAMPLE_THRESHOLD - 1) is None
    # at the boundary the subset is the floor size
    assert auto_subsample(AUTO_SUBSAMPLE_THRESHOLD) == LARGE_FIT_THRESHOLD
    assert auto_subsample(50_000) == 10_000   # the measured round-3 winner
    assert auto_subsample(100_000) == 20_000


def test_fit_subsample_auto_resolves_and_fits():
    """subsample='auto' resolves via the policy: below the threshold it
    must take the full-fit path and produce exactly the full fit's
    hyperparameters."""
    import numpy as np

    from friedrich_tpu.kernels import SquaredExp
    from friedrich_tpu.models.gp import make_state
    from friedrich_tpu.models.optimizer import fit_parameters
    from friedrich_tpu.priors import ConstantPrior

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(48, 2)))
    y = jnp.asarray(np.sin(np.asarray(x)[:, 0]) + 0.1 * rng.normal(size=48))
    kernel = SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0))
    state, ok = make_state(kernel, ConstantPrior(jnp.asarray(0.0)), 0.3, x, y)
    assert bool(ok)
    a = fit_parameters(state, max_iter=8, subsample="auto")
    b = fit_parameters(state, max_iter=8, subsample=None)
    np.testing.assert_allclose(
        np.asarray(a.kernel.get_params()), np.asarray(b.kernel.get_params())
    )


def test_builder_fit_subsample_knob():
    """The builder knob reaches train(): an explicit subset size fits on
    the subset (deterministic seed) and still returns a full-n model."""
    import numpy as np

    import friedrich_tpu as ft
    from friedrich_tpu.utils.errors import ConfigError

    rng = np.random.default_rng(2)
    x = rng.normal(size=(96, 2))
    y = np.sin(2.0 * x[:, 0]) + 0.1 * rng.normal(size=96)
    gp = (
        ft.GaussianProcessBuilder(x, y)
        .set_noise(0.3)
        .set_fit_subsample(48)
        .set_fit_parameters(6, 0.05)
        .fit_kernel()
        .fit_prior()
        .train()
    )
    assert gp.num_samples == 96
    mean = gp.predict(x[:5])
    assert np.all(np.isfinite(np.asarray(mean)))
    with pytest.raises(ConfigError):
        ft.GaussianProcessBuilder(x, y).set_fit_subsample(-3)
    with pytest.raises(ConfigError):
        ft.GaussianProcessBuilder(x, y).set_fit_gradient("bogus")


def test_builder_subfit_first_matches_quality_and_counts_one_factor():
    """train() with set_fit_subsample fits on the subset FIRST and builds
    the full model exactly once at the fitted parameters: the result must
    carry a full-n state, a prior fitted on the FULL data, and
    hyperparameters equal to an explicit sub-model fit (same seed)."""
    import numpy as np

    import friedrich_tpu as ft
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    import jax

    rng = np.random.default_rng(5)
    n = 120
    x = rng.normal(size=(n, 2))
    y = np.sin(2.0 * x[:, 0]) + 0.3 + 0.1 * rng.normal(size=n)
    gp = (
        ft.GaussianProcessBuilder(x, y)
        .set_noise(0.3)
        .set_fit_subsample(60)
        .set_fit_parameters(8, 0.05)
        .fit_kernel()
        .fit_prior()
        .train()
    )
    assert gp.num_samples == n

    # reproduce by hand: heuristic -> prior on full data -> sub-fit
    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    kern = fk.Gaussian().heuristic_fit(xj, yj)
    prior = fp.ConstantPrior.default(2).fit(xj, yj)
    idx = np.asarray(
        jnp.sort(jax.random.permutation(jax.random.PRNGKey(0), n)[:60])
    )
    sub = ft.GaussianProcess.new(
        prior, kern, 0.3, None, x[idx], y[idx], backend="auto"
    )
    sub.fit_parameters(
        fit_prior=False, fit_kernel=True, max_iter=8,
        convergence_fraction=0.05,
    )
    np.testing.assert_allclose(
        np.asarray(gp.kernel.get_params()),
        np.asarray(sub.kernel.get_params()),
    )
    np.testing.assert_allclose(gp.noise, sub.noise)
    # prior fitted on the FULL outputs (mean), not the subset's
    np.testing.assert_allclose(
        float(gp.prior.mean(jnp.zeros((1, 2)))[0]), float(np.mean(y)),
        rtol=1e-6,
    )
    # and the model must predict sanely at full n
    mean = np.asarray(gp.predict(x[:8]))
    assert np.all(np.isfinite(mean))


def test_builder_subsample_auto_below_threshold_is_reference_flow():
    """'auto' resolves to None below the policy threshold: same result as
    the plain full fit."""
    import numpy as np

    import friedrich_tpu as ft

    rng = np.random.default_rng(6)
    x = rng.normal(size=(64, 2))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=64)

    def build(sub):
        b = (
            ft.GaussianProcessBuilder(x, y)
            .set_noise(0.3)
            .set_fit_parameters(6, 0.05)
            .fit_kernel()
            .fit_prior()
        )
        if sub is not None:
            b = b.set_fit_subsample(sub)
        return b.train()

    a = build("auto")
    b = build(None)
    np.testing.assert_allclose(
        np.asarray(a.kernel.get_params()), np.asarray(b.kernel.get_params())
    )
    np.testing.assert_allclose(a.noise, b.noise)


def test_builder_subsample_auto_is_default():
    """The measured subsample policy is the train() DEFAULT ('auto':
    reference full fit below the threshold, sub-fit-first above);
    set_fit_subsample(None) restores the reference flow everywhere."""
    import numpy as np

    import friedrich_tpu as ft
    from friedrich_tpu.models.optimizer import (
        AUTO_SUBSAMPLE_THRESHOLD, auto_subsample,
    )

    x = np.zeros((4, 1))
    y = np.zeros(4)
    b = ft.GaussianProcessBuilder(x, y)
    assert b._fit_subsample == "auto"
    assert b._resolved_subsample(AUTO_SUBSAMPLE_THRESHOLD - 1) is None
    assert (
        b._resolved_subsample(10 * AUTO_SUBSAMPLE_THRESHOLD)
        == auto_subsample(10 * AUTO_SUBSAMPLE_THRESHOLD)
    )
    assert b.set_fit_subsample(None)._resolved_subsample(10 ** 6) is None
