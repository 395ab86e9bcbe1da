"""Single-chip large-n hyperparameter fit (``models/large_fit.py``).

The streamed/Hutchinson fit replaces the exact path's dense K^-1 and
(p, cap, cap) gradient stack (``optimizer.rs:32,169``;
``algebra/mod.rs:129-155``) with factor-based solves; these tests pin it
against the exact parity optimizer:

- EXACT equivalence when the probe set is the (scaled) identity basis —
  the Hutchinson estimator then computes the true traces, so one step of
  the large fit must reproduce one step of the exact fit to rounding;
- Monte-Carlo agreement of the full fitted hyperparameters at moderate n;
- the auto dispatch by capacity in ``fit_kernel_noise``;
- the public-API plumbing (``GaussianProcess.fit_parameters(gradient=)``)
  including padded capacities and bf16 factor storage.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
from friedrich_tpu.models import gp as core
from friedrich_tpu.models.large_fit import (
    _grad_step_large,
    fit_kernel_noise_large,
    make_probes,
)
from friedrich_tpu.models.optimizer import (
    AdamState,
    LARGE_FIT_THRESHOLD,
    _generic_step,
    _scaled_step,
    fit_kernel_noise,
)
from friedrich_tpu.priors import ConstantPrior

RNG = np.random.default_rng(42)


def _make_state(n=200, d=3, kernel=None, noise=0.3, cap=None, seed=0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.5 * np.cos(x[:, 1]) + 0.1 * rng.normal(size=n)
    kernel = kernel or fk.SquaredExp(ls=1.0, ampl=1.0)
    state, ok = core.make_state(
        kernel, ConstantPrior(0.0), noise, jnp.asarray(x), jnp.asarray(y),
        cap=cap,
    )
    assert bool(ok)
    return state


def _adam_for(state, scalable):
    params = state.kernel.get_params()
    if not scalable:
        params = jnp.concatenate([params, jnp.log(state.noise)[None]])
    return AdamState(
        params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params)
    )


class TestExactEquivalence:
    """With probes = sqrt(cap) * I the Hutchinson traces are EXACT:
    mean_s (K^-1 z_s)^T (dK z_s) = sum_s (K^-1)_s . (dK)_s = tr(K^-1 dK).
    One large-fit step must then match one exact-optimizer step."""

    def _identity_probes(self, state):
        cap = state.capacity
        return jnp.eye(cap, dtype=state.resid.dtype) * np.sqrt(cap)

    @pytest.mark.parametrize("scalable", [True, False])
    def test_one_step_matches_exact(self, scalable):
        kernel = (
            fk.SquaredExp(ls=0.9, ampl=1.2)
            if scalable
            else fk.RationalQuadratic(alpha=1.1, ls=0.8)
        )
        state = _make_state(n=64, kernel=kernel)
        adam = _adam_for(state, scalable)
        conv = jnp.asarray(0.05, state.resid.dtype)

        adam_l, kernel_l, noise_l, _, info_l = _grad_step_large(
            state, adam, self._identity_probes(state), jnp.asarray(1), conv,
            scalable,
        )
        exact_step = _scaled_step if scalable else _generic_step
        state_e, adam_e, _, ok, info_e = exact_step(
            state, adam, jnp.asarray(1), conv
        )
        assert bool(ok)
        np.testing.assert_allclose(
            np.asarray(adam_l.params), np.asarray(adam_e.params), rtol=1e-8
        )
        np.testing.assert_allclose(
            float(noise_l), float(state_e.noise), rtol=1e-8
        )
        np.testing.assert_allclose(
            float(info_l["max_delta"]), float(info_e["max_delta"]), rtol=1e-8
        )

    def test_exact_equivalence_with_padding(self):
        """Dead rows: probes are zeroed there, so the estimator sees only
        the live block — equivalent to the exact path's explicit
        (cap - n) trace correction."""
        state = _make_state(n=48, cap=64)
        adam = _adam_for(state, True)
        conv = jnp.asarray(0.05, state.resid.dtype)
        live = (jnp.arange(64) < state.n)[:, None]
        probes = jnp.where(
            live, jnp.eye(64, dtype=state.resid.dtype) * np.sqrt(64), 0.0
        )
        adam_l, _, noise_l, _, _ = _grad_step_large(
            state, adam, probes, jnp.asarray(1), conv, True
        )
        state_e, adam_e, _, ok, _ = _scaled_step(
            state, adam, jnp.asarray(1), conv
        )
        assert bool(ok)
        np.testing.assert_allclose(
            np.asarray(adam_l.params), np.asarray(adam_e.params), rtol=1e-8
        )
        np.testing.assert_allclose(
            float(noise_l), float(state_e.noise), rtol=1e-8
        )


class TestMonteCarloAgreement:
    def test_scaled_fit_agrees_with_exact(self):
        state = _make_state(n=300)
        exact = fit_kernel_noise(
            state, max_iter=30, convergence_fraction=0.05, max_time=300,
            gradient="exact",
        )
        large = fit_kernel_noise_large(
            state, max_iter=30, convergence_fraction=0.05, max_time=300,
            num_probes=32, seed=0,
        )
        # trajectories compound the Monte-Carlo trace error, so endpoint
        # hyperparameters agree loosely ...
        np.testing.assert_allclose(
            np.asarray(large.kernel.get_params()),
            np.asarray(exact.kernel.get_params()),
            rtol=0.25,
        )
        np.testing.assert_allclose(
            float(large.noise), float(exact.noise), rtol=0.25
        )
        # ... while the fitted MODELS agree where it matters: predictions
        xq = jnp.asarray(np.random.default_rng(9).normal(size=(64, 3)))
        m_exact = core.predict_mean(exact, xq)
        m_large = core.predict_mean(large, xq)
        np.testing.assert_allclose(
            np.asarray(m_large), np.asarray(m_exact), atol=0.05
        )

    def test_generic_fit_agrees_with_exact(self):
        kernel = fk.RationalQuadratic(alpha=1.0, ls=1.0)
        state = _make_state(n=256, kernel=kernel)
        exact = fit_kernel_noise(
            state, max_iter=20, convergence_fraction=0.05, max_time=300,
            gradient="exact",
        )
        large = fit_kernel_noise_large(
            state, max_iter=20, convergence_fraction=0.05, max_time=300,
            num_probes=32, seed=1,
        )
        np.testing.assert_allclose(
            np.asarray(large.kernel.get_params()),
            np.asarray(exact.kernel.get_params()),
            rtol=0.2,
        )
        np.testing.assert_allclose(
            float(large.noise), float(exact.noise), rtol=0.2
        )

    def test_fit_is_deterministic_for_fixed_seed(self):
        state = _make_state(n=128)
        a = fit_kernel_noise_large(
            state, max_iter=5, convergence_fraction=0.0, max_time=300, seed=3
        )
        b = fit_kernel_noise_large(
            state, max_iter=5, convergence_fraction=0.0, max_time=300, seed=3
        )
        np.testing.assert_array_equal(
            np.asarray(a.kernel.get_params()),
            np.asarray(b.kernel.get_params()),
        )

    def test_fit_improves_lml(self):
        state = _make_state(n=256, kernel=fk.SquaredExp(ls=3.0, ampl=0.2))
        before = float(core.log_marginal_likelihood(state))
        fitted = fit_kernel_noise_large(
            state, max_iter=40, convergence_fraction=0.05, max_time=300
        )
        after = float(core.log_marginal_likelihood(fitted))
        assert after > before


class TestDispatch:
    def test_auto_picks_large_above_threshold(self, monkeypatch):
        calls = {}
        import friedrich_tpu.models.large_fit as lf

        real = lf.fit_kernel_noise_large

        def spy(state, *a, **k):
            calls["large"] = True
            return real(state, *a, **k)

        monkeypatch.setattr(lf, "fit_kernel_noise_large", spy)
        state = _make_state(n=64, cap=LARGE_FIT_THRESHOLD + 64)
        fit_kernel_noise(
            state, max_iter=1, convergence_fraction=0.05, max_time=300
        )
        assert calls.get("large")

    def test_auto_picks_exact_below_threshold(self, monkeypatch):
        import friedrich_tpu.models.large_fit as lf

        def boom(*a, **k):  # must not be called
            raise AssertionError("large fit dispatched below threshold")

        monkeypatch.setattr(lf, "fit_kernel_noise_large", boom)
        state = _make_state(n=64)
        fit_kernel_noise(
            state, max_iter=1, convergence_fraction=0.05, max_time=300
        )

    def test_unknown_gradient_rejected(self):
        state = _make_state(n=32)
        with pytest.raises(ValueError, match="gradient"):
            fit_kernel_noise(state, gradient="bogus")


class TestPublicApi:
    def test_fit_parameters_gradient_kwarg(self):
        rng = np.random.default_rng(5)
        x = rng.normal(size=(150, 3))
        y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=150)
        gp = (
            ft.GaussianProcessBuilder(x, y)
            .set_kernel(fk.SquaredExp(ls=2.0, ampl=0.5))
            .set_noise(0.2)
            .train()
        )
        before = gp.log_marginal_likelihood()
        gp.fit_parameters(
            fit_prior=True, fit_kernel=True, max_iter=25,
            gradient="hutchinson", num_probes=32,
        )
        assert gp.log_marginal_likelihood() > before
        # and predictions stay sane
        mean = gp.predict(x[:5])
        assert np.all(np.isfinite(np.asarray(mean)))

    def test_fit_hutchinson_streamed_bf16(self):
        """The large fit must run against a bf16-STORED streamed factor
        (reads the factor natively in the sweeps, donates the rebuild)."""
        rng = np.random.default_rng(6)
        x = rng.normal(size=(200, 3)).astype(np.float32)
        y = (np.sin(x[:, 0]) + 0.1 * rng.normal(size=200)).astype(np.float32)
        gp = (
            ft.GaussianProcessBuilder(x, y)
            .set_kernel(fk.SquaredExp(ls=2.0, ampl=0.5))
            .set_noise(0.5)
            .set_dtype("float32")
            .set_backend("streamed")
            .set_factor_storage("bf16")
            .train()
        )
        gp.fit_parameters(
            fit_prior=False, fit_kernel=True, max_iter=5,
            gradient="hutchinson", num_probes=8,
        )
        assert gp.state.l.dtype == jnp.bfloat16
        assert np.isfinite(gp.log_marginal_likelihood())


class TestSubsampledFit:
    def test_subsample_geq_n_equals_full_fit(self):
        from friedrich_tpu.models.optimizer import fit_subsampled

        state = _make_state(n=128)
        full = fit_kernel_noise(
            state, max_iter=10, convergence_fraction=0.05, max_time=300
        )
        sub = fit_subsampled(
            state, 128, max_iter=10, convergence_fraction=0.05, max_time=300
        )
        np.testing.assert_array_equal(
            np.asarray(sub.kernel.get_params()),
            np.asarray(full.kernel.get_params()),
        )

    def test_subsample_recovers_hyperparams(self):
        from friedrich_tpu.models.optimizer import fit_subsampled

        state = _make_state(n=600, seed=2)
        full = fit_kernel_noise(
            state, max_iter=30, convergence_fraction=0.05, max_time=300
        )
        sub = fit_subsampled(
            state, 300, max_iter=30, convergence_fraction=0.05, max_time=300
        )
        # hyperparameters within sampling error of the full fit: the
        # lengthscale is well identified; amplitude/noise trade off on
        # half the data (scaled-path rescaling), so factor-of-2 there
        p_sub = np.asarray(sub.kernel.get_params())
        p_full = np.asarray(full.kernel.get_params())
        np.testing.assert_allclose(p_sub[0], p_full[0], rtol=0.35)
        assert 0.5 < p_sub[1] / p_full[1] < 2.0
        assert 0.5 < float(sub.noise) / float(full.noise) < 2.0
        # ... and the FULL factor was rebuilt (predictions use all n)
        xq = jnp.asarray(np.random.default_rng(8).normal(size=(32, 3)))
        m_full = core.predict_mean(full, xq)
        m_sub = core.predict_mean(sub, xq)
        np.testing.assert_allclose(
            np.asarray(m_sub), np.asarray(m_full), atol=0.1
        )

    def test_api_subsample_kwarg(self):
        rng = np.random.default_rng(11)
        x = rng.normal(size=(300, 3))
        y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=300)
        gp = (
            ft.GaussianProcessBuilder(x, y)
            .set_kernel(fk.SquaredExp(ls=2.0, ampl=0.5))
            .set_noise(0.2)
            .train()
        )
        before = gp.log_marginal_likelihood()
        gp.fit_parameters(
            fit_prior=False, fit_kernel=True, max_iter=20, subsample=150
        )
        assert gp.log_marginal_likelihood() > before
        assert gp.num_samples == 300  # model still uses all data

    def test_subsample_invalid(self):
        from friedrich_tpu.models.optimizer import fit_subsampled

        state = _make_state(n=64)
        with pytest.raises(ValueError, match="subsample"):
            fit_subsampled(state, 0)


def test_make_probes_dead_rows_zero():
    state = _make_state(n=40, cap=64)
    probes = make_probes(state, 4, 0)
    assert probes.shape == (64, 4)
    np.testing.assert_array_equal(np.asarray(probes[40:]), 0.0)
    assert set(np.unique(np.asarray(probes[:40]))) <= {-1.0, 1.0}


def test_fused_step_compile_failure_falls_back(monkeypatch):
    """When the fused fit-step program fails to COMPILE (the remote TPU
    helper rejects it at headline sizes — HTTP 500), the fit must fall
    back to the two-program per-iteration loop and produce the same
    result it would have without fusion."""
    import friedrich_tpu.priors as fp
    from friedrich_tpu.models import large_fit

    rng = np.random.default_rng(0)
    n = 48
    x = jnp.asarray(rng.normal(size=(n, 2)), jnp.float64)
    y = jnp.sin(x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=n))
    kern = fk.SquaredExp(ls=jnp.asarray(1.5), ampl=jnp.asarray(1.0))
    state, ok = core.make_state(
        kern, fp.ZeroPrior(), jnp.asarray(0.4), x, y, backend="streamed",
        block=16,
    )
    assert bool(ok)

    def boom(*a, **k):
        raise RuntimeError(
            "INTERNAL: http://127.0.0.1:8093/remote_compile: HTTP 500"
        )

    monkeypatch.setattr(large_fit, "_fused_fit_step_donate", boom)
    monkeypatch.setattr(large_fit, "_fused_fit_step_nodonate", boom)
    with pytest.warns(RuntimeWarning, match="falling back"):
        fitted = fit_kernel_noise_large(state, 6, 0.05, 3600.0)

    # reference: the same fit through the per-iteration (fit_log) loop
    state2, _ = core.make_state(
        kern, fp.ZeroPrior(), jnp.asarray(0.4), x, y, backend="streamed",
        block=16,
    )
    from friedrich_tpu.utils.fitlog import FitLog

    want = fit_kernel_noise_large(state2, 6, 0.05, 3600.0,
                                  fit_log=FitLog())
    np.testing.assert_allclose(
        np.asarray(fitted.kernel.get_params()),
        np.asarray(want.kernel.get_params()), rtol=1e-12,
    )
    np.testing.assert_allclose(fitted.noise, want.noise, rtol=1e-12)


def test_fused_step_unrelated_error_propagates(monkeypatch):
    """Only compile-helper failures trigger the fallback: any other
    exception from the fused step must propagate."""
    import friedrich_tpu.priors as fp
    from friedrich_tpu.models import large_fit

    rng = np.random.default_rng(1)
    x = jnp.asarray(rng.normal(size=(32, 2)))
    y = jnp.sin(x[:, 0])
    state, _ = core.make_state(
        fk.SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0)),
        fp.ZeroPrior(), jnp.asarray(0.3), x, y, backend="streamed",
        block=16,
    )

    def boom(*a, **k):
        raise RuntimeError("something else entirely")

    monkeypatch.setattr(large_fit, "_fused_fit_step_donate", boom)
    monkeypatch.setattr(large_fit, "_fused_fit_step_nodonate", boom)
    with pytest.raises(RuntimeError, match="something else"):
        fit_kernel_noise_large(state, 4, 0.05, 3600.0)


def test_fused_step_compile_failure_memoized(monkeypatch):
    """A second fit at the same capacity must not re-attempt the failed
    fused compile (tens of seconds over the remote helper)."""
    import friedrich_tpu.priors as fp
    from friedrich_tpu.models import large_fit

    rng = np.random.default_rng(2)
    x = jnp.asarray(rng.normal(size=(40, 2)))
    y = jnp.sin(x[:, 0])
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("INTERNAL: remote_compile: HTTP 500")

    monkeypatch.setattr(large_fit, "_fused_fit_step_donate", boom)
    monkeypatch.setattr(large_fit, "_fused_fit_step_nodonate", boom)
    monkeypatch.setattr(large_fit, "_FUSED_STEP_UNCOMPILABLE", set())
    for expect_calls in (1, 1):  # second fit: no new attempt
        state, _ = core.make_state(
            fk.SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0)),
            fp.ZeroPrior(), jnp.asarray(0.4), x, y, backend="streamed",
            block=8,
        )
        import warnings as w

        with w.catch_warnings():
            w.simplefilter("ignore")
            fitted = large_fit.fit_kernel_noise_large(state, 3, 0.05, 3600.0)
        assert bool(jnp.all(jnp.isfinite(fitted.kernel.get_params())))
        assert calls["n"] == expect_calls
