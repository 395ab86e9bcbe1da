"""End-to-end GP parity against the direct-loop oracle: prediction paths,
likelihoods, posterior sampling, input-type polymorphism, and properties
(PSD posterior covariance, interpolation as noise->0)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp

import oracle as orc

RNG = np.random.default_rng(2)

# the README 4-point dataset (reference main.rs:16-17)
README_X = [[0.8], [1.2], [3.8], [4.2]]
README_Y = [3.0, 4.0, -2.0, -2.0]


def _fixed_gp(kern, okern, prior, oprior, noise=0.2, n=8, d=2, cap=None):
    x = RNG.normal(size=(n, d))
    y = RNG.normal(size=n)
    gp = ft.GaussianProcess.new(prior, kern, noise, None, x, y, capacity=cap)
    ogp = orc.OracleGP(oprior, okern, noise, x, y)
    return gp, ogp


CASES = [
    (fk.SquaredExp(ls=0.9, ampl=1.4), orc.OSquaredExp(0.9, 1.4),
     fp.ConstantPrior(c=0.5), orc.OConstantPrior(0.5)),
    (fk.Exponential(ls=1.1, ampl=0.8), orc.OExponential(1.1, 0.8),
     fp.ZeroPrior(), orc.OZeroPrior()),
    (fk.Matern1(ls=0.7, ampl=1.0), orc.OMatern1(0.7, 1.0),
     fp.LinearPrior(weights=jnp.asarray([0.3, -0.2]), intercept=0.1),
     orc.OLinearPrior([0.3, -0.2], 0.1)),
    (fk.Matern2(ls=1.3, ampl=0.9), orc.OMatern2(1.3, 0.9),
     fp.ConstantPrior(c=-0.4), orc.OConstantPrior(-0.4)),
]


@pytest.mark.parametrize("kern,okern,prior,oprior", CASES,
                         ids=lambda a: type(a).__name__)
def test_predict_paths_match_oracle(kern, okern, prior, oprior):
    gp, ogp = _fixed_gp(kern, okern, prior, oprior, cap=13)  # cap > n: padded
    xq = RNG.normal(size=(5, 2))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-8, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict_variance(xq)), ogp.predict_variance(xq),
        rtol=1e-7, atol=1e-9,
    )
    m, v = gp.predict_mean_variance(xq)
    np.testing.assert_allclose(np.asarray(m), ogp.predict(xq), rtol=1e-8, atol=1e-9)
    np.testing.assert_allclose(
        np.asarray(v), ogp.predict_variance(xq), rtol=1e-7, atol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(gp.predict_covariance(xq)), ogp.predict_covariance(xq),
        rtol=1e-7, atol=1e-9,
    )
    np.testing.assert_allclose(gp.likelihood(), ogp.likelihood(), rtol=1e-9)


def test_posterior_sampler_matches_oracle_moments():
    gp, ogp = _fixed_gp(
        fk.SquaredExp(ls=1.0, ampl=1.0), orc.OSquaredExp(1.0, 1.0),
        fp.ConstantPrior(c=0.0), orc.OConstantPrior(0.0), noise=0.4,
    )
    xq = RNG.normal(size=(3, 2))
    mean_o, cov_o = ogp.posterior(xq)
    sampler = gp.sample_at(xq)
    np.testing.assert_allclose(np.asarray(sampler.mean()), mean_o, rtol=1e-8, atol=1e-9)
    draws = np.asarray(sampler.sample_n(jax.random.PRNGKey(0), 200_000))
    np.testing.assert_allclose(draws.mean(axis=0), mean_o, atol=1.5e-2)
    np.testing.assert_allclose(np.cov(draws.T), cov_o, atol=1.5e-2)


def test_input_type_polymorphism():
    gp = ft.GaussianProcess.builder(README_X, README_Y).train()
    # flat list = one sample -> scalar
    assert isinstance(gp.predict([1.0]), float)
    # nested list -> list
    out = gp.predict([[1.0], [2.0]])
    assert isinstance(out, list) and len(out) == 2
    # numpy in -> numpy out
    out_np = gp.predict(np.array([[1.0], [2.0]]))
    assert isinstance(out_np, np.ndarray)
    # jax in -> jax out
    out_jx = gp.predict(jnp.asarray([[1.0], [2.0]]))
    assert isinstance(out_jx, jnp.ndarray)
    np.testing.assert_allclose(out, out_np)
    np.testing.assert_allclose(out, np.asarray(out_jx))
    # single-sample path equals batch path
    np.testing.assert_allclose(gp.predict([1.0]), out[0])


def test_readme_dataset_interpolation_sanity():
    gp = ft.GaussianProcess.default(README_X, README_Y)
    # near training points, prediction tracks the data
    assert abs(gp.predict([1.0]) - 3.5) < 1.0
    assert gp.predict([4.0]) < 0.0
    v = gp.predict_variance([1.0])
    assert v > 0


def test_posterior_covariance_is_psd():
    gp, _ = _fixed_gp(
        fk.SquaredExp(ls=1.0, ampl=2.0), orc.OSquaredExp(1.0, 2.0),
        fp.ZeroPrior(), orc.OZeroPrior(), noise=0.3, n=10,
    )
    xq = RNG.normal(size=(6, 2))
    cov = np.asarray(gp.predict_covariance(xq))
    evals = np.linalg.eigvalsh((cov + cov.T) / 2)
    assert evals.min() > -1e-8


def test_interpolation_as_noise_to_zero():
    x = RNG.normal(size=(6, 1))
    y = RNG.normal(size=6)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 1e-6, None, x, y
    )
    np.testing.assert_allclose(np.asarray(gp.predict(x)), y, atol=1e-4)
    assert np.all(np.asarray(gp.predict_variance(x)) < 1e-4)


def test_exact_lml_vs_likelihood_approximation():
    gp, ogp = _fixed_gp(
        fk.SquaredExp(ls=0.8, ampl=1.2), orc.OSquaredExp(0.8, 1.2),
        fp.ZeroPrior(), orc.OZeroPrior(),
    )
    # the friedrich approximation is replicated...
    np.testing.assert_allclose(gp.likelihood(), ogp.likelihood(), rtol=1e-9)
    # ...and the exact LML differs from it (it is a different quantity)
    resid = ogp.resid
    sign, logdet = np.linalg.slogdet(ogp.l @ ogp.l.T)
    alpha = np.linalg.solve(ogp.l @ ogp.l.T, resid)
    want = -0.5 * (resid @ alpha + logdet + len(resid) * np.log(2 * np.pi))
    np.testing.assert_allclose(gp.log_marginal_likelihood(), want, rtol=1e-8)


def test_noise_validation():
    with pytest.raises(ft.ConfigError):
        ft.GaussianProcess.new(
            fp.ZeroPrior(), fk.SquaredExp(), -0.1, None, README_X, README_Y
        )


def test_dim_mismatch_raises():
    gp = ft.GaussianProcess.builder(README_X, README_Y).train()
    with pytest.raises(ft.ShapeError):
        gp.predict([[1.0, 2.0]])


def test_set_hyperparameters_rebuilds_consistently():
    x = RNG.normal(size=(15, 2))
    y = RNG.normal(size=15)
    gp = ft.GaussianProcess.new(fp.ZeroPrior(), fk.SquaredExp(), 0.2, None, x, y)
    gp.set_hyperparameters(
        kernel=fk.Matern2(ls=0.8, ampl=1.1), noise=0.3,
        prior=fp.ConstantPrior(c=0.5),
    )
    ref = ft.GaussianProcess.new(
        fp.ConstantPrior(c=0.5), fk.Matern2(ls=0.8, ampl=1.1), 0.3, None, x, y
    )
    xq = RNG.normal(size=(4, 2))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), np.asarray(ref.predict(xq)), atol=1e-10
    )
    np.testing.assert_allclose(gp.likelihood(), ref.likelihood(), rtol=1e-9)


def test_predict_in_batches_matches_unbatched():
    x = RNG.normal(size=(30, 2))
    y = RNG.normal(size=30)
    gp = ft.GaussianProcess.new(fp.ZeroPrior(), fk.SquaredExp(), 0.2, None, x, y)
    xq = RNG.normal(size=(77, 2))
    mb, vb = gp.predict_in_batches(xq, batch_size=16)
    m, v = gp.predict_mean_variance(jnp.asarray(xq))
    np.testing.assert_array_equal(np.asarray(mb), np.asarray(m))
    np.testing.assert_array_equal(np.asarray(vb), np.asarray(v))


def test_direct_distance_method_end_to_end():
    """The 'direct' (broadcast-diff) distance path through builder + fit +
    predict matches the oracle like the default gram path."""
    x = RNG.normal(size=(10, 2))
    y = np.sin(x[:, 0])
    gp = (
        ft.GaussianProcess.builder(x, y)
        .set_distance_method("direct")
        .set_noise(0.2)
        .fit_kernel()
        .set_fit_parameters(5, 1e-12)
        .train()
    )
    ogp = orc.OracleGP(
        orc.OConstantPrior(0.0),
        (lambda k: (k.heuristic_fit(x, y), k)[1])(orc.OSquaredExp()),
        0.2, x, y,
    )
    ogp.scaled_optimize_parameters(5, 1e-12)
    xq = RNG.normal(size=(4, 2))
    np.testing.assert_allclose(
        np.asarray(gp.predict(xq)), ogp.predict(xq), rtol=1e-6, atol=1e-8
    )


def test_auto_backend_through_builder():
    x = RNG.normal(size=(40, 2))
    y = RNG.normal(size=40)
    gp_a = ft.GaussianProcess.builder(x, y).set_backend("auto").set_noise(0.2).train()
    gp_d = ft.GaussianProcess.builder(x, y).set_noise(0.2).train()
    xq = RNG.normal(size=(4, 2))
    np.testing.assert_allclose(
        np.asarray(gp_a.predict(xq)), np.asarray(gp_d.predict(xq)),
        rtol=1e-10,
    )


def test_undersized_capacity_raises_config_error():
    x = RNG.normal(size=(10, 1))
    y = RNG.normal(size=10)
    with pytest.raises(ft.ConfigError):
        ft.GaussianProcess.new(
            fp.ZeroPrior(), fk.SquaredExp(), 0.2, None, x, y, capacity=5
        )


def test_fused_constructor_matches_eager_path():
    """make_state's fused single-dispatch construction (one program for
    residualize + pad + build + factor — dispatch round trips are
    expensive over a remote TPU runtime) must produce exactly the state
    the eager composition produces, for dense and streamed backends,
    with capacity padding and a fitted prior."""
    from friedrich_tpu.models import gp as core

    rng = np.random.default_rng(11)
    x = jnp.asarray(rng.normal(size=(24, 3)))
    y = jnp.asarray(np.sin(rng.normal(size=24)))
    kern = fk.SquaredExp(ls=jnp.asarray(0.7), ampl=jnp.asarray(1.2))
    prior = fp.ConstantPrior.default(3).fit(x, y)
    for backend in ("dense", "streamed"):
        for cap in (24, 32):
            state, ok = core.make_state(
                kern, prior, 0.3, x, y, cap=cap, backend=backend,
                block=8 if backend == "streamed" else None,
            )
            assert bool(ok)
            resid = y - prior.mean(x)
            x_pad, r_pad = core.pad_capacity(x, resid, cap)
            l_ref, ok_ref = core._build_factor(
                kern, x_pad, jnp.asarray(24, jnp.int32), 0.3, None, "gram",
                backend, block=8 if backend == "streamed" else None,
            )
            assert bool(ok_ref)
            np.testing.assert_allclose(
                np.asarray(state.l), np.asarray(l_ref), atol=1e-12
            )
            np.testing.assert_allclose(
                np.asarray(state.x), np.asarray(x_pad), atol=0
            )
            np.testing.assert_allclose(
                np.asarray(state.resid), np.asarray(r_pad), atol=0
            )


def test_fused_constructor_falls_back_to_eager_on_compile_failure(monkeypatch):
    """At frontier sizes the fused construction program can exceed what
    the compile stack accepts (n=80k bf16: HBM overflow at compile) —
    make_state must fall back to the eager composition, memoized per
    configuration, and produce an identical state."""
    from friedrich_tpu.models import gp as core

    rng = np.random.default_rng(3)
    x = jnp.asarray(rng.normal(size=(24, 2)))
    y = jnp.sin(x[:, 0])
    kern = fk.SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0))
    want, ok_w = None, None
    calls = {"n": 0}

    def boom(*a, **k):
        calls["n"] += 1
        raise RuntimeError("RESOURCE_EXHAUSTED: Ran out of memory")

    monkeypatch.setattr(core, "_FUSED_CONSTRUCT_UNAVAILABLE", set())
    want, ok_w = core.make_state(kern, fp.ZeroPrior(), 0.3, x, y,
                                 backend="streamed", block=8)
    monkeypatch.setattr(core, "_make_state_fused_streamed", boom)
    import warnings as w

    with pytest.warns(RuntimeWarning, match="falling back"):
        got, ok_g = core.make_state(kern, fp.ZeroPrior(), 0.3, x, y,
                                    backend="streamed", block=8)
    assert bool(ok_g) and bool(ok_w)
    np.testing.assert_array_equal(np.asarray(got.l), np.asarray(want.l))
    # memoized: the second construction does not re-attempt the compile
    with w.catch_warnings():
        w.simplefilter("error")  # no new warning
        got2, _ = core.make_state(kern, fp.ZeroPrior(), 0.3, x, y,
                                  backend="streamed", block=8)
    assert calls["n"] == 1
    np.testing.assert_array_equal(np.asarray(got2.l), np.asarray(want.l))

    # unrelated errors still propagate
    def boom2(*a, **k):
        raise RuntimeError("something else")

    monkeypatch.setattr(core, "_make_state_fused_streamed", boom2)
    monkeypatch.setattr(core, "_FUSED_CONSTRUCT_UNAVAILABLE", set())
    with pytest.raises(RuntimeError, match="something else"):
        core.make_state(kern, fp.ZeroPrior(), 0.3, x, y,
                        backend="streamed", block=8)
