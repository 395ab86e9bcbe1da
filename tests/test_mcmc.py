"""MCMC correctness: HMC recovers known Gaussian targets; GP hyperparameter
posteriors are finite, well-mixed, and concentrate near the true values on
synthetic data."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.mcmc import (
    ess,
    make_hyperparam_logprob,
    initial_theta,
    rhat,
    sample_hmc,
    sample_hyperparameters,
    summary,
)

RNG = np.random.default_rng(11)


def test_hmc_recovers_correlated_gaussian():
    cov = jnp.asarray([[2.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ prec @ x

    res = sample_hmc(
        logp,
        jnp.zeros(2),
        jax.random.PRNGKey(0),
        num_warmup=500,
        num_samples=2000,
        num_chains=4,
        num_leapfrog=8,
    )
    draws = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(axis=0), [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.3)
    assert np.asarray(res.accept_prob).mean() > 0.5
    r = np.asarray(rhat(res.samples))
    assert np.all(r < 1.1)


def test_hyperparam_logprob_finite_and_differentiable():
    x = RNG.normal(size=(12, 2))
    y = np.sin(x[:, 0]) + 0.1 * RNG.normal(size=12)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.2, None, x, y, capacity=16
    )
    logp = make_hyperparam_logprob(gp.state)
    theta0 = initial_theta(gp.state)
    v = logp(theta0)
    g = jax.grad(logp)(theta0)
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))
    # the exact-LML part matches the state's lml at theta0
    from friedrich_tpu.models.gp import log_marginal_likelihood

    hyper = -0.5 * float(jnp.sum((theta0 / 5.0) ** 2))
    np.testing.assert_allclose(
        float(v), float(log_marginal_likelihood(gp.state)) + hyper, rtol=1e-8
    )


def test_gp_hyperparameter_posterior_recovers_scale():
    # data generated from a known GP: posterior should concentrate near truth
    n = 40
    x = np.sort(RNG.uniform(-3, 3, size=(n, 1)), axis=0)
    true_ls, true_ampl, true_noise = 1.0, 2.0, 0.15
    d = np.abs(x - x.T)
    k = true_ampl * np.exp(-(d**2) / (2 * true_ls**2)) + true_noise**2 * np.eye(n)
    y = np.linalg.cholesky(k) @ RNG.normal(size=n)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None, x, y
    )
    res = sample_hyperparameters(
        gp,
        jax.random.PRNGKey(1),
        num_warmup=300,
        num_samples=400,
        num_chains=2,
        sampler="hmc",
        num_leapfrog=12,
    )
    stats = summary(res.samples)
    mean = np.asarray(stats["mean"])  # log [ls, ampl, noise]
    assert np.all(np.isfinite(mean))
    assert np.asarray(res.accept_prob).mean() > 0.4
    # ls and noise are well-identified on this data; 2x tolerance in log-space
    assert abs(mean[0] - np.log(true_ls)) < np.log(2.5)
    assert abs(mean[2] - np.log(true_noise)) < np.log(2.5)


def test_nuts_recovers_correlated_gaussian():
    from friedrich_tpu.mcmc import sample_nuts

    cov = jnp.asarray([[2.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ prec @ x

    res = sample_nuts(
        logp,
        jnp.zeros(2),
        jax.random.PRNGKey(0),
        num_warmup=500,
        num_samples=2000,
        num_chains=4,
        max_depth=8,
    )
    draws = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(axis=0), [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.35)
    assert float(np.mean(np.asarray(res.divergent))) < 0.05
    assert np.all(np.asarray(rhat(res.samples)) < 1.1)
    # adaptation hit a sensible step size and tree depth
    assert 0.1 < float(res.step_size) < 5.0
    assert float(np.mean(np.asarray(res.tree_depth))) >= 1.0


def test_nuts_gp_hyperparameters():
    n = 30
    x = np.sort(RNG.uniform(-3, 3, size=(n, 1)), axis=0)
    d = np.abs(x - x.T)
    k = 2.0 * np.exp(-(d**2) / 2.0) + 0.15**2 * np.eye(n)
    y = np.linalg.cholesky(k) @ RNG.normal(size=n)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None, x, y
    )
    res = sample_hyperparameters(
        gp,
        jax.random.PRNGKey(2),
        num_warmup=200,
        num_samples=200,
        num_chains=2,
        sampler="nuts",
        max_depth=6,
    )
    assert np.all(np.isfinite(np.asarray(res.samples)))
    assert float(np.mean(np.asarray(res.divergent))) < 0.2
    mean = np.asarray(res.samples).reshape(-1, 3).mean(axis=0)
    # log-lengthscale near log(1.0)=0 within a generous band
    assert abs(mean[0]) < 1.5


def test_sharded_nuts_on_chain_mesh():
    if len(jax.devices()) < 8:
        pytest.skip("needs 8 virtual devices")
    from friedrich_tpu.mcmc.sharded import sample_nuts_sharded
    from friedrich_tpu.parallel.mesh import make_chain_mesh

    cov = jnp.asarray([[2.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ prec @ x

    mesh = make_chain_mesh(8)
    res = sample_nuts_sharded(
        mesh, logp, jnp.zeros(2), jax.random.PRNGKey(0),
        num_chains=8, num_warmup=400, num_samples=800, max_depth=7,
    )
    assert res.samples.shape == (800, 8, 2)
    draws = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(axis=0), [0.0, 0.0], atol=0.2)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.4)
    assert np.all(np.asarray(rhat(res.samples)) < 1.1)
    # pooled adaptation produced one global step size
    assert float(res.step_size) > 0


def test_fitlog_and_summary_table():
    from friedrich_tpu.utils.fitlog import FitLog, mcmc_summary_table
    from friedrich_tpu.models.optimizer import fit_kernel_noise

    x = RNG.normal(size=(10, 1))
    y = np.sin(x[:, 0])
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.2, None, x, y
    )
    log = FitLog()
    fit_kernel_noise(gp.state, max_iter=4, convergence_fraction=1e-12, fit_log=log)
    assert len(log) == 4
    assert all(np.isfinite(r.noise) for r in log.records)
    # every FitRecord field is populated (scaled path: scale is real)
    for r in log.records:
        assert np.isfinite(r.max_delta)
        assert np.isfinite(r.likelihood)
        assert r.scale is not None and np.isfinite(r.scale)
    # the per-iteration likelihood is the exact LML of the updated state
    from friedrich_tpu.models.gp import log_marginal_likelihood
    from friedrich_tpu.models.optimizer import fit_kernel_noise as fkn

    final = fkn(gp.state, max_iter=4, convergence_fraction=1e-12)
    assert abs(log.records[-1].likelihood - float(log_marginal_likelihood(final))) < 1e-8

    # generic path: scale is None, the rest populated
    gp2 = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.RationalQuadratic(alpha=1.0, ls=1.0), 0.2, None, x, y
    )
    log2 = FitLog()
    fit_kernel_noise(gp2.state, max_iter=2, convergence_fraction=1e-12, fit_log=log2)
    assert all(r.scale is None for r in log2.records)
    assert all(np.isfinite(r.max_delta) and np.isfinite(r.likelihood) for r in log2.records)

    samples = jnp.asarray(RNG.normal(size=(50, 4, 2)))
    table = mcmc_summary_table(samples)
    assert "rhat" in table and "ess" in table


def test_nuts_anisotropic_gaussian_5d():
    """Second NUTS validation target: strongly anisotropic 5-d Gaussian
    (condition number 1e4 before mass adaptation)."""
    from friedrich_tpu.mcmc import sample_nuts

    scales = jnp.asarray([0.01, 0.1, 1.0, 3.0, 10.0])

    def logp(x):
        return -0.5 * jnp.sum((x / scales) ** 2)

    res = sample_nuts(
        logp, jnp.zeros(5), jax.random.PRNGKey(3),
        num_warmup=800, num_samples=1500, num_chains=4, max_depth=9,
    )
    draws = np.asarray(res.samples).reshape(-1, 5)
    std = draws.std(axis=0)
    # mass adaptation must recover the per-dimension scales
    np.testing.assert_allclose(std, np.asarray(scales), rtol=0.25)
    np.testing.assert_allclose(draws.mean(axis=0) / np.asarray(scales),
                               np.zeros(5), atol=0.2)
    assert np.all(np.asarray(rhat(res.samples)) < 1.1)


def test_predictive_mixture_marginalizes_sensibly():
    from friedrich_tpu.mcmc import predictive_mixture, sample_predictive

    n = 25
    x = np.sort(RNG.uniform(-3, 3, size=(n, 1)), axis=0)
    d = np.abs(x - x.T)
    k = 2.0 * np.exp(-(d**2) / 2.0) + 0.2**2 * np.eye(n)
    y = np.linalg.cholesky(k) @ RNG.normal(size=n)
    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None, x, y
    )
    res = sample_hyperparameters(
        gp, jax.random.PRNGKey(5), num_warmup=150, num_samples=150,
        num_chains=2, sampler="nuts", max_depth=6,
    )
    xq = jnp.asarray(np.linspace(-2.5, 2.5, 7)[:, None])
    mix_mean, mix_var = predictive_mixture(gp.state, res.samples, xq, max_draws=16)
    assert np.all(np.isfinite(np.asarray(mix_mean)))
    assert np.all(np.asarray(mix_var) > 0)
    # mixture must dominate the per-draw conditional variance at the
    # posterior-mean hyperparameters (law of total variance)
    theta_mean = jnp.mean(res.samples.reshape(-1, 3), axis=0)
    m_pm, v_pm = predictive_mixture(
        gp.state, theta_mean[None, :], xq, max_draws=1
    )
    assert float(jnp.mean(mix_var)) >= 0.8 * float(jnp.mean(v_pm))
    # mixture mean close to the posterior-mean plug-in on identified data
    assert float(jnp.max(jnp.abs(mix_mean - m_pm))) < 1.0

    draws = sample_predictive(gp.state, res.samples, xq, jax.random.PRNGKey(6),
                              num_draws=64)
    assert draws.shape == (64, 7)
    # empirical draw moments track the mixture moments
    np.testing.assert_allclose(
        np.asarray(draws.mean(axis=0)), np.asarray(mix_mean), atol=0.8
    )

    # the memory-bounding chunk size must not change the result — including
    # chunks that do not divide the draw count, and chunk > draws
    for cs in (1, 3, 16, 64):
        m_c, v_c = predictive_mixture(
            gp.state, res.samples, xq, max_draws=16, chunk_size=cs
        )
        np.testing.assert_allclose(np.asarray(m_c), np.asarray(mix_mean), atol=1e-10)
        np.testing.assert_allclose(np.asarray(v_c), np.asarray(mix_var), atol=1e-10)
    draws_c = sample_predictive(
        gp.state, res.samples, xq, jax.random.PRNGKey(6), num_draws=64,
        chunk_size=7,
    )
    np.testing.assert_allclose(np.asarray(draws_c), np.asarray(draws), atol=1e-10)


def test_ess_collapses_for_unmixed_chains():
    """Regression for the var+ normalization: chains stuck in different
    modes must yield tiny ESS, not ~s*c."""
    rng = np.random.default_rng(0)
    s, c = 400, 4
    offsets = np.array([-10.0, -3.0, 3.0, 10.0])
    draws = rng.normal(size=(s, c, 1)) * 0.5 + offsets[None, :, None]
    samples = jnp.asarray(draws)
    e = float(ess(samples)[0])
    r = float(rhat(samples)[0])
    assert r > 2.0  # definitely unmixed
    assert e < 50  # far below s*c = 1600
    # well-mixed iid chains: ESS near the sample count
    good = jnp.asarray(rng.normal(size=(s, c, 1)))
    assert float(ess(good)[0]) > 0.5 * s * c


def test_nuts_chain_batch_matches_shapes_and_mixes():
    """chain_batch runs the chains in sequential program launches
    (the TPU-runtime vmap-width ceiling, BASELINE.md round 3): the
    batched result must carry all chains, mix like the unbatched run,
    and expose per-batch adaptation with a leading batch axis."""
    from friedrich_tpu.mcmc import sample_nuts

    cov = jnp.asarray([[2.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ prec @ x

    res = sample_nuts(
        logp,
        jnp.zeros(2),
        jax.random.PRNGKey(0),
        num_warmup=400,
        num_samples=1500,
        num_chains=8,
        chain_batch=4,
        max_depth=8,
    )
    assert res.samples.shape == (1500, 8, 2)
    assert res.accept_prob.shape == (1500, 8)
    # per-batch adaptation: leading batch axis of size 2
    assert res.step_size.shape == (2,)
    assert res.inv_mass.shape == (2, 2)
    draws = np.asarray(res.samples).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(axis=0), [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.35)
    assert np.all(np.asarray(rhat(res.samples)) < 1.1)

    # resume with the saved per-batch adaptation (warmup skipped)
    res2 = sample_nuts(
        logp,
        res.samples[-1],
        jax.random.PRNGKey(1),
        num_samples=200,
        num_chains=8,
        chain_batch=4,
        step_size=res.step_size,
        inv_mass=res.inv_mass,
    )
    assert res2.samples.shape == (200, 8, 2)
    assert bool(jnp.all(jnp.isfinite(res2.samples)))


def test_nuts_chain_batch_must_divide():
    from friedrich_tpu.mcmc import sample_nuts

    with pytest.raises(ValueError, match="chain_batch"):
        sample_nuts(
            lambda x: -0.5 * x @ x,
            jnp.zeros(2),
            jax.random.PRNGKey(0),
            num_warmup=10,
            num_samples=10,
            num_chains=6,
            chain_batch=4,
        )


def test_nuts_batched_resume_shape_validation():
    """Batched adaptation rows are consumed positionally; a resume whose
    batch count disagrees with the saved arrays' leading axis must be
    rejected, as must batched arrays on an unbatched run (ADVICE r3)."""
    from friedrich_tpu.mcmc import sample_nuts

    logp = lambda x: -0.5 * x @ x
    key = jax.random.PRNGKey(0)
    theta = jnp.zeros((8, 2))
    ss = jnp.asarray([0.5, 0.6])          # 2 batches worth
    im = jnp.ones((2, 2))

    # wrong batch count: 8 chains / batch 2 = 4 batches != 2 rows
    with pytest.raises(ValueError, match="batched step_size"):
        sample_nuts(logp, theta, key, num_samples=5, num_chains=8,
                    chain_batch=2, step_size=ss, inv_mass=im)
    with pytest.raises(ValueError, match="batched inv_mass"):
        sample_nuts(logp, theta, key, num_samples=5, num_chains=8,
                    chain_batch=2, step_size=jnp.asarray([0.5] * 4),
                    inv_mass=im)
    # batched arrays without chain_batch
    with pytest.raises(ValueError, match="unbatched"):
        sample_nuts(logp, theta, key, num_samples=5, num_chains=8,
                    step_size=ss, inv_mass=im)
    # correct pairing still works
    res = sample_nuts(logp, theta, key, num_samples=5, num_chains=8,
                      chain_batch=4, step_size=ss, inv_mass=im)
    assert res.samples.shape == (5, 8, 2)


def test_hmc_batched_resume_shape_validation():
    """sample_hmc shares sample_nuts' adaptation-batch validation (ADVICE
    r4 medium: JAX's clamped indexing would otherwise silently recycle
    the last batch's step size/mass on a mismatched resume)."""
    from friedrich_tpu.mcmc import sample_hmc

    logp = lambda x: -0.5 * x @ x
    key = jax.random.PRNGKey(0)
    theta = jnp.zeros((8, 2))
    ss = jnp.asarray([0.5, 0.6])          # 2 batches worth
    im = jnp.ones((2, 2))

    with pytest.raises(ValueError, match="batched step_size"):
        sample_hmc(logp, theta, key, num_samples=5, num_chains=8,
                   chain_batch=2, step_size=ss, inv_mass=im)
    with pytest.raises(ValueError, match="batched inv_mass"):
        sample_hmc(logp, theta, key, num_samples=5, num_chains=8,
                   chain_batch=2, step_size=jnp.asarray([0.5] * 4),
                   inv_mass=im)
    # batched arrays passed to an unbatched run
    with pytest.raises(ValueError, match="unbatched"):
        sample_hmc(logp, theta, key, num_samples=5, num_chains=8,
                   step_size=ss, inv_mass=im)
    res = sample_hmc(logp, theta, key, num_samples=5, num_chains=8,
                     num_leapfrog=2, chain_batch=4, step_size=ss,
                     inv_mass=im)
    assert res.samples.shape == (5, 8, 2)


def test_fit_sync_every_validated():
    """sync_every < 1 must raise a clear configuration error up front,
    not a ZeroDivisionError mid-fit (ADVICE r4)."""
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu.models import gp as core
    from friedrich_tpu.models.optimizer import fit_kernel_noise

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(16, 2)))
    y = jnp.sin(x[:, 0])
    kern = fk.SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0))
    state, _ = core.make_state(kern, fp.ZeroPrior(), jnp.asarray(0.2), x, y)
    for bad in (0, -3):
        with pytest.raises(ValueError, match="sync_every"):
            fit_kernel_noise(state, max_iter=2, sync_every=bad)


def test_auto_chain_batch_envelope_policy(monkeypatch):
    """sample_nuts auto-batches above the measured TPU envelope: the
    density factories stamp their GP size on the function, and on an
    accelerator backend a request exceeding chains x n <=
    TPU_CHAIN_ENVELOPE splits into the largest fitting divisor."""
    from friedrich_tpu.mcmc import make_hyperparam_logprob
    from friedrich_tpu.mcmc.nuts import _auto_chain_batch
    from friedrich_tpu.models import gp as core
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(48, 2)))
    y = jnp.sin(x[:, 0])
    kern = fk.SquaredExp(ls=jnp.asarray(1.0), ampl=jnp.asarray(1.0))
    state, _ = core.make_state(kern, fp.ZeroPrior(), jnp.asarray(0.2), x, y)
    for backend in ("dense", "streamed"):
        logp = make_hyperparam_logprob(state, backend=backend)
        assert getattr(logp, "gp_n", None) == state.capacity
    logp_prec = make_hyperparam_logprob(state, backend="dense",
                                        precision="f32")
    assert logp_prec.gp_n == state.capacity

    # CPU backend: never auto-batch
    assert _auto_chain_batch(logp_prec, 64) is None

    # simulate an accelerator backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    logp = make_hyperparam_logprob(state, backend="dense")
    logp.gp_n = 4096
    # envelope 32768: limit = 8 chains per program at n=4096
    assert _auto_chain_batch(logp, 16) == 8
    assert _auto_chain_batch(logp, 8) is None      # inside envelope
    assert _auto_chain_batch(logp, 12) == 6        # largest divisor <= 8
    logp.gp_n = 16384
    assert _auto_chain_batch(logp, 16) == 2        # limit = 2
    logp.gp_n = 65536
    assert _auto_chain_batch(logp, 7) == 1         # limit = 1, prime chains
    # densities without the stamp (user-supplied logp): no auto-batching
    assert _auto_chain_batch(lambda t: -t @ t, 64) is None

    # end-to-end: auto-batching engages (2 batches) and returns per-batch
    # adaptation with a leading batch axis
    from friedrich_tpu.mcmc import sample_nuts

    toy = lambda t: -0.5 * t @ t
    toy.gp_n = 32768  # limit = 1 chain per program
    res = sample_nuts(toy, jnp.zeros(2), jax.random.PRNGKey(0),
                      num_warmup=15, num_samples=10, num_chains=2)
    assert res.samples.shape == (10, 2, 2)
    assert res.step_size.shape == (2,)


def test_hmc_chain_batch_matches_shapes_and_mixes(monkeypatch):
    """HMC chain batching (same envelope semantics as NUTS): all chains
    delivered, per-batch adaptation stacked, moments correct."""
    from friedrich_tpu.mcmc import sample_hmc

    cov = jnp.asarray([[1.5, 0.6], [0.6, 0.9]])
    prec = jnp.linalg.inv(cov)

    def logp(x):
        return -0.5 * x @ prec @ x

    res = sample_hmc(
        logp, jnp.zeros(2), jax.random.PRNGKey(0),
        num_warmup=300, num_samples=1200, num_chains=8, chain_batch=4,
    )
    assert res.samples.shape == (1200, 8, 2)
    assert res.step_size.shape == (2,)
    assert res.inv_mass.shape == (2, 2)
    assert res.final_logp.shape == (8,)
    draws = np.asarray(res.samples[200:]).reshape(-1, 2)
    np.testing.assert_allclose(draws.mean(axis=0), [0.0, 0.0], atol=0.15)
    np.testing.assert_allclose(np.cov(draws.T), np.asarray(cov), atol=0.35)

    # auto-envelope: a stamped density above the envelope batches HMC too
    # (simulate an accelerator backend — auto never batches on CPU)
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    toy = lambda t: -0.5 * t @ t
    toy.gp_n = 32768
    res2 = sample_hmc(toy, jnp.zeros(2), jax.random.PRNGKey(1),
                      num_warmup=10, num_samples=5, num_chains=2)
    assert res2.samples.shape == (5, 2, 2)
    assert res2.step_size.shape == (2,)


def test_scan_segmentation_is_exact():
    """Segmented warmup+sampling scans (the TPU long-program mitigation)
    must reproduce the single-scan run EXACTLY — same keys, same math,
    just shorter device programs."""
    from friedrich_tpu.mcmc import sample_hmc, sample_nuts

    cov = jnp.asarray([[2.0, 0.9], [0.9, 1.0]])
    prec = jnp.linalg.inv(cov)
    logp = lambda x: -0.5 * x @ prec @ x

    for seg in (7, 25):
        a = sample_nuts(logp, jnp.zeros(2), jax.random.PRNGKey(0),
                        num_warmup=40, num_samples=30, num_chains=3,
                        scan_segment=0)
        b = sample_nuts(logp, jnp.zeros(2), jax.random.PRNGKey(0),
                        num_warmup=40, num_samples=30, num_chains=3,
                        scan_segment=seg)
        np.testing.assert_array_equal(np.asarray(a.samples),
                                      np.asarray(b.samples))
        np.testing.assert_array_equal(np.asarray(a.step_size),
                                      np.asarray(b.step_size))
        np.testing.assert_array_equal(np.asarray(a.tree_depth),
                                      np.asarray(b.tree_depth))

    a = sample_hmc(logp, jnp.zeros(2), jax.random.PRNGKey(2),
                   num_warmup=40, num_samples=30, num_chains=3,
                   scan_segment=0)
    b = sample_hmc(logp, jnp.zeros(2), jax.random.PRNGKey(2),
                   num_warmup=40, num_samples=30, num_chains=3,
                   scan_segment=9)
    np.testing.assert_array_equal(np.asarray(a.samples),
                                  np.asarray(b.samples))
    np.testing.assert_array_equal(np.asarray(a.final_logp),
                                  np.asarray(b.final_logp))


def test_auto_scan_segment_policy(monkeypatch):
    from friedrich_tpu.mcmc.nuts import MAX_SCAN_SEGMENT, _auto_scan_segment

    toy = lambda t: -t @ t
    assert _auto_scan_segment(toy, 4) is None       # unstamped density
    toy.gp_n = 4096
    assert _auto_scan_segment(toy, 4) is None       # CPU backend
    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert _auto_scan_segment(toy, 4) == MAX_SCAN_SEGMENT
    # width x length x n^3 stays inside the measured work budget
    assert _auto_scan_segment(toy, 8) == 20   # the 8x20 measured-good point
    toy.gp_n = 8192
    assert _auto_scan_segment(toy, 4) == 5
    toy.gp_n = 16384
    assert _auto_scan_segment(toy, 2) == 1    # floor: one transition/program
