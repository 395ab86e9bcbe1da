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
        num_leapfrog=12,
    )
    stats = summary(res.samples)
    mean = np.asarray(stats["mean"])  # log [ls, ampl, noise]
    assert np.all(np.isfinite(mean))
    assert np.asarray(res.accept_prob).mean() > 0.4
    # ls and noise are well-identified on this data; 2x tolerance in log-space
    assert abs(mean[0] - np.log(true_ls)) < np.log(2.5)
    assert abs(mean[2] - np.log(true_noise)) < np.log(2.5)
