"""Independent-oracle grounding: cross-validate the standard GP math against
scikit-learn (a third-party implementation NOT authored in this repo).

Round-1 parity was proven only against two oracles written by this repo's
author (``tests/oracle.py`` and ``native/friedrich_native.cpp``) — both
transcriptions of the same reading of the reference. A shared misreading
would pass those tests. scikit-learn's ``gaussian_process`` module is an
independent implementation of the *standard* formulas, so wherever the
reference implements textbook math (RBF/Matérn/RationalQuadratic/Linear
kernels, posterior mean/variance/covariance, exact log marginal
likelihood), agreement with sklearn grounds the transcription in ground
truth that no shared misreading can fake.

The reference's deliberate quirks (Exponential's ``2*ls^2`` denominator
``kernel.rs:663-665``, Matern2's ls-gradient ``kernel.rs:881-900``,
Multiquadric ``kernel.rs:1044-1058``, the approximate ``likelihood()``
``mod.rs:208-213``) have NO sklearn referent by construction; those are
pinned by the finite-difference quirk tests in ``test_gradcheck.py`` and
the transcription oracles.

Parameterization map (verified numerically here at ~1e-15):

  SquaredExp(ls, ampl)        == ConstantKernel(ampl) * RBF(ls)
  Matern1(ls, ampl)           == ConstantKernel(ampl) * Matern(ls, nu=1.5)
  Matern2(ls, ampl)           == ConstantKernel(ampl) * Matern(ls, nu=2.5)
  RationalQuadratic(alpha,ls) == sklearn RationalQuadratic(ls, alpha)
  Linear(c)                   == DotProduct(sigma_0=sqrt(c))
  GP(ZeroPrior, noise)        == GaussianProcessRegressor(alpha=noise^2)
  predict_variance            == sklearn predict(return_std=True)**2
                                  (both exclude observation noise)
  log_marginal_likelihood     == sklearn log_marginal_likelihood()
"""

import numpy as np
import jax.numpy as jnp
import pytest

sklearn_gp = pytest.importorskip("sklearn.gaussian_process")
from sklearn.gaussian_process import GaussianProcessRegressor
from sklearn.gaussian_process.kernels import (
    RBF,
    ConstantKernel,
    DotProduct,
    Matern,
)
from sklearn.gaussian_process.kernels import (
    RationalQuadratic as SkRationalQuadratic,
)

from friedrich_tpu.kernels import (
    Linear,
    Matern1,
    Matern2,
    RationalQuadratic,
    SquaredExp,
)
from friedrich_tpu.models.gp import (
    log_marginal_likelihood,
    make_state,
    posterior,
    predict_covariance,
    predict_mean,
    predict_mean_variance,
    predict_variance,
)
from friedrich_tpu.ops.covariance import cross_covariance
from friedrich_tpu.priors import ZeroPrior


def _pairs(seed, n=14, m=9, d=3):
    rng = np.random.default_rng(seed)
    return rng.normal(size=(n, d)), rng.normal(size=(m, d))


CASES = [
    # (ours, sklearn equivalent)
    (SquaredExp(ls=0.8, ampl=1.7), ConstantKernel(1.7) * RBF(0.8)),
    (SquaredExp(ls=2.5, ampl=0.3), ConstantKernel(0.3) * RBF(2.5)),
    (Matern1(ls=0.8, ampl=1.7), ConstantKernel(1.7) * Matern(0.8, nu=1.5)),
    (Matern2(ls=1.2, ampl=0.9), ConstantKernel(0.9) * Matern(1.2, nu=2.5)),
    (
        RationalQuadratic(alpha=1.3, ls=0.8),
        SkRationalQuadratic(length_scale=0.8, alpha=1.3),
    ),
    (Linear(c=0.9), DotProduct(sigma_0=np.sqrt(0.9))),
    # compositions: Sum/Prod combinators vs sklearn kernel algebra
    (
        SquaredExp(ls=0.8, ampl=1.7) + Matern1(ls=1.1, ampl=0.5),
        ConstantKernel(1.7) * RBF(0.8)
        + ConstantKernel(0.5) * Matern(1.1, nu=1.5),
    ),
    (
        SquaredExp(ls=0.8, ampl=1.7) * Linear(c=0.4),
        (ConstantKernel(1.7) * RBF(0.8)) * DotProduct(sigma_0=np.sqrt(0.4)),
    ),
]


@pytest.mark.parametrize("ours,theirs", CASES, ids=lambda k: type(k).__name__)
@pytest.mark.parametrize("method", ["direct", "gram"])
def test_kernel_matrix_matches_sklearn(ours, theirs, method):
    x1, x2 = _pairs(0)
    k_ours = np.asarray(
        cross_covariance(ours, jnp.asarray(x1), jnp.asarray(x2), method=method)
    )
    k_sk = theirs(x1, x2)
    tol = 1e-12 if method == "direct" else 1e-9  # gram identity rounding
    np.testing.assert_allclose(k_ours, k_sk, rtol=0, atol=tol)


@pytest.mark.parametrize("seed", [0, 1, 2])
@pytest.mark.parametrize(
    "kernel,sk_kernel",
    [
        (SquaredExp(ls=0.8, ampl=1.7), ConstantKernel(1.7) * RBF(0.8)),
        (
            Matern2(ls=1.2, ampl=0.9),
            ConstantKernel(0.9) * Matern(1.2, nu=2.5),
        ),
        (
            RationalQuadratic(alpha=1.3, ls=0.8),
            SkRationalQuadratic(length_scale=0.8, alpha=1.3),
        ),
    ],
    ids=["rbf", "matern52", "rq"],
)
def test_posterior_and_lml_match_sklearn(seed, kernel, sk_kernel):
    rng = np.random.default_rng(seed)
    n, m, d = 20, 11, 2 + seed
    x = rng.normal(size=(n, d))
    y = np.sin(x.sum(axis=1)) + 0.1 * rng.normal(size=n)
    xq = rng.normal(size=(m, d))
    noise = 0.3

    gpr = GaussianProcessRegressor(
        kernel=sk_kernel, alpha=noise**2, optimizer=None
    )
    gpr.fit(x, y)
    mu_sk, std_sk = gpr.predict(xq, return_std=True)
    _, cov_sk = gpr.predict(xq, return_cov=True)
    lml_sk = gpr.log_marginal_likelihood()

    state, ok = make_state(
        kernel, ZeroPrior(), noise, jnp.asarray(x), jnp.asarray(y),
        method="direct",
    )
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(predict_mean(state, jnp.asarray(xq))), mu_sk, atol=1e-10
    )
    # both variances are the LATENT predictive variance (no noise added)
    np.testing.assert_allclose(
        np.asarray(predict_variance(state, jnp.asarray(xq))),
        std_sk**2,
        atol=1e-10,
    )
    mean2, var2 = predict_mean_variance(state, jnp.asarray(xq))
    np.testing.assert_allclose(np.asarray(mean2), mu_sk, atol=1e-10)
    np.testing.assert_allclose(np.asarray(var2), std_sk**2, atol=1e-10)
    np.testing.assert_allclose(
        np.asarray(predict_covariance(state, jnp.asarray(xq))),
        cov_sk,
        atol=1e-10,
    )
    mean3, cov3 = posterior(state, jnp.asarray(xq))
    np.testing.assert_allclose(np.asarray(mean3), mu_sk, atol=1e-10)
    np.testing.assert_allclose(np.asarray(cov3), cov_sk, atol=1e-9)
    assert abs(float(log_marginal_likelihood(state)) - lml_sk) < 1e-10


def test_padded_capacity_matches_sklearn():
    """Capacity padding (the EMatrix analogue) must not perturb the math:
    a state with cap > n must still match sklearn exactly."""
    rng = np.random.default_rng(3)
    x = rng.normal(size=(10, 2))
    y = rng.normal(size=10)
    xq = rng.normal(size=(5, 2))
    noise = 0.25
    sk_kernel = ConstantKernel(1.4) * RBF(0.9)
    gpr = GaussianProcessRegressor(
        kernel=sk_kernel, alpha=noise**2, optimizer=None
    )
    gpr.fit(x, y)
    mu_sk, std_sk = gpr.predict(xq, return_std=True)

    state, ok = make_state(
        SquaredExp(ls=0.9, ampl=1.4), ZeroPrior(), noise,
        jnp.asarray(x), jnp.asarray(y), method="direct", cap=32,
    )
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(predict_mean(state, jnp.asarray(xq))), mu_sk, atol=1e-10
    )
    np.testing.assert_allclose(
        np.asarray(predict_variance(state, jnp.asarray(xq))),
        std_sk**2,
        atol=1e-10,
    )
    assert (
        abs(float(log_marginal_likelihood(state)) - gpr.log_marginal_likelihood())
        < 1e-10
    )


def test_lml_gradient_matches_sklearn():
    """The exact-LML hyperparameter gradients (the MCMC target's gradients,
    via autodiff) against sklearn's analytic ``log_marginal_likelihood``
    gradient. sklearn parameterizes theta = log([ampl, ls]); ours is
    log([ls, ampl, noise]) — map accordingly."""
    import jax

    rng = np.random.default_rng(4)
    x = rng.normal(size=(16, 2))
    y = np.sin(x.sum(axis=1))
    noise = 0.3
    ls, ampl = 0.8, 1.7

    sk_kernel = ConstantKernel(ampl) * RBF(ls)
    gpr = GaussianProcessRegressor(
        kernel=sk_kernel, alpha=noise**2, optimizer=None
    )
    gpr.fit(x, y)
    lml_sk, grad_sk = gpr.log_marginal_likelihood(
        theta=np.log([ampl, ls]), eval_gradient=True
    )  # d LML / d log([ampl, ls])

    from friedrich_tpu.mcmc.logprob import make_hyperparam_logprob

    state, _ = make_state(
        SquaredExp(ls=ls, ampl=ampl), ZeroPrior(), noise,
        jnp.asarray(x), jnp.asarray(y), method="direct",
    )
    # huge prior sigma -> the hyperprior term's gradient is negligible
    logp = make_hyperparam_logprob(state, prior_mu=0.0, prior_sigma=1e12)
    theta = jnp.log(jnp.asarray([ls, ampl, noise]))
    val, grad = jax.value_and_grad(logp)(theta)
    assert abs(float(val) - lml_sk) < 1e-8
    np.testing.assert_allclose(float(grad[0]), grad_sk[1], atol=1e-8)  # ls
    np.testing.assert_allclose(float(grad[1]), grad_sk[0], atol=1e-8)  # ampl
