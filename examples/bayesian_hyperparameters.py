"""Fully-Bayesian GP: NUTS over hyperparameters + marginalized prediction.

The reference fits a single point estimate of the kernel parameters
(multiplicative ADAM, ``optimizer.rs``). This library adds the full
posterior: chain-parallel NUTS on the exact log-marginal-likelihood
surface, convergence diagnostics (R-hat, ESS), and a predictive mixture
that marginalizes predictions over the hyperparameter draws — which
widens the error bars honestly where the data cannot pin the
lengthscale down.

On a multi-chip mesh the same API shards chains across devices
(``mcmc.sharded``) or shards the *factorization inside each density
evaluation* for models beyond one chip's memory
(``mcmc.sample_hyperparameters_distributed``).

Run: ``python examples/bayesian_hyperparameters.py``
"""

from __future__ import annotations

import os
import sys
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from friedrich_tpu.config import honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu must actually pin cpu (env alone is unreliable under plugin sitecustomize)
import numpy as np

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu import mcmc


def main(n: int = 60, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.uniform(-3.0, 3.0, size=(n, 1)).astype(np.float32)
    y = (np.sin(2.0 * x[:, 0]) + 0.3 * rng.normal(size=n)).astype(np.float32)

    gp = ft.GaussianProcess.new(
        fp.ZeroPrior(), fk.SquaredExp(ls=1.0, ampl=1.0), 0.3, None, x, y
    )
    print(f"point-estimate LML: {gp.log_marginal_likelihood():.3f}")

    # posterior over log([ls, ampl, noise]) — 4 chains, pooled warmup
    res = mcmc.sample_hyperparameters(
        gp,
        jax.random.PRNGKey(seed),
        num_warmup=200,
        num_samples=300,
        num_chains=4,
    )
    stats = mcmc.summary(res.samples)
    names = ["log ls", "log ampl", "log noise"]
    for i, name in enumerate(names):
        print(
            f"{name:>10}: mean={stats['mean'][i]:+.3f} "
            f"sd={stats['std'][i]:.3f} rhat={stats['rhat'][i]:.3f} "
            f"ess={stats['ess'][i]:.0f}"
        )

    # marginalized prediction: mixture over (up to) 32 posterior draws
    xq = np.linspace(-4.0, 4.0, 9, dtype=np.float32)[:, None]
    mix_mean, mix_var = mcmc.predictive_mixture(
        gp.state, res.samples, xq, max_draws=32
    )
    pt_mean, pt_var = gp.predict_mean_variance(xq)
    for i in (0, 4, 8):
        print(
            f"x={xq[i, 0]:+.1f}: point {pt_mean[i]:+.3f}±"
            f"{np.sqrt(pt_var[i]):.3f}  marginal {mix_mean[i]:+.3f}±"
            f"{np.sqrt(mix_var[i]):.3f}"
        )
    print("(marginal bars ≥ point bars: hyperparameter uncertainty included)")
    return res


if __name__ == "__main__":
    main()
