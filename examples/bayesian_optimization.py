"""Bayesian optimization with friedrich-tpu.

The reference positions itself as "a building block for algorithms like
Bayesian optimization" (reference readme.md:7). This example is that
algorithm: expected-improvement BO over a 1-D test function, exercising
the incremental-update path (``add_samples``: O(n^2 k) Cholesky append per
acquisition, never a retrain) and periodic hyperparameter refits.

Run: ``python examples/bayesian_optimization.py``
"""

from __future__ import annotations

import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from friedrich_tpu.config import honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu must actually pin cpu (env alone is unreliable under plugin sitecustomize)
import jax.numpy as jnp
import numpy as np
from jax.scipy.stats import norm

import friedrich_tpu as ft
from friedrich_tpu import kernels, priors


def objective(x):
    """Multi-modal 1-D test function (global max ~0.976 at x~0.867)."""
    return np.sin(13.0 * x) * np.sin(27.0 * x) / 2.0 + 0.5


def expected_improvement(mean, var, best, xi=0.01):
    std = jnp.sqrt(jnp.maximum(var, 1e-12))
    z = (mean - best - xi) / std
    return (mean - best - xi) * norm.cdf(z) + std * norm.pdf(z)


def main(num_iters: int = 20, seed: int = 0) -> float:
    rng = np.random.default_rng(seed)
    # initial design
    x_obs = rng.uniform(0.0, 1.0, size=(4, 1))
    y_obs = objective(x_obs[:, 0])

    gp = (
        ft.GaussianProcess.builder(x_obs, y_obs)
        .set_kernel(kernels.Matern2())
        .set_prior(priors.ConstantPrior.default(1))
        .fit_kernel()
        .fit_prior()
        .set_fit_parameters(30, 0.05)
        .set_capacity(64)  # reserve room: appends stay recompile-free
        .train()
    )

    grid = np.linspace(0.0, 1.0, 501)[:, None]
    for i in range(num_iters):
        mean, var = gp.predict_mean_variance(jnp.asarray(grid))
        ei = expected_improvement(
            jnp.asarray(mean), jnp.asarray(var), float(np.max(y_obs))
        )
        x_next = grid[int(jnp.argmax(ei))]
        y_next = objective(x_next[0])
        gp.add_samples(x_next[None, :], np.asarray([y_next]))  # O(n^2) append
        x_obs = np.vstack([x_obs, x_next[None, :]])
        y_obs = np.append(y_obs, y_next)
        if (i + 1) % 5 == 0:
            gp.fit_parameters(True, True, max_iter=20)
        print(
            f"iter {i + 1:2d}: x={x_next[0]:.3f} y={y_next:+.4f} "
            f"best={np.max(y_obs):+.4f} n={gp.num_samples}"
        )

    best_x = x_obs[np.argmax(y_obs), 0]
    print(f"\nbest found: f({best_x:.4f}) = {np.max(y_obs):.4f}")
    return float(np.max(y_obs))


if __name__ == "__main__":
    main()
