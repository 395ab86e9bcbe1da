"""TPU measurement batch for BASELINE.md. Appends JSON lines to stdout
progressively (one per experiment) so partial runs still yield data."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, r=3):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(r):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main():
    import friedrich_tpu.kernels as fk
    from friedrich_tpu.ops.cholesky import cholesky
    from friedrich_tpu.ops.covariance import (
        cross_covariance_train_padded,
        kernel_diag,
        train_covariance_padded,
    )
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    kern = fk.SquaredExp(ls=jnp.asarray(0.5, f32), ampl=jnp.asarray(1.0, f32))
    noise = jnp.asarray(1.0, f32)

    # --- streamed block sweep at 32k (vs dense XLA 0.53s baseline) ---
    n = 32768
    x = jnp.asarray(rng.normal(size=(n, 8)), f32)
    for blk in (1024, 2048, 4096):
        try:
            f = jax.jit(
                lambda x, b=blk: streamed_cholesky_factor(
                    kern, x, n, noise, block=b
                )[0]
            )
            t = timeit(f, x, r=2)
            emit(exp="streamed_chol", n=n, block=blk, seconds=round(t, 4))
        except Exception as e:
            emit(exp="streamed_chol", n=n, block=blk, error=str(e)[:200])
    del x

    # --- tiled in-place (MAC-optimal) at 32k ---
    from friedrich_tpu.ops.tiled import tiled_cholesky_factor

    n = 32768
    x = jnp.asarray(rng.normal(size=(n, 8)), f32)
    for blk in (2048, 4096):
        try:
            f = jax.jit(
                lambda x, b=blk: tiled_cholesky_factor(kern, x, n, noise, block=b)[0]
            )
            t = timeit(f, x, r=2)
            emit(exp="tiled_chol", n=n, block=blk, seconds=round(t, 4))
        except Exception as e:
            emit(exp="tiled_chol", n=n, block=blk, error=str(e)[:200])
    del x

    # --- n=50k: streamed build+factor + predict mean/var at m=10k ---
    n = 50000
    x = jnp.asarray(rng.normal(size=(n, 8)), f32)
    try:
        f = jax.jit(
            lambda x: streamed_cholesky_factor(kern, x, n, noise, block=2048)[0]
        )
        t = timeit(f, x, r=2)
        emit(exp="streamed_chol", n=n, block=2048, seconds=round(t, 4))
        try:
            f_t = jax.jit(
                lambda x: tiled_cholesky_factor(kern, x, n, noise, block=2500)[0]
            )
            t = timeit(f_t, x, r=2)
            emit(exp="tiled_chol", n=n, block=2500, seconds=round(t, 4))
        except Exception as e:
            emit(exp="tiled_chol", n=n, error=str(e)[:200])
        l_mat = f(x)

        m = 10000
        xq = jnp.asarray(rng.normal(size=(m, 8)), f32)

        @jax.jit
        def predict(l_mat, x, xq):
            from jax.scipy.linalg import cho_solve, solve_triangular

            c = cross_covariance_train_padded(kern, x, n, xq)
            kl = solve_triangular(l_mat, c, lower=True)
            w = solve_triangular(l_mat, kl, lower=True, trans=1)
            mean = w.T @ jnp.zeros((n,), f32)  # residuals shape only
            var = kernel_diag(kern, xq) - jnp.sum(kl * kl, axis=0)
            return mean, var

        t = timeit(predict, l_mat, x, xq, r=2)
        emit(exp="predict_mean_var", n=n, m=m, seconds=round(t, 4),
             points_per_sec=round(m / t))
        del l_mat
    except Exception as e:
        emit(exp="n50k", error=str(e)[:300])
    del x

    # --- Pallas vs XLA covariance build at 16k ---
    n = 16384
    x = jnp.asarray(rng.normal(size=(n, 8)), f32)
    try:
        f_xla = jax.jit(lambda x: train_covariance_padded(kern, x, n, noise))
        t_xla = timeit(f_xla, x)
        emit(exp="cov_build_xla", n=n, seconds=round(t_xla, 4))
    except Exception as e:
        emit(exp="cov_build_xla", error=str(e)[:200])
    try:
        from friedrich_tpu.ops.pallas.covariance_pallas import (
            train_covariance_pallas,
        )

        f_pal = jax.jit(lambda x: train_covariance_pallas(kern, x, n, noise))
        t_pal = timeit(f_pal, x)
        err = float(jnp.max(jnp.abs(f_pal(x) - f_xla(x))))
        emit(exp="cov_build_pallas", n=n, seconds=round(t_pal, 4),
             max_err_vs_xla=err)
    except Exception as e:
        emit(exp="cov_build_pallas", error=str(e)[:300])
    del x

    # --- NUTS samples/s per chip on a GP hyperparameter posterior ---
    try:
        import friedrich_tpu.priors as fp
        from friedrich_tpu.mcmc import make_hyperparam_logprob, initial_theta
        from friedrich_tpu.mcmc.nuts import sample_nuts
        from friedrich_tpu.models import gp as core

        ngp = 1024
        xg = jnp.asarray(rng.normal(size=(ngp, 4)), f32)
        yg = jnp.sin(xg[:, 0]) + 0.1 * jnp.asarray(
            rng.normal(size=(ngp,)), f32
        )
        kern_g = fk.SquaredExp(ls=jnp.asarray(1.0, f32), ampl=jnp.asarray(1.0, f32))
        state, _ = core.make_state(
            kern_g, fp.ZeroPrior(), jnp.asarray(0.2, f32), xg, yg
        )
        logp = make_hyperparam_logprob(state)
        theta0 = initial_theta(state)
        num_samples = 100
        warm = 100

        def run(key):
            return sample_nuts(
                logp, theta0, key, num_warmup=warm, num_samples=num_samples,
                num_chains=4, max_depth=6,
            ).samples

        t0 = time.perf_counter()
        out = run(jax.random.PRNGKey(0))
        jax.block_until_ready(out)
        t_total = time.perf_counter() - t0
        t1 = time.perf_counter()
        out = run(jax.random.PRNGKey(1))
        jax.block_until_ready(out)
        t_run = time.perf_counter() - t1
        sps = 4 * num_samples / (t_run * num_samples / (num_samples + warm))
        emit(exp="nuts_gp", n=ngp, chains=4, warmup=warm,
             samples=num_samples, total_first=round(t_total, 2),
             run_seconds=round(t_run, 3),
             samples_per_sec=round(4 * (num_samples + warm) / t_run, 1))
    except Exception as e:
        emit(exp="nuts_gp", error=str(e)[:300])


if __name__ == "__main__":
    main()
