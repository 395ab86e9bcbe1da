"""TPU measurement batch 3: Pallas covariance @16k, NUTS throughput,
predict @50k with m=4096. Each experiment isolated with try/except; JSON
lines progressive."""

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


def pallas_and_predict():
    import friedrich_tpu.kernels as fk
    from friedrich_tpu.ops.covariance import (
        cross_covariance_train_padded,
        kernel_diag,
        train_covariance_padded,
    )
    from friedrich_tpu.ops.pallas.covariance_pallas import train_covariance_pallas

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    kern = fk.SquaredExp(ls=jnp.asarray(0.5, f32), ampl=jnp.asarray(1.0, f32))
    noise = jnp.asarray(1.0, f32)

    n = 16384
    x = jnp.asarray(rng.normal(size=(n, 8)), f32)
    f_xla = jax.jit(lambda x: train_covariance_padded(kern, x, n, noise))
    t_xla = timeit(f_xla, x)
    emit(exp="cov_build_xla", n=n, seconds=round(t_xla, 4))
    try:
        f_pal = jax.jit(lambda x: train_covariance_pallas(kern, x, n, noise))
        t_pal = timeit(f_pal, x)
        err = float(jnp.max(jnp.abs(f_pal(x) - f_xla(x))))
        emit(exp="cov_build_pallas", n=n, seconds=round(t_pal, 4), max_err=err)
    except Exception as e:
        emit(exp="cov_build_pallas", error=str(e)[:300])
    del x

    # predict at 50k with modest m (memory-safe)
    try:
        from friedrich_tpu.ops.streamed import streamed_cholesky_factor

        n = 50000
        x = jnp.asarray(rng.normal(size=(n, 8)), f32)
        l_mat, _ = jax.jit(
            lambda x: streamed_cholesky_factor(kern, x, n, noise, block=2048)
        )(x)
        m = 4096
        xq = jnp.asarray(rng.normal(size=(m, 8)), f32)
        resid = jnp.asarray(rng.normal(size=(n,)), f32)

        @jax.jit
        def predict(l_mat, x, resid, xq):
            from jax.scipy.linalg import solve_triangular

            c = cross_covariance_train_padded(kern, x, n, xq)
            kl = solve_triangular(l_mat, c, lower=True)
            w = solve_triangular(l_mat, kl, lower=True, trans=1)
            return w.T @ resid, kernel_diag(kern, xq) - jnp.sum(kl * kl, axis=0)

        t = timeit(predict, l_mat, x, resid, xq, r=2)
        emit(exp="predict_mean_var", n=n, m=m, seconds=round(t, 4),
             points_per_sec=round(m / t))
    except Exception as e:
        emit(exp="predict50k", error=str(e)[:200])


def nuts():
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu.mcmc import make_hyperparam_logprob, initial_theta
    from friedrich_tpu.mcmc.nuts import sample_nuts
    from friedrich_tpu.models import gp as core

    rng = np.random.default_rng(0)
    f32 = jnp.float32
    ngp = 1024
    xg = jnp.asarray(rng.normal(size=(ngp, 4)), f32)
    yg = jnp.sin(xg[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=(ngp,)), f32)
    kern = fk.SquaredExp(ls=jnp.asarray(1.0, f32), ampl=jnp.asarray(1.0, f32))
    state, _ = core.make_state(kern, fp.ZeroPrior(), jnp.asarray(0.2, f32), xg, yg)
    logp = make_hyperparam_logprob(state)
    theta0 = initial_theta(state)
    warm, num, chains = 100, 100, 4

    def run(key):
        return sample_nuts(logp, theta0, key, num_warmup=warm,
                           num_samples=num, num_chains=chains, max_depth=6)

    res = run(jax.random.PRNGKey(0))
    jax.block_until_ready(res.samples)
    t1 = time.perf_counter()
    res = run(jax.random.PRNGKey(1))
    jax.block_until_ready(res.samples)
    t_run = time.perf_counter() - t1
    emit(exp="nuts_gp", n=ngp, chains=chains,
         transitions=chains * (warm + num), run_seconds=round(t_run, 3),
         transitions_per_sec=round(chains * (warm + num) / t_run, 1),
         mean_depth=round(float(jnp.mean(res.tree_depth)), 2),
         div_rate=round(float(jnp.mean(res.divergent)), 4),
         leapfrogs_per_sec=round(
             chains * (warm + num) * float(jnp.mean(2.0 ** res.tree_depth)) / t_run
         ))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "all"
    if which in ("all", "pallas"):
        try:
            pallas_and_predict()
        except Exception as e:
            emit(exp="pallas_block", error=str(e)[:300])
    if which in ("all", "nuts"):
        try:
            nuts()
        except Exception as e:
            emit(exp="nuts_gp", error=str(e)[:300])
