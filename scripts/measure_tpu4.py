"""TPU batch 4: GEMM roofline probe (f32 vs bf16) and NUTS chain scaling."""

from __future__ import annotations

import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(f, *a, r=5):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(r):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


def gemm_roofline():
    n = 8192
    rng = np.random.default_rng(0)
    for dtype, name in ((jnp.float32, "f32"), (jnp.bfloat16, "bf16")):
        a = jnp.asarray(rng.normal(size=(n, n)), dtype)
        b = jnp.asarray(rng.normal(size=(n, n)), dtype)
        f = jax.jit(lambda a, b: jnp.dot(a, b, preferred_element_type=jnp.float32))
        t = timeit(f, a, b)
        tflops = 2 * n**3 / t / 1e12
        emit(exp="gemm", dtype=name, n=n, seconds=round(t, 5),
             tflops=round(tflops, 1))


def nuts_chains():
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
    for chains in (16, 64):
        warm, num = 50, 50

        def run(key, c=chains):
            return sample_nuts(logp, theta0, key, num_warmup=warm,
                               num_samples=num, num_chains=c, max_depth=6)

        res = run(jax.random.PRNGKey(0))
        jax.block_until_ready(res.samples)
        t1 = time.perf_counter()
        res = run(jax.random.PRNGKey(1))
        jax.block_until_ready(res.samples)
        t_run = time.perf_counter() - t1
        emit(exp="nuts_chain_scaling", n=ngp, chains=chains,
             run_seconds=round(t_run, 2),
             transitions_per_sec=round(chains * (warm + num) / t_run, 1))


if __name__ == "__main__":
    try:
        gemm_roofline()
    except Exception as e:
        emit(exp="gemm", error=str(e)[:200])
    try:
        nuts_chains()
    except Exception as e:
        emit(exp="nuts_chain_scaling", error=str(e)[:200])
