"""Exact-LML (optax) fit vs the replicated multiplicative ADAM
(VERDICT round-4 item #3).

The round-4 sensitivity study showed the replicated ADAM's convergence
rule (``optimizer.rs:120-121``) early-stops on an inflated-amplitude
optimum for the full fit and s=20k sub-fits (LML ~ -76k at n=50k) while
s in {5k, 10k} escape (~ -74.7k). This script measures the designed
remedies on the SAME data distribution as the round-4 study:

- ``adam``    : the replicated multiplicative ADAM (the current default)
- ``map``     : exact-LML optax Adam from the heuristic init
              (``models/map_fit.fit_map``)
- ``polish``  : replicated ADAM, then a short exact-LML corrective pass
              from its endpoint (``models/map_fit.polish_map``)

per subset size, reporting warm wall-clock of the sub-fit stage, the
FULL-data exact LML after one full-n factorization at the fitted
parameters, fitted (ls, ampl, noise), and held-out RMSE vs the noiseless
generating function.

Chip:
    python scripts/mapfit_study.py --n 50000 --sizes 10000 20000
    python scripts/mapfit_study.py --n 10000 --sizes 10000   # full-data
CPU smoke:
    JAX_PLATFORMS=cpu python scripts/mapfit_study.py --n 1024 \
        --sizes 256 --m 256 --max-iter 10 --map-steps 30
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import numpy as np

from friedrich_tpu.config import enable_compile_cache, honor_platform_env

honor_platform_env()
enable_compile_cache()


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=50_000)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--noise", type=float, default=1.0)
    p.add_argument("--sizes", type=int, nargs="+", default=[10000, 20000])
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--map-steps", type=int, default=150)
    p.add_argument("--polish-steps", type=int, default=40)
    p.add_argument("--lr", type=float, default=0.05)
    p.add_argument("--strategies", nargs="+",
                   default=["adam", "map", "polish"],
                   choices=["adam", "map", "polish"])
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import friedrich_tpu as ft
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu import config as ftconfig
    from friedrich_tpu.models.map_fit import fit_map, polish_map

    rng = np.random.default_rng(0)
    n, d, m = args.n, args.d, args.m
    x = rng.normal(size=(n, d)).astype(np.float32)
    f_true = np.sin(2.5 * x[:, 0]) + 0.5 * np.cos(2.0 * x[:, 1])
    y = (f_true + args.noise * rng.normal(size=n)).astype(np.float32)
    xq = rng.normal(size=(m, d)).astype(np.float32)
    fq_true = np.sin(2.5 * xq[:, 0]) + 0.5 * np.cos(2.0 * xq[:, 1])

    xj = jnp.asarray(x)
    yj = jnp.asarray(y)
    kern0 = fk.Gaussian().heuristic_fit(xj, yj)
    prior = fp.ConstantPrior.default(d).fit(xj, yj)

    def full_model(kernel, noise):
        with ftconfig.matmul_precision("f32"):
            gp = ft.GaussianProcess.new(
                prior, kernel, noise, None, x, y, backend="streamed"
            )
            mean, _ = gp.predict_in_batches(xq, batch_size=min(m, 4096))
            lml = float(gp.log_marginal_likelihood())
        rmse = float(np.sqrt(np.mean((np.asarray(mean) - fq_true) ** 2)))
        del gp
        return lml, rmse

    def run_strategy(strategy, s):
        idx = np.asarray(jax.random.permutation(
            jax.random.PRNGKey(args.seed), n)[:s])
        xs, ys = (x, y) if s >= n else (x[idx], y[idx])
        with ftconfig.matmul_precision("f32"):
            sub = ft.GaussianProcess.new(
                prior, kern0, args.noise, None, xs, ys, backend="auto",
            )
            t0 = time.perf_counter()
            if strategy in ("adam", "polish"):
                sub.fit_parameters(
                    fit_prior=False, fit_kernel=True,
                    max_iter=args.max_iter, convergence_fraction=0.05,
                )
            state = sub._state
            if strategy == "map":
                state = fit_map(
                    state, num_steps=args.map_steps,
                    learning_rate=args.lr, precision="f32",
                )
            elif strategy == "polish":
                state = polish_map(
                    state, num_steps=args.polish_steps,
                    learning_rate=args.lr, precision="f32",
                )
            t_fit = time.perf_counter() - t0
        params = [float(v) for v in state.kernel.get_params()]
        noise_f = float(state.noise)
        kern_f = state.kernel
        del sub, state
        lml, rmse = full_model(kern_f, noise_f)
        emit(exp="mapfit_study", n=n, s=s, strategy=strategy,
             ls=round(params[0], 4), ampl=round(params[1], 4),
             noise=round(noise_f, 4), full_lml=round(lml, 1),
             rmse=round(rmse, 4), sub_fit_s=round(t_fit, 2))

    for s in args.sizes:
        for strategy in args.strategies:
            try:
                run_strategy(strategy, s)
            except Exception as e:  # noqa: BLE001
                emit(exp="mapfit_study", n=n, s=s, strategy=strategy,
                     error=str(e)[:300])


if __name__ == "__main__":
    main()
