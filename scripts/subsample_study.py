"""Subsample-fit sensitivity study (BASELINE.md; VERDICT round-3 #6).

The auto-subsample policy (``models/optimizer.auto_subsample``: full fit
below n=24,576, else fit hyperparameters on a ``max(8192, n // 5)``
random subset + ONE full-n factorization) replaces the reference's
per-iteration O(n^3) rebuild (``optimizer.rs:267-270``) at scale. This
script measures what that policy rests on: the scatter of the fitted
hyperparameters (ls, ampl, noise), the full-data LML of the resulting
model, and held-out RMSE across subset sizes x seeds, against the full
fit as reference.

Each row: sub-fit on ``s`` points (f32 6-pass precision — the measured
remedy for heuristic-init covariances), then ONE full-n build at the
fitted parameters, full-n exact LML, and an m-point posterior-mean RMSE
vs the noiseless generating function. Progressive JSON lines.

Run on the chip:
    python scripts/subsample_study.py --n 50000 --sizes 5000 10000 20000 \
        --seeds 0 1 2 --include-full
CPU smoke:
    JAX_PLATFORMS=cpu python scripts/subsample_study.py --n 2048 \
        --sizes 256 512 --seeds 0 1 --m 512
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
    p.add_argument("--sizes", type=int, nargs="+",
                   default=[5000, 10000, 20000])
    p.add_argument("--seeds", type=int, nargs="+", default=[0, 1, 2])
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--include-full", action="store_true",
                   help="also run the full fit as the reference row "
                        "(hutchinson path; slow at n=50k)")
    args = p.parse_args(argv)

    import jax.numpy as jnp

    import friedrich_tpu as ft
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu import config as ftconfig

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
        """ONE full-n factorization at the given hyperparameters +
        quality metrics (full exact LML, held-out RMSE)."""
        with ftconfig.matmul_precision("f32"):
            gp = ft.GaussianProcess.new(
                prior, kernel, noise, None, x, y, backend="streamed"
            )
            mean, _ = gp.predict_in_batches(xq, batch_size=m)
            lml = float(gp.log_marginal_likelihood())
        rmse = float(np.sqrt(np.mean((np.asarray(mean) - fq_true) ** 2)))
        del gp
        return lml, rmse

    for s in args.sizes:
        for seed in args.seeds:
            try:
                idx = np.asarray(jax.random.permutation(
                    jax.random.PRNGKey(seed), n)[:s])
                t0 = time.perf_counter()
                with ftconfig.matmul_precision("f32"):
                    sub = ft.GaussianProcess.new(
                        prior, kern0, args.noise, None, x[idx], y[idx],
                        backend="auto",
                    )
                    sub.fit_parameters(
                        fit_prior=False, fit_kernel=True,
                        max_iter=args.max_iter, convergence_fraction=0.05,
                    )
                t_fit = time.perf_counter() - t0
                params = [float(v) for v in sub.kernel.get_params()]
                noise_f = float(sub.noise)
                kern_f = sub.kernel
                del sub
                lml, rmse = full_model(kern_f, noise_f)
                emit(exp="subsample_study", n=n, s=s, seed=seed,
                     ls=round(params[0], 4), ampl=round(params[1], 4),
                     noise=round(noise_f, 4), full_lml=round(lml, 1),
                     rmse=round(rmse, 4), sub_fit_s=round(t_fit, 2))
            except Exception as e:  # noqa: BLE001
                emit(exp="subsample_study", n=n, s=s, seed=seed,
                     error=str(e)[:300])

    if args.include_full:
        try:
            t0 = time.perf_counter()
            with ftconfig.matmul_precision("f32"):
                gp = ft.GaussianProcess.new(
                    prior, kern0, args.noise, None, x, y, backend="streamed"
                )
                gp.fit_parameters(
                    fit_prior=False, fit_kernel=True,
                    max_iter=args.max_iter, convergence_fraction=0.05,
                )
            t_fit = time.perf_counter() - t0
            params = [float(v) for v in gp.kernel.get_params()]
            noise_f = float(gp.noise)
            kern_f = gp.kernel
            del gp
            lml, rmse = full_model(kern_f, noise_f)
            emit(exp="subsample_study", n=n, s=n, seed=None,
                 ls=round(params[0], 4), ampl=round(params[1], 4),
                 noise=round(noise_f, 4), full_lml=round(lml, 1),
                 rmse=round(rmse, 4), sub_fit_s=round(t_fit, 2),
                 note="full fit (reference row)")
        except Exception as e:  # noqa: BLE001
            emit(exp="subsample_study", n=n, s=n, error=str(e)[:300])


if __name__ == "__main__":
    main()
