"""n=100k fit+predict through OutOfCoreGP on one chip (VERDICT r4 #2).

The closest this environment gets to BASELINE.json's "fit+predict at
n=100k in <60 s" (that target assumes a pod slice): the full builder-
equivalent training flow at the north-star size on ONE chip, with the
factor in host RAM (bf16, ~20 GB — 100k f32 in-HBM needs 40 GB > 16 GB):

1. heuristic init on the full data (jitted streamed heuristics,
   ``kernel.rs:94-119``);
2. prior fit on the full data (``prior.rs:93-98``);
3. kernel+noise sub-fit on a fixed-seed 10k subset via an in-HBM f32
   6-pass model (the builder's measured sub-fit-first policy,
   ``models/builder._train_subfit_first``);
4. ONE full-n out-of-core factorization at the fitted values
   (``OutOfCoreGP`` constructor; ok asserted — CholeskyError otherwise);
5. cached-weights predict at m held-out points + RMSE vs the noiseless
   generating function.

Wall-clock caveat: the chip is behind an axon TUNNEL (~0.09 GB/s up,
~0.015 GB/s down measured round 3); the out-of-core factorization
streams ~2 x cap^2 factor bytes over that link, so its wall-clock here
is LINK-bound — byte counts and the link rate are printed so the
PCIe-host estimate can be derived (BASELINE.md). CPU smoke:

    JAX_PLATFORMS=cpu python scripts/check100k_fit.py --n 2048 \
        --sub 256 --block 512 --m 256
"""
import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from friedrich_tpu.config import enable_compile_cache, honor_platform_env

honor_platform_env()
enable_compile_cache()


def emit(**kw):
    print(json.dumps(kw), flush=True)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--sub", type=int, default=10_000)
    p.add_argument("--block", type=int, default=8192)
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--noise", type=float, default=2.5,
                   help="true noise std; bf16-storage envelope at n=100k "
                        "needs noise^2 >~ n*2^-15 ~ 3.1")
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--storage", default="bf16", choices=["bf16", "none"])
    args = p.parse_args(argv)

    import friedrich_tpu as ft
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu import config as ftconfig
    from friedrich_tpu.models.outofcore_gp import OutOfCoreGP

    n, d, m, sub = args.n, args.d, args.m, min(args.sub, args.n)
    storage = None if args.storage == "none" else args.storage
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    f_true = np.sin(2.5 * x[:, 0]) + 0.5 * np.cos(2.0 * x[:, 1])
    y = (f_true + args.noise * rng.normal(size=n)).astype(np.float32)
    xq = rng.normal(size=(m, d)).astype(np.float32)
    fq_true = np.sin(2.5 * xq[:, 0]) + 0.5 * np.cos(2.0 * xq[:, 1])
    emit(exp="fit100k", stage="start", n=n, sub=sub, block=args.block,
         storage=args.storage)

    t_total0 = time.perf_counter()
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    # 1-2: heuristic + prior on the FULL data
    t0 = time.perf_counter()
    kern0 = fk.Gaussian().heuristic_fit(xj, yj)
    prior = fp.ConstantPrior.default(d).fit(xj, yj)
    jax.block_until_ready(kern0.get_params())
    emit(exp="fit100k", stage="heuristic",
         seconds=round(time.perf_counter() - t0, 2),
         ls0=round(float(kern0.get_params()[0]), 3))

    # 3: kernel+noise sub-fit (in-HBM f32 6-pass model)
    t0 = time.perf_counter()
    idx = np.asarray(jax.random.permutation(jax.random.PRNGKey(0), n)[:sub])
    with ftconfig.matmul_precision("f32"):
        sub_gp = ft.GaussianProcess.new(
            prior, kern0, args.noise, None, x[idx], y[idx], backend="auto",
        )
        sub_gp.fit_parameters(
            fit_prior=False, fit_kernel=True, max_iter=args.max_iter,
            convergence_fraction=0.05,
        )
    kern_f = sub_gp.kernel
    noise_f = float(sub_gp.noise)
    params = [float(v) for v in kern_f.get_params()]
    del sub_gp
    emit(exp="fit100k", stage="sub_fit",
         seconds=round(time.perf_counter() - t0, 2),
         ls=round(params[0], 4), ampl=round(params[1], 4),
         noise=round(noise_f, 4))

    # 4: ONE full-n out-of-core factorization at the fitted values
    t0 = time.perf_counter()
    oc = OutOfCoreGP(
        kern_f, prior, noise_f, x, y, block=args.block, storage=storage,
    )  # raises CholeskyError if the factorization reports ok=False
    t_factor = time.perf_counter() - t0
    factor_gb = oc.l_host.nbytes / 2**30
    emit(exp="fit100k", stage="factored", ok=True,
         factor_s=round(t_factor, 1), factor_gb=round(factor_gb, 1),
         caveat="tunnel-bound wall-clock; ~2x factor bytes over a "
                "~0.09/0.015 GB/s link — PCIe-host estimate derives "
                "from the byte count")

    # 5: cached-weights predict + quality
    t0 = time.perf_counter()
    mean, var = oc.predict_in_batches(jnp.asarray(xq), batch_size=1024)
    jax.block_until_ready(mean)
    t_pred = time.perf_counter() - t0
    mean = np.asarray(mean)
    var = np.asarray(var)
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(var))
    assert np.all(var >= -1e-2), float(var.min())
    rmse = float(np.sqrt(np.mean((mean - fq_true) ** 2)))
    emit(exp="fit100k", stage="done", m=m,
         predict_s=round(t_pred, 2),
         pts_per_s=round(m / t_pred),
         rmse=round(rmse, 4),
         noise_floor=args.noise,
         var_range=[round(float(var.min()), 3), round(float(var.max()), 3)],
         total_s=round(time.perf_counter() - t_total0, 1))


if __name__ == "__main__":
    main()
