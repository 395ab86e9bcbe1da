"""n=80k fit+predict THROUGH THE PUBLIC API on one chip (round 4).

Round 3 demonstrated n=80k build+factor+predict with a hand-rolled
two-sweep predict and no fit. This script runs the actual north-star op
end to end at the single-chip frontier size, entirely through the
public surface (``builder.rs:189-214`` is the reference slot):

- bf16 factor STORAGE (12.8 GB factor in HBM; f32 storage caps at
  n~60k on a 16 GB chip),
- sub-fit-first subsampled hyperparameter fit (the builder's
  ``set_fit_subsample`` flow: heuristic init on the full data, prior
  fitted on the full outputs, kernel+noise fitted on a fixed-seed
  subset via an f32 sub-model with the "f32" precision remedy, then
  exactly ONE full-n bf16-storage factorization at the fitted
  parameters — the heuristic-lengthscale covariance at n=80k is outside
  the bf16 storage envelope, so the reference's build-first order could
  not even start),
- cached-weights predict (``models/gp.py::derive_weights`` — one sweep
  per mean+variance batch; the round-3 demo hand-rolled two sweeps).

Asserts the factorization ok flag (the facade raises CholeskyError
otherwise), prediction sanity, and reports honest wall-clocks: first
train (compile-heavy over the remote tunnel) and second train
(execution-only), plus steady-state predict throughput.

Smoke mode (CI / CPU): ``python scripts/check80k.py --n 2048
--subsample 512 --m 512`` exercises the identical code path at toy
shapes so the script cannot bit-rot between hardware sessions.
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

honor_platform_env()  # JAX_PLATFORMS=cpu smoke runs (CI / no chip)
enable_compile_cache()


def main(n=80_000, d=8, m=4096, subsample=10_000, noise=2.0,
         storage="bf16", max_iter=100, skip_second_train=False):
    import friedrich_tpu as ft

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    # short true lengthscale so the heuristic init is genuinely wrong and
    # the fit has real work (same data family as scripts/measure.py fit)
    f_true = np.sin(2.5 * x[:, 0]) + 0.5 * np.cos(2.0 * x[:, 1])
    y = (f_true + noise * rng.normal(size=n)).astype(np.float32)
    xq = rng.normal(size=(m, d)).astype(np.float32)
    fq_true = np.sin(2.5 * xq[:, 0]) + 0.5 * np.cos(2.0 * xq[:, 1])

    def build():
        b = (
            ft.GaussianProcessBuilder(x, y)
            .set_noise(noise)
            .set_dtype("float32")
            .set_backend("streamed")
        )
        if n >= 60_000:
            # the remote compile helper rejects the auto schedule's
            # cap/10 panels at this size (HTTP 500); 4000-wide panels
            # (auto solve/diag sub-blocking = 4) are the round-3-proven
            # n=80k schedule (BASELINE.md: 1.408 s build+factor)
            b = b.set_panel_block(4000)
        if storage != "none":
            b = b.set_factor_storage(storage)
        return (
            b.set_fit_subsample(subsample)
            .set_fit_parameters(max_iter, 0.05)
            .fit_kernel()
            .fit_prior()
            .train()
        )

    t0 = time.perf_counter()
    gp = build()  # raises CholeskyError if any factorization fails
    t_first = time.perf_counter() - t0

    # predict through the facade: first call derives the cached weights
    # (beta/alpha solves) and compiles. At the 12.8 GB-factor frontier a
    # 4096-wide sweep program exceeds HBM (measured: +1.16 GB over) —
    # 1024-point chunks keep the strip buffers inside it.
    bsz = min(m, 1024 if n >= 60_000 else m)
    mean, var = gp.predict_in_batches(xq, batch_size=bsz)
    jax.block_until_ready((mean, var))
    t0 = time.perf_counter()
    mean, var = gp.predict_in_batches(xq, batch_size=bsz)
    jax.block_until_ready((mean, var))
    t_predict = time.perf_counter() - t0
    mean, var = np.asarray(mean), np.asarray(var)

    # sanity: finite, latent variance within [0, prior variance], RMSE at
    # the aleatoric floor, training-point means aligned with the targets
    ampl = float(np.abs(np.asarray(gp.kernel.get_params())[-1]))
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(var))
    assert np.all(var >= -1e-3) and np.all(var <= ampl + 1e-3), (
        f"variance out of range: [{var.min()}, {var.max()}] vs prior {ampl}"
    )
    rmse = float(np.sqrt(np.mean((mean - fq_true) ** 2)))
    mean_t = np.asarray(gp.predict(x[:512]))
    corr = float(np.corrcoef(mean_t, y[:512])[0, 1])
    assert corr > 0.1, f"training-point mean decorrelated: {corr}"

    t_second = None
    if not skip_second_train:
        del gp  # only ONE big factor fits in HBM — drop before retraining
        t0 = time.perf_counter()
        gp = build()
        t_second = time.perf_counter() - t0

    print(json.dumps({
        "exp": "check80k", "n": n, "d": d, "storage": storage,
        "subsample": subsample, "noise": noise, "ok": True,
        "first_train_s": round(t_first, 3),
        "train_s": round(t_second, 3) if t_second is not None else None,
        "predict_m": m, "predict_s": round(t_predict, 4),
        "predict_pts_per_s": round(m / t_predict),
        "kernel_params": [float(v) for v in gp.kernel.get_params()],
        "noise_fitted": gp.noise,
        "rmse_vs_truth": round(rmse, 4),
        "train_corr": round(corr, 4),
        "budget_s": round(60.0 * (n / 100_000) ** 3, 2),
    }))


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=80_000)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--subsample", type=int, default=10_000)
    p.add_argument("--noise", type=float, default=2.0)
    p.add_argument("--storage", default="bf16", choices=["bf16", "none"])
    p.add_argument("--max-iter", type=int, default=100)
    p.add_argument("--skip-second-train", action="store_true")
    a = p.parse_args()
    main(a.n, a.d, a.m, a.subsample, a.noise, a.storage, a.max_iter,
         a.skip_second_train)
