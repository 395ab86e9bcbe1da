"""Large-n hyperparameter fitting strategies (round-3 features).

The reference's fit (``optimizer.rs:211-283``) pays a full O(n^3)
factorization per ADAM iteration. At TPU scale three strategies apply,
in increasing speed:

1. full fit, streamed Hutchinson gradients (``gradient="hutchinson"``,
   the automatic choice above capacity 8192) — reference semantics,
   every iteration still rebuilds at full n;
2. subsampled fit (``subsample=``): hyperparameters fitted on a random
   subset, ONE final full-n factorization — measured both faster and
   better-LML at n=50k (BASELINE.md);
3. and, orthogonally, the right MXU precision: the heuristic
   lengthscale makes K densely correlated, which the TPU's default
   single-pass bf16 matmul mode cannot factor at n >= 10k —
   ``set_factor_precision("f32")`` is the designed remedy
   (COMPAT.md round-3 note).

Run on CPU (small n for a quick demo) or TPU (raise N):

    python examples/large_scale_fit.py
"""

import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from friedrich_tpu.config import honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu must actually pin cpu

import friedrich_tpu as ft
from friedrich_tpu import kernels
from friedrich_tpu.utils.fitlog import FitLog

# FRIEDRICH_EXAMPLE_N overrides the demo size (CI smokes use a tiny n)
N, D = int(os.environ.get("FRIEDRICH_EXAMPLE_N", 3000)), 4

rng = np.random.default_rng(0)
x = rng.normal(size=(N, D)).astype(np.float32)
y = (np.sin(2.0 * x[:, 0]) + 0.5 * np.cos(x[:, 1])
     + 0.3 * rng.normal(size=N)).astype(np.float32)

gp = (
    ft.GaussianProcessBuilder(x, y)
    .set_kernel(kernels.SquaredExp(ls=2.0, ampl=1.0))
    .set_noise(0.3)
    .set_dtype("float32")
    .set_backend("streamed")
    # on TPU at n >= 10k with a heuristic lengthscale, add:
    # .set_factor_precision("f32")
    .train()
)
print(f"initial LML: {gp.log_marginal_likelihood():.1f}")

# strategy 2: subsampled fit — O(s^3) iterations + one full rebuild
log = FitLog()
gp.fit_parameters(
    fit_prior=True, fit_kernel=True, max_iter=40, subsample=1000,
    fit_log=log,
)
print(f"subsampled fit: {len(log.records)} iterations, "
      f"LML now {gp.log_marginal_likelihood():.1f}, "
      f"ls={float(gp.kernel.get_params()[0]):.3f}, "
      f"noise={gp.noise:.3f}")

# strategy 1: full streamed-Hutchinson fit (reference iteration shape)
gp2 = (
    ft.GaussianProcessBuilder(x, y)
    .set_kernel(kernels.SquaredExp(ls=2.0, ampl=1.0))
    .set_noise(0.3)
    .set_dtype("float32")
    .set_backend("streamed")
    .train()
)
gp2.fit_parameters(
    fit_prior=True, fit_kernel=True, max_iter=40, gradient="hutchinson"
)
print(f"full Hutchinson fit: LML {gp2.log_marginal_likelihood():.1f}, "
      f"ls={float(gp2.kernel.get_params()[0]):.3f}, "
      f"noise={gp2.noise:.3f}")

# both models predict through the cached-weights fast path
xq = rng.normal(size=(5, D)).astype(np.float32)
print("predictions:", np.round(np.asarray(gp.predict(xq)), 3))

# round 4: the builder's train() applies strategy 2 AUTOMATICALLY above
# n=24,576 (sub-fit-first: hyperparameters on a max(8192, n/5) subset,
# prior on the full data, then exactly ONE full-n factorization at the
# fitted values — 3.85 s at n=50k on one v5e through this exact call):
gp3 = (
    ft.GaussianProcessBuilder(x, y)
    .set_noise(0.3)
    .set_dtype("float32")
    .set_backend("streamed")
    # .set_factor_precision("f32")   # the large-n remedy, see above
    # .set_fit_subsample(None)       # opt OUT: reference full fit
    .fit_kernel()
    .fit_prior()
    .train()
)
print(f"builder auto policy: LML {gp3.log_marginal_likelihood():.1f} "
      f"(full fit at this n; sub-fit-first above n=24,576)")
