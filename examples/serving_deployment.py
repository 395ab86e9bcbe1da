"""Model serving: export a trained GP and query it over the wire.

Two deployment modes share one length-prefixed binary protocol:

1. ``GPServer`` — the native C++ daemon (``native/friedrich_served.cpp``)
   loads an exported ``.frsv`` bundle (factor + residual weights +
   kernel/prior spec) and answers posterior mean/variance queries with
   f64 BLAS-free triangular solves. No Python, no JAX, no TPU at serve
   time: suited to CPU-only inference boxes.

2. ``AcceleratedGPServer`` — serves the *live* JAX model (single-chip
   ``GaussianProcess`` or distributed ``LargeScaleGP``) on the same
   protocol, so throughput-critical deployments answer from the TPU's
   batched solve paths while clients stay unchanged.

``GPClient`` talks to either.

Run: ``python examples/serving_deployment.py``
"""

from __future__ import annotations

import os
import sys
import tempfile
from pathlib import Path

os.environ["JAX_PLATFORMS"] = "cpu"

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from friedrich_tpu.config import honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu must actually pin cpu

import numpy as np

import friedrich_tpu as ft

# f64 in-process so the comparison against the daemon's f64 solves is
# exact-ish; serve f32 models the same way (expect ~1e-3 level spread
# from the precision difference, growing with n and conditioning).
ft.config.enable_x64()
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu import serving


def main(n: int = 200, d: int = 3, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * rng.normal(size=n)

    gp = ft.GaussianProcess.new(
        fp.ConstantPrior.default(1),
        fk.Matern2(ls=1.0, ampl=1.0),
        0.2,
        None,
        x,
        y,
    )
    xq = rng.normal(size=(16, d))
    want = np.asarray(gp.predict(xq))

    # --- mode 1: standalone C++ daemon from an exported bundle ---------
    with tempfile.TemporaryDirectory() as tmp:
        bundle = Path(tmp) / "model.frsv"
        serving.export_bundle(gp, bundle)
        print(f"bundle: {bundle.stat().st_size / 1024:.1f} KiB")
        with serving.GPServer(bundle) as srv:
            with serving.GPClient(port=srv.port) as client:
                mean, var = client.predict_mean_variance(xq)
        print(
            f"C++ daemon:  max |served - in-process| = "
            f"{np.abs(mean - want).max():.2e}"
        )

    # --- mode 2: TPU/JAX-backed server, same client ---------------------
    with serving.AcceleratedGPServer(gp) as srv:
        with serving.GPClient(port=srv.port) as client:
            mean2, var2 = client.predict_mean_variance(xq)
    print(
        f"accelerated: max |served - in-process| = "
        f"{np.abs(mean2 - want).max():.2e}"
    )
    return mean, mean2


if __name__ == "__main__":
    main()
