"""Out-of-core exact GP: one chip, factor bigger than its HBM.

``OutOfCoreGP`` keeps the (n, n) Cholesky factor in HOST RAM and streams
column panels to the device — the exact-GP size ceiling of a single chip
becomes host memory (125 GB here: n~170k f32, ~240k with the bf16 factor
storage), not the 16 GB HBM. The device only ever holds one working
strip plus one column chunk.

What each call costs over the host link (the PCIe slot on real
hardware):

- training factorization: ~n^3 * 2/B factor bytes (~200 GB at n=100k,
  B=4096, f32 — ~4 s at PCIe-gen4 rates, alongside ~7 s of MXU compute);
- FIRST predict: two streamed sweeps to cache beta/alpha (2 n^2 bytes);
- every further MEAN-ONLY predict: ZERO factor traffic — one device
  strip build + GEMM against the cached K^-1 r;
- mean+variance: one streamed sweep per batch (n^2 bytes).

Run: ``python examples/outofcore_gp.py [n]`` (defaults to a size that
runs in seconds on CPU; crank n up on a machine with a real device).
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from friedrich_tpu.config import honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu must actually pin cpu

import jax.numpy as jnp
import numpy as np

from friedrich_tpu import kernels, priors
from friedrich_tpu.models import OutOfCoreGP


def main(n: int = 4096, d: int = 6, m: int = 512, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = np.sin(x.sum(axis=1)).astype(np.float32)
    xq = rng.normal(size=(m, d)).astype(np.float32)

    t0 = time.perf_counter()
    gp = OutOfCoreGP(
        kernels.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0)),
        priors.ZeroPrior(),
        noise=0.5,  # bf16-era regularization: see the BASELINE envelope
        x=x,
        y=y,
        block=min(4096, n // 4),
    )
    print(f"factor (host RAM, {gp.l_host.nbytes/1e9:.2f} GB): "
          f"{time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    mean = np.asarray(gp.predict(xq))  # caches beta/alpha (two sweeps)
    print(f"first predict (derives weights): {time.perf_counter()-t0:.2f}s")

    t0 = time.perf_counter()
    mean2 = np.asarray(gp.predict(xq))  # sweep-free: L never touched
    print(f"steady-state mean-only predict:  {time.perf_counter()-t0:.2f}s")
    assert np.allclose(mean, mean2)

    t0 = time.perf_counter()
    m_v, v_v = gp.predict_mean_variance(xq)  # one streamed sweep
    print(f"mean+variance (1 streamed sweep): {time.perf_counter()-t0:.2f}s")
    print(f"mean[:3]={np.asarray(m_v)[:3].round(3)} "
          f"var[:3]={np.asarray(v_v)[:3].round(3)}")
    print(f"log marginal likelihood: {gp.log_marginal_likelihood():.2f}")

    # incremental data: rebuilds (an out-of-core rank-update would stream
    # the whole factor anyway)
    x2 = rng.normal(size=(64, d)).astype(np.float32)
    y2 = np.sin(x2.sum(axis=1)).astype(np.float32)
    t0 = time.perf_counter()
    gp.add_samples(x2, y2)
    print(f"add_samples (rebuild): {time.perf_counter()-t0:.2f}s, "
          f"n={gp.n}")


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 4096)
