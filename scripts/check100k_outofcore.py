"""n=100k out-of-core exact-GP factorization on the real chip.

The factor (bf16, 20 GB) lives in host RAM; column panels stream over
the host link (ROADMAP #2). On this environment the link is an axon
TUNNEL (~0.09 GB/s up, ~0.015 GB/s down measured round 3), so the
wall-clock is LINK-bound and quoted as such — on a real PCIe host the
same byte counts take ~seconds (see BASELINE.md). Prints progressive
JSON so a partial run still yields data; ends with the ok flag and a
prediction sanity check through the streamed host solves.
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

from friedrich_tpu.config import enable_compile_cache, honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu smoke runs (CI / no chip)
enable_compile_cache()

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.outofcore import (
    outofcore_cholesky_factor,
    outofcore_solve_lower,
)


def main(n=100_000, d=8, block=8192, m=256):
    # capacity = next multiple of block
    cap = -(-n // block) * block
    rng = np.random.default_rng(0)
    x = np.zeros((cap, d), np.float32)
    x[:n] = rng.normal(size=(n, d)).astype(np.float32)
    y = np.zeros((cap,), np.float32)
    y[:n] = (
        np.sin(x[:n, 0]) + 2.5 * rng.normal(size=n)
    ).astype(np.float32)
    kern = fk.SquaredExp(ls=jnp.float32(0.5), ampl=jnp.float32(1.0))
    noise = 2.5  # bf16-storage envelope at n=100k: noise^2 > ~3.1
    print(json.dumps({"exp": "oc100k", "stage": "start", "n": n,
                      "cap": cap, "block": block}), flush=True)
    t0 = time.perf_counter()
    l_host, ok = outofcore_cholesky_factor(
        kern, jnp.asarray(x), n, noise, block=block, storage="bf16"
    )
    t_factor = time.perf_counter() - t0
    print(json.dumps({
        "exp": "oc100k", "stage": "factored", "ok": bool(ok),
        "factor_s": round(t_factor, 1),
        "factor_gb": round(l_host.nbytes / 2**30, 1),
        "caveat": "tunnel-bound wall-clock (~0.09/0.015 GB/s link)",
    }), flush=True)
    assert ok, "out-of-core n=100k factorization reported ok=False"

    # prediction sanity through the streamed host solves: mean+variance
    # at m held-out points, plus training-point correlation
    from friedrich_tpu.ops.covariance import (
        cross_covariance_train_padded, kernel_diag,
    )

    xq = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)
    c = np.asarray(cross_covariance_train_padded(
        kern, jnp.asarray(x), n, xq
    ))
    t0 = time.perf_counter()
    kl = np.asarray(outofcore_solve_lower(l_host, jnp.asarray(c)))
    beta = np.asarray(outofcore_solve_lower(
        l_host, jnp.asarray(y[:, None])
    ))[:, 0]
    t_solve = time.perf_counter() - t0
    mean = kl.T @ beta
    var = np.asarray(kernel_diag(kern, xq)) - np.sum(kl * kl, axis=0)
    assert np.all(np.isfinite(mean)) and np.all(np.isfinite(var))
    assert np.all(var >= -1e-2) and np.all(var <= 1.0 + 1e-2)
    print(json.dumps({
        "exp": "oc100k", "stage": "predict_ok", "m": m,
        "solve_s": round(t_solve, 1),
        "var_range": [float(var.min()), float(var.max())],
    }), flush=True)


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=100_000)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--block", type=int, default=8192)
    p.add_argument("--m", type=int, default=256)
    a = p.parse_args()
    main(a.n, a.d, a.block, a.m)
