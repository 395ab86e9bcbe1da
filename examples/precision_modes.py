"""MXU matmul precision modes: speed vs accuracy on TPU.

On TPU, every unannotated float32 matmul runs the MXU in its fastest
mode — operands rounded to bfloat16 per pass with float32 accumulation
(the JAX/XLA ambient default). That is what this library's headline
numbers are measured at, and for GP posterior means it is usually
plenty: the error the factorization commits is a tiny *backward* error
(the computed factor is the exact factor of K + E with |E| small
relative to the noise floor).

Users who need true-f32 products — e.g. tiny noise, highly
ill-conditioned K, or bitwise reproducibility studies — wrap model
construction and use in ``friedrich_tpu.config.matmul_precision``:

    with ft.config.matmul_precision("f32"):
        gp = ft.GaussianProcess.builder(x, y).train()
        mean = gp.predict(q)

Modes (measured ladder in BASELINE.md "Matmul precision on TPU"):

    "bf16"   1 MXU pass  — the ambient default, fastest
    "f32x3"  3 passes    — bf16x3 compensation, near-f32 (~1.8x cost)
    "f32"    6 passes    — true f32 products (~3x cost)

This example trains the same GP under each mode and reports the
factorization wall-clock and the prediction spread. On CPU the modes
are no-ops (CPU matmuls are always true f32), so run it on the TPU to
see the ladder; it still runs (with ~zero spread) on CPU.

Run: ``python examples/precision_modes.py [n]``
"""

from __future__ import annotations

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax

from friedrich_tpu.config import honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu must actually pin cpu (env alone is unreliable under plugin sitecustomize)
import jax.numpy as jnp
import numpy as np

import friedrich_tpu as ft
from friedrich_tpu import kernels


def train_and_predict(x, y, q, mode=None, storage=None):
    """Train + predict, optionally inside a precision scope.

    ``storage="bf16"`` additionally stores the Cholesky factor in
    bfloat16 (f32 compute, rounded write-back) — the MEMORY knob next to
    the precision knob: halves factor HBM, so exact GPs reach n~80k on a
    single 16 GB chip. Same accuracy regime as the ambient bf16-operand
    mode (the MXU already reads f32 GEMM operands at bf16 precision)."""

    def run():
        gp = (
            ft.GaussianProcess.builder(x, y)
            .set_kernel(kernels.SquaredExp(ls=0.5, ampl=1.0))
            .set_noise(0.1)
            .set_backend("streamed")
            .set_factor_storage(storage)
            .train()
        )
        t0 = time.perf_counter()
        gp.set_hyperparameters(noise=0.1)  # rebuild on the compiled path
        dt = time.perf_counter() - t0
        mean = np.asarray(gp.predict(q))
        return mean, dt

    if mode is None:
        return run()
    with ft.config.matmul_precision(mode):
        return run()


def main(n: int = 8192, d: int = 8, m: int = 512, seed: int = 0):
    rng = np.random.default_rng(seed)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.asarray(np.sin(np.asarray(x).sum(axis=1)), jnp.float32)
    q = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)

    print(f"platform={jax.devices()[0].platform} n={n} d={d}")

    results = {}
    for mode, storage in ((None, None), ("f32x3", None), ("f32", None),
                          (None, "bf16")):
        mean, dt = train_and_predict(x, y, q, mode, storage)
        label = (mode or "ambient(bf16)") + ("+bf16store" if storage else "")
        results[label] = mean
        print(f"{label:>22}: factor+train {dt:.3f}s")

    ref = results["f32"]
    for label, mean in results.items():
        spread = float(np.abs(mean - ref).max())
        print(f"{label:>22}: max |mean - mean_f32| = {spread:.3e}")
    return results


if __name__ == "__main__":
    main(int(sys.argv[1]) if len(sys.argv) > 1 else 8192)
