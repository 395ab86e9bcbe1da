"""Headline benchmark (BASELINE.json metric): n=50k kernel-matrix build +
Cholesky wall-clock on one chip, float32.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

``vs_baseline`` is the north-star budget ratio: BASELINE.json targets exact
GP fit+predict at n=100k in < 60 s on a pod slice. The budget is scaled
cubically to the measured size (Cholesky FLOPs ~ n^3):
``vs_baseline = 60 * (n / 100_000)^3 / measured_seconds`` — higher is
better; >1 means inside the size-adjusted budget (this stays honest when
the benchmark falls back to a smaller n).

The reference publishes no numbers (BASELINE.md), so there is no reference
wall-clock to normalize against; its asymptotic cost for this op is
O(n^2 d) kernel evals + O(n^3/3) Cholesky FLOPs on one CPU thread in f64.
"""

from __future__ import annotations

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def build_and_factor_fn(n: int):
    """Fused covariance-build + Cholesky.

    Large n uses the streamed left-looking factorization (K is never
    materialized in HBM; one small fori_loop program, avoiding both the
    2x-K memory peak and the monolithic-Cholesky compile blowup); small n
    uses the dense XLA path.
    """
    from friedrich_tpu.ops.cholesky import cholesky
    from friedrich_tpu.ops.covariance import cross_covariance
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    if n > 32768:

        def run(kernel, x, noise):
            # trace-time-unrolled streamed build+factor with the TUNED
            # auto schedule (ops/partition: block ~ cap/10, ~1024-wide
            # solve/diag sub-blocks) — FLOP-optimal (~0.39 n^3), single-L
            # peak memory, and exactly what the public API's streamed
            # backend selects (block=None)
            l_mat, ok = streamed_cholesky_factor(kernel, x, n, noise)
            return jnp.sum(jnp.log(jnp.diagonal(l_mat))), ok

    else:

        def run(kernel, x, noise):
            k = cross_covariance(kernel, x, x)
            k = k + (noise * noise) * jnp.eye(k.shape[0], dtype=k.dtype)
            l_mat, ok = cholesky(k)
            # cheap scalar that depends on the whole factor
            return jnp.sum(jnp.log(jnp.diagonal(l_mat))), ok

    return jax.jit(run)


def bench_once(n: int, d: int = 8, repeats: int = 3) -> float:
    from friedrich_tpu.kernels import SquaredExp

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)), dtype=jnp.float32)
    # well-conditioned setup for f32 at large n (short lengthscale, unit
    # noise): the benchmark measures build+factor throughput, and ill
    # conditioning would make f32 pivots marginal at n=50k
    kernel = SquaredExp(
        ls=jnp.asarray(0.5, jnp.float32), ampl=jnp.asarray(1.0, jnp.float32)
    )
    noise = jnp.asarray(1.0, jnp.float32)
    run = build_and_factor_fn(n)
    out, ok = run(kernel, x, noise)  # compile + warm up
    jax.block_until_ready(out)
    if not bool(ok):
        raise RuntimeError("cholesky failed in benchmark")
    times = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        out, ok = run(kernel, x, noise)
        jax.block_until_ready(out)
        times.append(time.perf_counter() - t0)
    return float(np.median(times))


def main() -> None:
    # the remote TPU compile helper fails intermittently (HTTP 500) on big
    # loop programs — retry the headline size once before downsizing
    secs = None
    for attempt, n in ((1, 50_000), (2, 50_000), (3, 32_768)):
        try:
            secs = bench_once(n)
            break
        except Exception as e:  # noqa: BLE001
            print(
                f"attempt {attempt} (n={n}) failed ({type(e).__name__}); "
                f"retrying",
                file=sys.stderr,
            )
    if secs is None:
        raise SystemExit("benchmark failed at every size")
    budget = 60.0 * (n / 100_000) ** 3
    print(
        json.dumps(
            {
                "metric": f"n={n} kernel-build+Cholesky wall-clock (1 chip, f32)",
                "value": round(secs, 4),
                "unit": "s",
                "vs_baseline": round(budget / secs, 2),
            }
        )
    )


if __name__ == "__main__":
    main()
