"""Round-4 consolidated chip session: run the headline measurements in
ONE process so every program compiles once (fresh-process warmup of the
n=50k programs costs ~10 min each over the remote compile helper).

Order (most important first, progressive JSON so a partial run still
yields data):
1. facade build+factor at n=50k (the fused single-dispatch constructor)
   vs the raw streamed op in the same process;
2. full fit at n=50k retry (hit HTTP 500 in the previous session);
3. subsample sensitivity study (sizes x seeds).
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

honor_platform_env()
enable_compile_cache()


def emit(**kw):
    print(json.dumps(kw), flush=True)


def stage_bench_facade(n=50_000, d=8, repeats=5):
    import friedrich_tpu as ft
    from friedrich_tpu.kernels import SquaredExp
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor
    from friedrich_tpu.priors import ZeroPrior

    rng = np.random.default_rng(0)
    x = rng.normal(size=(n, d)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    kernel = SquaredExp(
        ls=jnp.asarray(0.5, jnp.float32), ampl=jnp.asarray(1.0, jnp.float32)
    )

    def make():
        return ft.GaussianProcess.new(
            ZeroPrior(), kernel, 1.0, None, x, y, backend="streamed"
        )

    gp = make()  # compile
    times = []
    for _ in range(repeats):
        del gp
        t0 = time.perf_counter()
        gp = make()
        times.append(time.perf_counter() - t0)
    del gp
    emit(exp="facade_build_factor", n=n, fused_constructor=True,
         seconds=round(float(np.median(times)), 4),
         all_times=[round(t, 4) for t in times])

    # raw op in the same process for the facade-overhead decomposition
    xj = jnp.asarray(x)
    l0 = None
    lmat, ok = streamed_cholesky_factor(kernel, xj, n, 1.0)  # compile
    times = []
    for _ in range(repeats):
        l0 = lmat  # donate the previous buffer
        t0 = time.perf_counter()
        lmat, ok = streamed_cholesky_factor(kernel, xj, n, 1.0, l0=l0)
        jax.block_until_ready(lmat)
        times.append(time.perf_counter() - t0)
    del lmat, l0
    emit(exp="raw_streamed_factor", n=n,
         seconds=round(float(np.median(times)), 4),
         all_times=[round(t, 4) for t in times])


def stage_full_fit(n=50_000):
    from measure import main as measure_main

    measure_main(["fit", "--backend", "streamed", "--n", str(n),
                  "--precision", "f32"])


def stage_subsample_study():
    from subsample_study import main as study_main

    study_main(["--n", "50000", "--sizes", "5000", "10000", "20000",
                "--seeds", "0", "1", "2", "--include-full"])


if __name__ == "__main__":
    stages = sys.argv[1:] or ["bench", "fit", "study"]
    for s in stages:
        try:
            {"bench": stage_bench_facade,
             "fit": stage_full_fit,
             "study": stage_subsample_study}[s]()
        except Exception as e:  # noqa: BLE001
            emit(exp=s, error=str(e)[:300])
