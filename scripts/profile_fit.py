"""Per-phase wall-clock decomposition of the end-to-end hyperparameter
fit (the north-star op) on the real chip.

Times each phase of the large-n fit SEPARATELY with block_until_ready:
heuristic, initial build+factor, prior refit, per-iteration gradient
step, per-iteration rebuild, derive-weights, predict. This is the
profiler-based (not arithmetic) decomposition of the ~5 s residual the
round-2 verdict asked for — it separates device compute from dispatch /
tunnel overhead per iteration.

Usage: python scripts/profile_fit.py --n 50000 [--precision f32]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np


def sync(x):
    jax.block_until_ready(x)
    return x


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--n", type=int, default=50_000)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--precision", default="f32")
    p.add_argument("--max-iter", type=int, default=10)
    p.add_argument("--probes", type=int, default=8)
    args = p.parse_args()

    import friedrich_tpu.kernels as fk
    from friedrich_tpu import config as ftconfig
    from friedrich_tpu.models import gp as core
    from friedrich_tpu.models.large_fit import (
        _grad_step_large,
        make_probes,
    )
    from friedrich_tpu.models.optimizer import (
        ADAM_EPS,
        AdamState,
        fit_prior_padded,
    )
    from friedrich_tpu.priors import ConstantPrior

    rng = np.random.default_rng(0)
    n, d = args.n, args.d
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.asarray(
        np.sin(2.5 * np.asarray(x)[:, 0])
        + 0.5 * np.cos(2.0 * np.asarray(x)[:, 1])
        + 1.0 * rng.normal(size=n),
        jnp.float32,
    )

    timings: dict[str, float] = {}

    def timed(name, fn, *a, **kw):
        t0 = time.perf_counter()
        out = sync(fn(*a, **kw))
        dt = time.perf_counter() - t0
        timings[name] = timings.get(name, 0.0) + dt
        print(f"  {name}: {dt:.3f}s", flush=True)
        return out

    with ftconfig.matmul_precision(args.precision):
        # -- heuristic ------------------------------------------------
        kern = fk.Gaussian()
        t0 = time.perf_counter()
        kern = kern.heuristic_fit(x, y)
        sync(kern.get_params())
        print(f"  heuristic (first, incl compile): "
              f"{time.perf_counter() - t0:.3f}s", flush=True)
        t0 = time.perf_counter()
        kern = fk.Gaussian().heuristic_fit(x, y)
        sync(kern.get_params())
        timings["heuristic"] = time.perf_counter() - t0
        print(f"  heuristic: {timings['heuristic']:.3f}s", flush=True)

        # -- initial build+factor (compile, then timed re-run) --------
        def build_state():
            st, ok = core.make_state(
                kern, ConstantPrior(0.0), jnp.asarray(1.0, jnp.float32),
                x, y, backend="streamed", precision=args.precision,
            )
            sync(st.l)
            return st, ok

        print("compiling initial factor...", flush=True)
        t0 = time.perf_counter()
        state, ok = build_state()
        print(f"  first build+factor (incl compile): "
              f"{time.perf_counter() - t0:.1f}s ok={bool(ok)}", flush=True)
        state, ok = None, None
        state, ok = timed("initial_factor", build_state)
        assert bool(ok)

        # -- prior refit ----------------------------------------------
        # unjitted on purpose: a non-donating jit would copy the cap^2
        # factor as a pass-through output (2x HBM peak at n=50k)
        state = timed("fit_prior", fit_prior_padded, state)

        # -- ADAM loop, each half timed separately ---------------------
        scalable = state.kernel.is_scalable
        kparams = jnp.where(
            state.kernel.get_params() == 0.0, ADAM_EPS,
            state.kernel.get_params(),
        )
        params = kparams if scalable else jnp.concatenate(
            [kparams, jnp.log(state.noise)[None]]
        )
        adam = AdamState(params=params, m=jnp.zeros_like(params),
                         v=jnp.zeros_like(params))
        probes = make_probes(state, args.probes, 0)
        conv = jnp.asarray(0.05, params.dtype)

        grad_t, rebuild_t, iters = [], [], 0
        for i in range(1, args.max_iter + 1):
            t0 = time.perf_counter()
            adam, kernel, noise, progress, info = _grad_step_large(
                state, adam, probes, jnp.asarray(i), conv, scalable
            )
            sync(progress)
            grad_t.append(time.perf_counter() - t0)
            iters += 1
            if not bool(progress):
                break
            state = state.replace(kernel=kernel, noise=noise)
            t0 = time.perf_counter()
            state, ok = core.rebuild_cholesky(state, reuse_buffer=True)
            sync(ok)
            rebuild_t.append(time.perf_counter() - t0)
            assert bool(ok)

        print(f"  iterations: {iters}", flush=True)
        if grad_t:
            print(f"  grad steps  : first={grad_t[0]:.3f}s "
                  f"rest={[round(t, 3) for t in grad_t[1:]]}", flush=True)
        if rebuild_t:  # empty when the fit converges on iteration 1
            print(f"  rebuilds    : first={rebuild_t[0]:.3f}s "
                  f"rest={[round(t, 3) for t in rebuild_t[1:]]}", flush=True)
        timings["grad_steps_total"] = sum(grad_t)
        timings["rebuilds_total"] = sum(rebuild_t)
        # steady-state per-iteration cost (skip compile-bearing first)
        if len(grad_t) > 1:
            timings["grad_step_steady"] = float(np.median(grad_t[1:]))
        if len(rebuild_t) > 1:
            timings["rebuild_steady"] = float(np.median(rebuild_t[1:]))

        # -- derive weights + predict ----------------------------------
        dw = jax.jit(core.derive_weights)
        t0 = time.perf_counter()
        weights = sync(dw(state))
        print(f"  derive_weights (first, incl compile): "
              f"{time.perf_counter() - t0:.3f}s", flush=True)
        weights = timed("derive_weights", dw, state)
        xq = jnp.asarray(rng.normal(size=(4096, d)), jnp.float32)
        _ = sync(core.predict_mean_variance(state, xq, weights))  # compile
        timed("predict_4096", core.predict_mean_variance, state, xq, weights)

    total = (
        timings["heuristic"] + timings["initial_factor"]
        + timings["fit_prior"] + timings["grad_steps_total"]
        + timings["rebuilds_total"] + timings["derive_weights"]
        + timings["predict_4096"]
    )
    print(json.dumps({"n": n, "precision": args.precision,
                      "iterations": iters, "total_s": round(total, 3),
                      **{k: round(v, 4) for k, v in timings.items()}}))


if __name__ == "__main__":
    main()
