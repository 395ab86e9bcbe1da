"""TPU measurement tool feeding BASELINE.md (consolidates the round-1
measure_tpu{,2,3,4}.py batch scripts into one parameterized CLI).

Each experiment prints progressive JSON lines (one per measurement) so a
partial run still yields data; every experiment is isolated with
try/except. Run on the real chip (default backend) — measurements scale
with problem size, so distrust any number that does not (the tunnel
runtime result-caches tiny identical executions).

Usage:
    python scripts/measure.py EXP [EXP...] [options]

Experiments:
    factor   build+factor wall-clock: --backend {dense,streamed,tiled,
             hybrid} --n --block --levels --dtype {f32,bf16}
    cov      covariance build alone (XLA vs Pallas): --n
    predict  mean+variance throughput against a streamed factor: --n --m
    nuts     NUTS transitions/s on a GP hyperparameter posterior:
             --gp-n --chains
    gemm     raw GEMM roofline probe (f32 + bf16): --n
    precacc  precision-mode accuracy ladder vs a host f64 factor:
             --n (capped 8192) --block
    all      factor(hybrid) + cov + predict + nuts
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

from friedrich_tpu.config import enable_compile_cache, honor_platform_env

honor_platform_env()  # JAX_PLATFORMS=cpu smoke runs (CI / no chip)
enable_compile_cache()


def timeit(f, *a, r=3):
    jax.block_until_ready(f(*a))
    ts = []
    for _ in range(r):
        t0 = time.perf_counter()
        jax.block_until_ready(f(*a))
        ts.append(time.perf_counter() - t0)
    return float(np.median(ts))


def emit(**kw):
    print(json.dumps(kw), flush=True)


_NOISE = 1.0  # set from --noise in main()


def _kernel_noise(dtype):
    import friedrich_tpu.kernels as fk

    return (
        fk.SquaredExp(ls=jnp.asarray(0.5, dtype), ampl=jnp.asarray(1.0, dtype)),
        jnp.asarray(_NOISE, dtype),
    )


def exp_factor(args):
    """Fused covariance build + Cholesky — the BASELINE headline op."""
    dtype = jnp.float32
    kern, noise = _kernel_noise(dtype)
    rng = np.random.default_rng(0)
    n = args.n
    x = jnp.asarray(rng.normal(size=(n, args.d)), dtype)
    method = "gram_bf16" if args.dtype == "bf16" else "gram"
    backend = args.backend
    if args.storage != "none" and backend != "streamed":
        emit(exp="factor", backend=backend, n=n,
             error=f"--storage {args.storage} requires --backend streamed")
        return

    # reduce the (cap, cap) factor to a SCALAR inside jit (like bench.py):
    # returning/holding the 10 GB factor across timed repeats keeps two
    # factors alive at once and OOMs a 16 GB chip
    def _scalarize(pair):
        l_mat, ok = pair
        return jnp.sum(jnp.log(jnp.diagonal(l_mat))), ok

    try:
        if backend == "hybrid":
            from friedrich_tpu.ops.hybrid import hybrid_cholesky_factor

            f = jax.jit(
                lambda x: _scalarize(hybrid_cholesky_factor(
                    kern, x, n, noise, block=args.block, levels=args.levels,
                    method=method,
                ))
            )
        elif backend == "streamed":
            from friedrich_tpu.ops.streamed import streamed_cholesky_factor

            prec = None if args.precision == "ambient" else args.precision
            stor = None if args.storage == "none" else args.storage
            blk = (
                tuple(int(w) for w in args.blocks.split(","))
                if args.blocks else args.block
            )
            f = jax.jit(
                lambda x: _scalarize(streamed_cholesky_factor(
                    kern, x, n, noise, block=blk, method=method,
                    precision=prec, storage=stor,
                    solve_blocks=args.solve_blocks,
                    diag_blocks=args.diag_blocks,
                ))
            )
        elif backend == "tiled":
            from friedrich_tpu.ops.tiled import tiled_cholesky_factor

            f = jax.jit(
                lambda x: _scalarize(tiled_cholesky_factor(
                    kern, x, n, noise, block=args.block, method=method
                ))
            )
        else:
            from friedrich_tpu.ops.covariance import train_covariance_padded
            from friedrich_tpu.ops.cholesky import factor

            f = jax.jit(
                lambda x: _scalarize(factor(
                    train_covariance_padded(kern, x, n, noise, method=method)
                ))
            )
        _, ok = jax.block_until_ready(f(x))
        if not bool(ok):
            emit(exp="factor", backend=backend, n=n, dtype=args.dtype,
                 storage=args.storage,
                 error="factorization ok=False (non-finite factor)")
            return
        t = timeit(f, x, r=args.repeats)
        emit(
            exp="factor", backend=backend, n=n,
            block=args.blocks or args.block,
            solve_blocks=args.solve_blocks,
            diag_blocks=args.diag_blocks,
            levels=args.levels, dtype=args.dtype, precision=args.precision,
            storage=args.storage, seconds=round(t, 4),
            eff_tflops=round(n**3 / 3 / t / 1e12, 1),
        )
    except Exception as e:
        emit(exp="factor", backend=backend, n=n, dtype=args.dtype,
             error=str(e)[:300])


def exp_fit(args):
    """End-to-end hyperparameter FIT through the public API — the
    north-star op (``builder.rs:189-214`` -> ``optimizer.rs:211-283``):
    heuristic init + build/factor + prior refit + scaled ADAM to
    convergence, then a predict batch. Reports the first (compile-heavy)
    and second (execution-only) full train() wall-clocks, the iteration
    count, and predict throughput."""
    import friedrich_tpu as ft
    import friedrich_tpu.kernels as fk
    from friedrich_tpu.utils.fitlog import FitLog

    rng = np.random.default_rng(0)
    n, d, m = args.n, args.d, args.m
    x = rng.normal(size=(n, d)).astype(np.float32)
    # short true lengthscale: the heuristic init (ls ~ mean pairwise
    # distance ~ sqrt(2d)) is deliberately mismatched so the ADAM fit has
    # real work to do (otherwise it converges in one iteration and the
    # "fit wall-clock" measures nothing)
    y = (
        np.sin(2.5 * x[:, 0]) + 0.5 * np.cos(2.0 * x[:, 1])
        + args.noise * rng.normal(size=n)
    ).astype(np.float32)
    xq = rng.normal(size=(m, d)).astype(np.float32)

    import contextlib

    from friedrich_tpu import config as ftconfig

    def _scope():
        if args.precision == "ambient":
            return contextlib.nullcontext()
        return ftconfig.matmul_precision(args.precision)

    # --subsample: None/absent = the builder's DEFAULT ("auto" policy —
    # since round 4 the public-API train() sub-fits above n=24,576);
    # "none" = force the reference full-fit flow; an int = explicit size
    sub_arg = args.subsample

    def make_builder():
        b = (
            ft.GaussianProcessBuilder(x, y)
            .set_noise(args.noise)
            .set_dtype("float32")
            .set_backend(args.backend if args.backend != "dense" else "auto")
        )
        if args.eps:
            b = b.set_cholesky_epsilon(args.eps)
        if args.storage != "none":
            b = b.set_factor_storage(args.storage)
        if sub_arg == "none":
            b = b.set_fit_subsample(None)
        elif sub_arg is not None:
            b = b.set_fit_subsample(int(sub_arg))
        return b

    resolved_sub = make_builder()._resolved_subsample(n)

    def build():
        with _scope():
            return (
                make_builder()
                .fit_kernel().fit_prior()
                .set_fit_parameters(args.max_iter, 0.05)
                .train()
            )

    try:
        t0 = time.perf_counter()
        gp = build()
        t_first = time.perf_counter() - t0
        mean, var = gp.predict_in_batches(xq, batch_size=min(m, 4096))
        jax.block_until_ready((mean, var))
        t0 = time.perf_counter()
        mean, var = gp.predict_in_batches(xq, batch_size=min(m, 4096))
        jax.block_until_ready((mean, var))
        t_predict = time.perf_counter() - t0
        mean = np.asarray(mean)
        # only ONE (cap, cap) factor fits in HBM at the headline size —
        # drop this model before constructing the next
        del gp

        # iteration count via an (untimed) logged refit reproducing the
        # timed flow: sub-model fit when a subsample resolves, else the
        # full fit
        log = FitLog()
        kern = fk.Gaussian().heuristic_fit(
            jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
        )
        with _scope():
            if resolved_sub is not None:
                import friedrich_tpu.priors as fpr

                prior = fpr.ConstantPrior.default(d).fit(
                    jnp.asarray(x, jnp.float32), jnp.asarray(y, jnp.float32)
                )
                idx = np.asarray(jnp.sort(jax.random.permutation(
                    jax.random.PRNGKey(0), n)[:resolved_sub]))
                gp2 = ft.GaussianProcess.new(
                    prior, kern, args.noise, args.eps or None,
                    x[idx], y[idx], backend="auto",
                )
                gp2.fit_parameters(
                    fit_prior=False, fit_kernel=True,
                    max_iter=args.max_iter, convergence_fraction=0.05,
                    fit_log=log,
                )
            else:
                gp2 = make_builder().set_kernel(kern).train()
                gp2.fit_parameters(
                    fit_prior=True, fit_kernel=True, max_iter=args.max_iter,
                    convergence_fraction=0.05, fit_log=log,
                )
        del gp2
        iters = len(log.records)

        # second full train: execution-only (programs compiled above)
        t0 = time.perf_counter()
        gp3 = build()
        t_second = time.perf_counter() - t0
        # model-quality check: posterior mean vs the noiseless generating
        # function on held-out queries (RMSE floor = the aleatoric noise
        # the model cannot remove; eps-substituted or low-precision fits
        # that wreck the model show up here, not just in wall-clock)
        f_true = np.sin(2.5 * xq[:, 0]) + 0.5 * np.cos(2.0 * xq[:, 1])
        rmse = float(np.sqrt(np.mean((mean - f_true) ** 2)))
        emit(
            exp="fit", backend=args.backend, n=n, d=d,
            storage=args.storage, max_iter=args.max_iter,
            eps=args.eps, precision=args.precision,
            subsample=sub_arg, resolved_subsample=resolved_sub,
            first_train_s=round(t_first, 3),
            train_s=round(t_second, 3),
            fit_iterations=iters,
            predict_m=m, predict_s=round(t_predict, 4),
            predict_pts_per_s=round(m / t_predict),
            noise=float(gp3.noise),
            kernel_params=[float(v) for v in gp3.kernel.get_params()],
            lml=float(gp3.log_marginal_likelihood()),
            rmse_vs_truth=round(rmse, 4),
            budget_s=round(60.0 * (n / 100_000) ** 3, 2),
        )
    except Exception as e:
        emit(exp="fit", backend=args.backend, n=n, error=str(e)[:300])


def exp_append(args):
    """Incremental add_samples throughput: the blocked O(n^2 k) Cholesky
    append (``algebra/mod.rs:97-126`` is the reference's per-row O(n^2)
    insert loop) through the public facade. Capacity is pre-reserved so
    the append itself — not a growth rebuild — is timed."""
    import friedrich_tpu as ft
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp

    n, d, k = args.n, args.d, 256
    rng = np.random.default_rng(0)
    x = rng.normal(size=(n + 4 * k, d)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    kern = fk.SquaredExp(
        ls=jnp.asarray(0.5, jnp.float32), ampl=jnp.asarray(1.0, jnp.float32)
    )
    try:
        gp = ft.GaussianProcess.new(
            fp.ZeroPrior(), kern, args.noise, None, x[:n], y[:n],
            capacity=n + 4 * k, backend="streamed",
        )
        # warm the append program with the first block, then time blocks
        gp.add_samples(x[n:n + k], y[n:n + k])
        times = []
        for i in range(1, 4):
            lo, hi = n + i * k, n + (i + 1) * k
            t0 = time.perf_counter()
            gp.add_samples(x[lo:hi], y[lo:hi])
            jax.block_until_ready(gp.state.l)
            times.append(time.perf_counter() - t0)
        t = float(np.median(times))
        emit(exp="append", n=n, k=k, seconds=round(t, 4),
             rows_per_s=round(k / t),
             eff_gmacs=round(n * n * k / t / 1e9, 1))
        del gp
    except Exception as e:
        emit(exp="append", n=n, error=str(e)[:300])


def exp_cov(args):
    """Covariance build alone: XLA fused vs the Pallas tile kernel."""
    dtype = jnp.float32
    kern, noise = _kernel_noise(dtype)
    from friedrich_tpu.ops.covariance import train_covariance_padded

    rng = np.random.default_rng(0)
    n = args.n
    x = jnp.asarray(rng.normal(size=(n, args.d)), dtype)
    f_xla = jax.jit(lambda x: train_covariance_padded(kern, x, n, noise))
    try:
        t_xla = timeit(f_xla, x)
        emit(exp="cov_build_xla", n=n, seconds=round(t_xla, 4))
    except Exception as e:
        emit(exp="cov_build_xla", n=n, error=str(e)[:200])
        return
    try:
        from friedrich_tpu.ops.pallas.covariance_pallas import (
            train_covariance_pallas,
        )

        f_pal = jax.jit(lambda x: train_covariance_pallas(kern, x, n, noise))
        t_pal = timeit(f_pal, x)
        err = float(jnp.max(jnp.abs(f_pal(x) - f_xla(x))))
        emit(exp="cov_build_pallas", n=n, seconds=round(t_pal, 4),
             max_err_vs_xla=err)
    except Exception as e:
        emit(exp="cov_build_pallas", n=n, error=str(e)[:300])


def exp_predict(args):
    """Posterior mean+variance throughput against a streamed 50k factor."""
    dtype = jnp.float32
    kern, noise = _kernel_noise(dtype)
    from friedrich_tpu.ops.covariance import (
        cross_covariance_train_padded,
        kernel_diag,
    )
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    rng = np.random.default_rng(0)
    n, m = args.n, args.m
    stor = None if args.storage == "none" else args.storage
    x = jnp.asarray(rng.normal(size=(n, args.d)), dtype)
    try:
        # host-level call (no outer jit): the unrolled factorizer donates
        # its output buffer only when called with concrete arrays — an
        # outer jit would reintroduce the 2x-L output copy and OOM at 50k
        l_mat, _ = streamed_cholesky_factor(
            kern, x, n, noise, block=2048, storage=stor
        )
        jax.block_until_ready(l_mat)
        emit(exp="predict_setup", n=n, storage=args.storage,
             stage="factor materialized")
        xq = jnp.asarray(rng.normal(size=(m, args.d)), dtype)
        resid = jnp.asarray(rng.normal(size=(n,)), dtype)

        from friedrich_tpu.ops.blocked_solve import (
            blocked_solve_lower,
            blocked_solve_lower_t,
        )

        @jax.jit
        def predict(l_mat, x, resid, xq):
            # legacy two-sweep path (cho_solve form, pre-weights-cache)
            c = cross_covariance_train_padded(kern, x, n, xq)
            kl = blocked_solve_lower(l_mat, c)
            w = blocked_solve_lower_t(l_mat, kl)
            return w.T @ resid, kernel_diag(kern, xq) - jnp.sum(kl * kl, axis=0)

        t = timeit(predict, l_mat, x, resid, xq, r=args.repeats)
        emit(exp="predict_mean_var_legacy", storage=args.storage, n=n, m=m, seconds=round(t, 4),
             points_per_sec=round(m / t))

        # the library's current facade path: derive_weights once (panel
        # inverses + beta/alpha), then one pure-GEMM sweep per batch
        from friedrich_tpu.ops.blocked_solve import panel_inverses

        @jax.jit
        def derive(l_mat, resid):
            dinv = panel_inverses(l_mat)
            beta = blocked_solve_lower(l_mat, resid, diag_inv=dinv)
            return dinv, beta, blocked_solve_lower_t(
                l_mat, beta, diag_inv=dinv
            )

        dinv, beta, alpha = jax.block_until_ready(derive(l_mat, resid))
        td = timeit(derive, l_mat, resid, r=args.repeats)
        emit(exp="predict_derive_weights", storage=args.storage, n=n, seconds=round(td, 4))

        @jax.jit
        def predict_w(l_mat, x, dinv, beta, xq):
            c = cross_covariance_train_padded(kern, x, n, xq)
            kl = blocked_solve_lower(l_mat, c, diag_inv=dinv)
            return kl.T @ beta, kernel_diag(kern, xq) - jnp.sum(kl * kl, axis=0)

        t = timeit(predict_w, l_mat, x, dinv, beta, xq, r=args.repeats)
        emit(exp="predict_mean_var_weights", storage=args.storage, n=n, m=m, seconds=round(t, 4),
             points_per_sec=round(m / t))

        @jax.jit
        def predict_mean_only(l_mat, x, alpha, xq):
            # sweep-free mean: strip build + one GEMM against K^-1 resid
            c = cross_covariance_train_padded(kern, x, n, xq)
            return c.T @ alpha

        t = timeit(predict_mean_only, l_mat, x, alpha, xq, r=args.repeats)
        emit(exp="predict_mean_only_weights", storage=args.storage, n=n, m=m, seconds=round(t, 4),
             points_per_sec=round(m / t))
    except Exception as e:
        emit(exp="predict", n=n, m=m, error=str(e)[:300])


def exp_nuts(args):
    """NUTS on an exact-LML GP hyperparameter posterior: transitions/s AND
    ESS/s per chip (the BASELINE samples/s headline is an effective rate,
    not a transition count), with split R-hat as the validity gate.

    ``--eps`` builds the GP state with that ``cholesky_epsilon``; the
    density's factorization substitutes failing pivots with it, so the
    cheap MXU modes (ambient 1-pass / f32x3 3-pass) stay finite in the
    long-lengthscale region that otherwise makes every trajectory diverge
    (BASELINE.md round 3). Choose it at the documented error scale
    ``~ n * 2^-15 * ampl^2`` — machine-small values cascade."""
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu.mcmc import (
        ess, initial_theta, make_hyperparam_logprob, rhat,
    )
    from friedrich_tpu.mcmc.nuts import sample_nuts
    from friedrich_tpu.models import gp as core

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    ngp = args.gp_n
    xg = jnp.asarray(rng.normal(size=(ngp, 4)), dtype)
    yg = jnp.sin(xg[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=(ngp,)), dtype)
    kern = fk.SquaredExp(ls=jnp.asarray(1.0, dtype), ampl=jnp.asarray(1.0, dtype))
    eps = jnp.asarray(args.eps, dtype) if args.eps else None
    state, _ = core.make_state(
        kern, fp.ZeroPrior(), jnp.asarray(0.2, dtype), xg, yg, eps=eps
    )
    prec = None if args.precision == "ambient" else args.precision
    logp = make_hyperparam_logprob(
        state, precision=prec, backend=args.logprob_backend
    )
    theta0 = initial_theta(state)
    for chains in args.chains:
        warm, num = args.warmup, args.samples
        try:
            def run(key, c=chains):
                return sample_nuts(
                    logp, theta0, key, num_warmup=warm, num_samples=num,
                    num_chains=c, max_depth=6,
                    chain_batch=args.chain_batch,
                    scan_segment=args.scan_segment,
                )

            res = run(jax.random.PRNGKey(0))
            jax.block_until_ready(res.samples)  # compile + warm
            t1 = time.perf_counter()
            res = run(jax.random.PRNGKey(1))
            jax.block_until_ready(res.samples)
            t_run = time.perf_counter() - t1
            # work sanity: a NUTS transition at depth d costs ~2^d - 1
            # density+gradient evals; if the reported wall-clock implies
            # a per-eval time far below one measured eval, the timing is
            # a tunnel artifact (round-5 finding: an 81 t/s "result" at
            # n=8192 implied 0.3 ms/eval where one eval measures 190 ms)
            vg = jax.jit(jax.vmap(jax.value_and_grad(logp)))
            th_probe = theta0[None, :] + 0.01 * jnp.ones((chains, theta0.shape[0]))
            jax.block_until_ready(vg(th_probe))
            t0p = time.perf_counter()
            jax.block_until_ready(vg(th_probe))
            eval_s = time.perf_counter() - t0p
            depth_mean = float(jnp.mean(res.tree_depth))
            expected_floor = (
                (warm + num) * (2 ** depth_mean - 1) * eval_s * 0.25
            )
            suspect = t_run < expected_floor
            # effective rate: worst-parameter ESS over the post-warmup
            # draws, divided by the FULL run wall-clock (warmup included —
            # that is what a user pays for those effective samples)
            ess_min = float(jnp.min(ess(res.samples)))
            rhat_max = float(jnp.max(rhat(res.samples)))
            emit(
                exp="nuts_gp", n=ngp, chains=chains,
                chain_batch=args.chain_batch,
                precision=args.precision,
                eps=args.eps,
                logprob_backend=args.logprob_backend,
                transitions=chains * (warm + num),
                run_seconds=round(t_run, 3),
                transitions_per_sec=round(chains * (warm + num) / t_run, 1),
                ess_min=round(ess_min, 1),
                ess_per_sec=round(ess_min / t_run, 2),
                rhat_max=round(rhat_max, 4),
                mean_depth=round(depth_mean, 2),
                div_rate=round(float(jnp.mean(res.divergent)), 4),
                density_eval_s=round(eval_s, 4),
                suspect_timing=bool(suspect),
            )
        except Exception as e:
            emit(exp="nuts_gp", chains=chains, error=str(e)[:300])


def exp_serving(args):
    """Serving throughput/latency: the TPU-backed AcceleratedGPServer at
    --n (model on the accelerator), and the C++ daemon on CPU at --gp-n
    (f64 single-thread; its per-request cost is O(n^2 m)). Reports
    points/s and p50/p99 per-request latency, single and 4 concurrent
    clients."""
    import threading

    import friedrich_tpu as ft
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu import serving

    rng = np.random.default_rng(0)
    batch = 512
    reqs = 20

    def drive(port, d, tag, n_model, clients=1):
        lat = []
        lock = threading.Lock()
        # all clients connect + warm (first request compiles the predict
        # program on the accelerated server), THEN the timing window opens
        barrier = threading.Barrier(clients + 1)
        spans = []

        def one_client():
            xq = rng.normal(size=(batch, d))
            with serving.GPClient(port=port) as client:
                client.predict_mean_variance(xq)  # warm
                barrier.wait()
                t_start = time.perf_counter()
                for _ in range(reqs):
                    t0 = time.perf_counter()
                    client.predict_mean_variance(xq)
                    dt = time.perf_counter() - t0
                    with lock:
                        lat.append(dt)
                with lock:
                    spans.append((t_start, time.perf_counter()))

        threads = [
            threading.Thread(target=one_client) for _ in range(clients)
        ]
        for t in threads:
            t.start()
        barrier.wait()
        t0 = time.perf_counter()
        for t in threads:
            t.join()
        wall = max(e for _, e in spans) - t0
        lat.sort()
        emit(
            exp="serving", server=tag, n=n_model, batch=batch,
            clients=clients, requests=clients * reqs,
            pts_per_s=round(clients * reqs * batch / wall),
            p50_ms=round(1e3 * lat[len(lat) // 2], 2),
            p99_ms=round(1e3 * lat[int(len(lat) * 0.99) - 1], 2),
        )

    # TPU-backed server at large n
    try:
        d = args.d
        n = args.n
        x = rng.normal(size=(n, d)).astype(np.float32)
        y = (np.sin(x[:, 0]) + args.noise * rng.normal(size=n)).astype(
            np.float32
        )
        gp = (
            ft.GaussianProcessBuilder(x, y)
            .set_kernel(fk.SquaredExp(ls=0.5, ampl=1.0))
            .set_noise(args.noise)
            .set_dtype("float32")
            .set_backend("streamed")
            .train()
        )
        with serving.AcceleratedGPServer(gp) as srv:
            drive(srv.port, d, "accelerated", n, clients=1)
            drive(srv.port, d, "accelerated", n, clients=4)
        del gp
    except Exception as e:
        emit(exp="serving", server="accelerated", n=args.n,
             error=str(e)[:300])

    # C++ daemon on CPU at a CPU-feasible n
    try:
        import tempfile

        nd = args.gp_n
        xd = rng.normal(size=(nd, args.d))
        yd = np.sin(xd[:, 0]) + 0.1 * rng.normal(size=nd)
        gp_d = ft.GaussianProcess.new(
            fp.ConstantPrior(0.0), fk.SquaredExp(1.0, 1.0), 0.3, None,
            xd, yd,
        )
        with tempfile.TemporaryDirectory() as td:
            bundle = Path(td) / "model.frsv"
            serving.export_bundle(gp_d, bundle)
            with serving.GPServer(bundle) as srv:
                drive(srv.port, args.d, "daemon_cpu", nd, clients=1)
                drive(srv.port, args.d, "daemon_cpu", nd, clients=4)
    except Exception as e:
        emit(exp="serving", server="daemon_cpu", n=args.gp_n,
             error=str(e)[:300])


def exp_diag(args):
    """Microbenchmarks of the factorization's constituent ops — locates the
    rate sink behind the tiled/hybrid backends (diagonal-block Cholesky and
    TRSM tiles vs plain GEMMs)."""
    rng = np.random.default_rng(0)
    for b in (1024, 2048, 2500, 4096):
        try:
            a = jnp.asarray(rng.normal(size=(b, b)), jnp.float32)
            spd = a @ a.T + b * jnp.eye(b, dtype=jnp.float32)
            f = jax.jit(jnp.linalg.cholesky)
            t = timeit(f, spd, r=5)
            emit(exp="diag_chol", b=b, seconds=round(t, 5),
                 eff_tflops=round(b**3 / 3 / t / 1e12, 2))
        except Exception as e:
            emit(exp="diag_chol", b=b, error=str(e)[:200])
    from jax.scipy.linalg import solve_triangular

    for b in (2048, 2500):
        try:
            a = jnp.asarray(rng.normal(size=(b, b)), jnp.float32)
            spd = a @ a.T + b * jnp.eye(b, dtype=jnp.float32)
            l_mat = jnp.linalg.cholesky(spd)
            rhs = jnp.asarray(rng.normal(size=(b, 4096)), jnp.float32)
            f = jax.jit(lambda l, r: solve_triangular(l, r, lower=True))
            t = timeit(f, l_mat, rhs, r=5)
            emit(exp="diag_trsm", b=b, rhs=4096, seconds=round(t, 5),
                 eff_tflops=round(b * b * 4096 / t / 1e12, 2))
            # GEMM of the same shape for comparison
            g = jax.jit(lambda l, r: jnp.dot(l, r, preferred_element_type=jnp.float32))
            tg = timeit(g, l_mat, rhs, r=5)
            emit(exp="diag_gemm_same_shape", b=b, rhs=4096,
                 seconds=round(tg, 5),
                 tflops=round(2 * b * b * 4096 / tg / 1e12, 2))
        except Exception as e:
            emit(exp="diag_trsm", b=b, error=str(e)[:200])


def exp_precacc(args):
    """Accuracy ladder of the precision modes against an independent
    float64 HOST factorization of the same covariance (numpy builds K in
    f64 from the same inputs; numpy factors it). Reports, per mode, the
    max |L - L64| over the lower triangle and the max relative diagonal
    error — measured in f64 on the host, so the comparison itself cannot
    round the differences away (a TPU-side comparison matmul runs at
    bf16 operand precision and once reported exactly 0.0)."""
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    dtype = jnp.float32
    kern, noise = _kernel_noise(dtype)
    rng = np.random.default_rng(0)
    n = min(args.n, 16384)  # host f64 reference factorization bound
    block = min(args.block, n // 4)
    x64 = rng.normal(size=(n, args.d))
    x = jnp.asarray(x64, dtype)
    x64 = np.asarray(x, np.float64)  # compare from the f32-rounded inputs

    sq = (
        np.sum(x64 * x64, 1)[:, None] + np.sum(x64 * x64, 1)[None, :]
        - 2.0 * x64 @ x64.T
    )
    k64 = float(kern.ampl) * np.exp(-sq / (2.0 * float(kern.ls) ** 2))
    k64[np.arange(n), np.arange(n)] += float(noise) ** 2
    l64 = np.linalg.cholesky(k64)
    tril = np.tril_indices(n)

    # end-to-end reference: posterior mean weights alpha = K^-1 y
    rng_y = np.random.default_rng(1)
    y64 = rng_y.normal(size=(n,))
    alpha64 = np.linalg.solve(k64, y64)

    # (precision, storage) rows: the four MXU modes + the bf16-STORAGE
    # factor (f32 compute, bfloat16 write-back — ops/streamed storage)
    for mode, stor in (
        (None, None), ("bf16", None), ("f32x3", None), ("f32", None),
        (None, "bf16"),
    ):
        try:
            l_mode, ok = streamed_cholesky_factor(
                kern, x, n, noise, block=block, unroll=True,
                precision=mode, storage=stor,
            )
            lm = np.asarray(jax.block_until_ready(l_mode), np.float64)
            # forward factor error (harsh: exact-factor elementwise)
            dl = np.abs(lm - l64)[tril].max()
            dd = np.abs(np.diagonal(lm) / np.diagonal(l64) - 1.0).max()
            # backward error: the computed factor is the EXACT factor of
            # K + E — |E| is what the GP math actually experiences
            lmt = np.tril(lm)
            be = np.abs(lmt @ lmt.T - k64).max()
            # end-to-end: posterior-mean weights through the computed
            # factor (two host f64 triangular solves, so only the
            # factor's error is measured)
            from scipy.linalg import solve_triangular as st
            am = st(lmt.T, st(lmt, y64, lower=True), lower=False)
            da = np.abs(am - alpha64).max() / np.abs(alpha64).max()
            emit(exp="precision_accuracy", n=n, block=block,
                 mode=mode or "ambient", storage=stor or "none",
                 max_abs_l_err=float(dl),
                 max_rel_diag_err=float(dd), backward_err=float(be),
                 rel_alpha_err=float(da), ok=bool(ok))
        except Exception as e:
            emit(exp="precision_accuracy", n=n, mode=mode or "ambient",
                 storage=stor or "none", error=str(e)[:300])


def exp_solveblock(args):
    """Forward-sweep block sweep: the weights-path predict cost is one
    blocked_solve_lower per batch; find the panel size that maximizes its
    GEMM rate at n=50k, m=4096."""
    from friedrich_tpu.ops.blocked_solve import blocked_solve_lower
    from friedrich_tpu.ops.covariance import cross_covariance_train_padded
    from friedrich_tpu.ops.streamed import streamed_cholesky_factor

    dtype = jnp.float32
    kern, noise = _kernel_noise(dtype)
    rng = np.random.default_rng(0)
    n, m = args.n, args.m
    x = jnp.asarray(rng.normal(size=(n, args.d)), dtype)
    l_mat, _ = streamed_cholesky_factor(kern, x, n, noise, block=2048)
    jax.block_until_ready(l_mat)
    xq = jnp.asarray(rng.normal(size=(m, args.d)), dtype)
    c = jax.jit(
        lambda x, xq: cross_covariance_train_padded(kern, x, n, xq)
    )(x, xq)
    jax.block_until_ready(c)
    from friedrich_tpu.ops.blocked_solve import panel_inverses

    for b in (1250, 2000, 2500, 3125, 5000, 6250):
        try:
            f = jax.jit(
                lambda l, c, b=b: blocked_solve_lower(l, c, block=b)
            )
            t = timeit(f, l_mat, c, r=args.repeats)
            emit(exp="solve_block", n=n, m=m, block=b, seconds=round(t, 4),
                 eff_tmacs=round(n * n * m / 2 / t / 1e12, 1))
        except Exception as e:
            emit(exp="solve_block", n=n, block=b, error=str(e)[:200])
        try:
            dinv = jax.block_until_ready(panel_inverses(l_mat, block=b))
            f = jax.jit(lambda l, c, d: blocked_solve_lower(l, c, diag_inv=d))
            t = timeit(f, l_mat, c, dinv, r=args.repeats)
            emit(exp="solve_block_cached_inv", n=n, m=m, block=b,
                 seconds=round(t, 4),
                 eff_tmacs=round(n * n * m / 2 / t / 1e12, 1))
            del dinv
        except Exception as e:
            emit(exp="solve_block_cached_inv", n=n, block=b,
                 error=str(e)[:200])


def exp_gemm(args):
    """Raw GEMM roofline probe: the chip's achievable matmul rate per
    dtype AND per MXU precision mode (f32 operands: 1/3/6 bf16 passes) —
    the denominators for achieved-fraction numbers in BASELINE.md."""
    from jax import lax

    n = args.n
    rng = np.random.default_rng(0)
    cases = [
        (jnp.bfloat16, None, "bf16-operands"),
        (jnp.float32, None, "f32-ambient"),
        (jnp.float32, lax.Precision.DEFAULT, "f32-bf16_1pass"),
        (jnp.float32, lax.Precision.HIGH, "f32-bf16_3pass"),
        (jnp.float32, lax.Precision.HIGHEST, "f32-true_6pass"),
    ]
    for dtype, prec, name in cases:
        try:
            a = jnp.asarray(rng.normal(size=(n, n)), dtype)
            b = jnp.asarray(rng.normal(size=(n, n)), dtype)
            f = jax.jit(
                lambda a, b: jnp.dot(
                    a, b, preferred_element_type=jnp.float32, precision=prec
                )
            )
            t = timeit(f, a, b, r=5)
            emit(exp="gemm", mode=name, n=n, seconds=round(t, 5),
                 tflops=round(2 * n**3 / t / 1e12, 1))
        except Exception as e:
            emit(exp="gemm", mode=name, error=str(e)[:200])


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("exps", nargs="+",
                   choices=["factor", "fit", "cov", "predict", "nuts",
                            "serving", "gemm", "diag", "precacc",
                            "solveblock", "append", "all"])
    p.add_argument("--backend", default="hybrid",
                   choices=["dense", "streamed", "tiled", "hybrid"])
    p.add_argument("--n", type=int, default=50000)
    p.add_argument("--m", type=int, default=4096)
    p.add_argument("--d", type=int, default=8)
    p.add_argument("--block", type=int, default=2500)
    p.add_argument("--blocks", type=str, default=None,
                   help="comma-separated per-panel width schedule summing "
                        "to n (streamed unrolled only; overrides --block)")
    p.add_argument("--solve-blocks", type=int, default=1,
                   help="sub-blocking factor for the unrolled panel "
                        "solves (streamed backend only)")
    p.add_argument("--diag-blocks", type=int, default=1,
                   help="sub-blocking factor for the unrolled panel "
                        "DIAGONAL factorizations (streamed backend only)")
    p.add_argument("--levels", type=int, default=2)
    p.add_argument("--dtype", default="f32", choices=["f32", "bf16"])
    p.add_argument("--precision", default="ambient",
                   choices=["ambient", "bf16", "f32x3", "f32"],
                   help="factorization matmul precision "
                        "(streamed backend only)")
    p.add_argument("--storage", default="none", choices=["none", "bf16"],
                   help="factor STORAGE dtype (streamed backend only)")
    p.add_argument("--noise", type=float, default=1.0,
                   help="observation-noise std for factor/cov/predict "
                        "experiments (bf16 STORAGE needs "
                        "noise^2 >~ n*2^-15 — BASELINE.md envelope)")
    p.add_argument("--max-iter", type=int, default=100,
                   help="ADAM iteration cap for the fit experiment "
                        "(reference default 100, builder.rs:76)")
    p.add_argument("--subsample", default=None,
                   help="fit-strategy for the fit experiment: absent = "
                        "the builder default ('auto' policy), an int = "
                        "explicit subset size, 'none' = force the "
                        "reference full fit")
    p.add_argument("--eps", type=float, default=None,
                   help="cholesky_epsilon for the fit experiment (the "
                        "reference's remedy for ill-conditioned problems; "
                        "the heuristic lengthscale makes K densely "
                        "correlated at large n, which the default bf16 MXU "
                        "pass cannot factor)")
    p.add_argument("--gp-n", type=int, default=1024)
    p.add_argument("--logprob-backend", default="auto",
                   choices=["auto", "dense", "streamed"],
                   help="MCMC density factorization path (nuts exp)")
    p.add_argument("--chains", type=int, nargs="+", default=[4, 64])
    p.add_argument("--chain-batch", type=int, default=None,
                   help="run chains in sequential program launches of this "
                        "many vmapped chains (TPU-runtime width ceiling)")
    p.add_argument("--scan-segment", type=int, default=None,
                   help="transitions per device program (override the "
                        "auto work-budget segmentation; smaller = safer "
                        "against the TPU-runtime fault envelope)")
    p.add_argument("--warmup", type=int, default=100)
    p.add_argument("--samples", type=int, default=100)
    p.add_argument("--repeats", type=int, default=2)
    args = p.parse_args(argv)

    global _NOISE
    _NOISE = args.noise

    exps = list(args.exps)
    if "all" in exps:
        exps = ["factor", "cov", "predict", "nuts"]
    for e in exps:
        {"factor": exp_factor, "fit": exp_fit, "cov": exp_cov,
         "predict": exp_predict,
         "nuts": exp_nuts, "serving": exp_serving, "gemm": exp_gemm,
         "diag": exp_diag, "precacc": exp_precacc,
         "solveblock": exp_solveblock, "append": exp_append}[e](args)


if __name__ == "__main__":
    main()
