"""Reproducer for the TPU-runtime kernel fault on over-large NUTS
programs (BASELINE.md rounds 3-4; VERDICT #8).

Round-4 bisection on one v5e: the fault tracks the WORK a single
program enqueues — (vmapped chains) x (scan steps) x n^3 — with the
measured safe budget ~1.1e13 (``mcmc/nuts.py::TPU_SCAN_WORK_BUDGET``).
A crashed worker takes ~10 minutes to recover, so the mitigations are
load-bearing: ``sample_nuts``/``sample_hmc`` auto-batch wide chain
requests (``TPU_CHAIN_ENVELOPE``) AND segment warmup/sampling scans
into short per-program launches (``scan_segment``, bitwise-identical
results).

This script intentionally forces ONE unbatched, unsegmented program
(``chain_batch=num_chains, scan_segment=0``) to reproduce the fault,
then demonstrates the auto-mitigated path succeeding on the same
request.

Expected output on the chip: the forced run errors (and the script
waits out the worker recovery); the auto run completes. If the forced
run ever SUCCEEDS, the runtime ceiling has moved — re-measure and
update TPU_SCAN_WORK_BUDGET.
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


def main(n=4096, chains=16, warmup=10, samples=10):
    import friedrich_tpu.kernels as fk
    import friedrich_tpu.priors as fp
    from friedrich_tpu.mcmc import initial_theta, make_hyperparam_logprob
    from friedrich_tpu.mcmc.nuts import sample_nuts

    dtype = jnp.float32
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, 4)), dtype)
    y = jnp.sin(x[:, 0]) + 0.1 * jnp.asarray(rng.normal(size=(n,)), dtype)
    kern = fk.SquaredExp(ls=jnp.asarray(1.0, dtype),
                         ampl=jnp.asarray(1.0, dtype))
    from friedrich_tpu.models import gp as core

    state, _ = core.make_state(kern, fp.ZeroPrior(), jnp.asarray(0.2, dtype),
                               x, y)
    logp = make_hyperparam_logprob(state, precision="f32")
    theta0 = initial_theta(state)

    for tag, kw in (
        ("forced_single_program",
         {"chain_batch": chains, "scan_segment": 0}),
        ("auto", {}),
    ):
        try:
            t0 = time.perf_counter()
            res = sample_nuts(logp, theta0, jax.random.PRNGKey(0),
                              num_warmup=warmup, num_samples=samples,
                              num_chains=chains, max_depth=6, **kw)
            jax.block_until_ready(res.samples)
            print(json.dumps({
                "exp": "kernel_fault_repro", "mode": tag, "n": n,
                "chains": chains, "ok": True,
                "seconds": round(time.perf_counter() - t0, 2),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({
                "exp": "kernel_fault_repro", "mode": tag, "n": n,
                "chains": chains, "ok": False,
                "error": str(e)[:200],
            }), flush=True)
            if tag == "forced_single_program":
                # the crashed worker takes ~10 min to come back; wait so
                # the auto demonstration runs on a healthy chip
                for _ in range(15):
                    time.sleep(60)
                    try:
                        jnp.ones((256, 256)).sum().block_until_ready()
                        break
                    except Exception:  # noqa: BLE001
                        continue


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--chains", type=int, default=16)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--samples", type=int, default=10)
    a = p.parse_args()
    main(a.n, a.chains, a.warmup, a.samples)
