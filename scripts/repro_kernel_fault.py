"""Reproducer for the TPU-runtime kernel fault on wide vmapped NUTS
programs (BASELINE.md round 3; VERDICT #8).

Measured envelope on one v5e chip: a single vmapped NUTS program over
the streamed custom-VJP density runs at chains x n <= 32768 (8 x 4096,
4 x 8192, 2 x 16384) and faults with an opaque UNAVAILABLE "kernel
fault" (not a clean OOM) above it (16 x 4096, 8 x 8192).
``sample_nuts`` now auto-batches above the envelope
(``mcmc/nuts.py::TPU_CHAIN_ENVELOPE``); this script intentionally forces
a SINGLE over-wide program (``chain_batch=num_chains``) to reproduce the
fault, then demonstrates the auto-batched path succeeding with the same
request.

Expected output on the chip: the forced run errors; the auto run
completes. If the forced run ever SUCCEEDS, the runtime ceiling has
moved — re-measure the envelope and update TPU_CHAIN_ENVELOPE.
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

    for tag, cb in (("forced_single_program", chains), ("auto", None)):
        try:
            t0 = time.perf_counter()
            res = sample_nuts(logp, theta0, jax.random.PRNGKey(0),
                              num_warmup=warmup, num_samples=samples,
                              num_chains=chains, max_depth=6,
                              chain_batch=cb)
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


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--n", type=int, default=4096)
    p.add_argument("--chains", type=int, default=16)
    p.add_argument("--warmup", type=int, default=10)
    p.add_argument("--samples", type=int, default=10)
    a = p.parse_args()
    main(a.n, a.chains, a.warmup, a.samples)
