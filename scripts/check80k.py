"""Validated n=80k bf16-storage run: factor ok flag + prediction sanity.

The factor-throughput numbers in BASELINE.md come from exp_factor, which
times a scalarized factor without asserting the ok flag; this script is
the correctness companion: build+factor at n=80k (bf16 storage), ASSERT
ok, then check posterior mean/variance sanity on held-out and training
points (finite, variance within [0, prior variance], training-point
means correlated with the targets).
"""
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.blocked_solve import (
    blocked_solve_lower, blocked_solve_lower_t,
)
from friedrich_tpu.ops.covariance import (
    cross_covariance_train_padded, kernel_diag,
)
from friedrich_tpu.ops.streamed import streamed_cholesky_factor


def main(n=80000, d=8, m=512):
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.normal(size=(n, d)), jnp.float32)
    y = jnp.asarray(
        np.sin(np.asarray(x)[:, 0]) + 2.0 * rng.normal(size=n), jnp.float32
    )
    kern = fk.SquaredExp(ls=jnp.float32(0.5), ampl=jnp.float32(1.0))
    noise = jnp.float32(2.0)  # bf16-storage envelope: noise^2 > n*2^-15
    t0 = time.perf_counter()
    l_mat, ok = streamed_cholesky_factor(
        kern, x, n, noise, block=4000, solve_blocks=4, diag_blocks=4,
        storage="bf16",
    )
    jax.block_until_ready(l_mat)
    t_factor = time.perf_counter() - t0
    assert bool(ok), "n=80k bf16-storage factorization reported ok=False"

    xq = jnp.asarray(rng.normal(size=(m, d)), jnp.float32)

    @jax.jit
    def predict(l_mat, x, y, xq):
        c = cross_covariance_train_padded(kern, x, n, xq)
        kl = blocked_solve_lower(l_mat, c)
        beta = blocked_solve_lower(l_mat, y)
        mean = kl.T @ beta
        var = kernel_diag(kern, xq) - jnp.sum(kl * kl, axis=0)
        return mean, var

    mean_q, var_q = jax.block_until_ready(predict(l_mat, x, y, xq))
    mean_t, var_t = jax.block_until_ready(predict(l_mat, x, y, x[:m]))
    mq, vq = np.asarray(mean_q), np.asarray(var_q)
    mt = np.asarray(mean_t)
    yt = np.asarray(y[:m])
    prior_var = float(kernel_diag(kern, xq)[0])
    assert np.all(np.isfinite(mq)) and np.all(np.isfinite(vq))
    assert np.all(vq >= -1e-3) and np.all(vq <= prior_var + 1e-3)
    corr = float(np.corrcoef(mt, yt)[0, 1])
    # short ls + large noise: the posterior mean shrinks hard toward the
    # prior, but must still be positively aligned with the targets
    assert corr > 0.1, f"training-point mean decorrelated: {corr}"
    print(json.dumps({
        "exp": "check80k", "n": n, "storage": "bf16", "ok": True,
        "factor_s": round(t_factor, 3),
        "var_range": [float(vq.min()), float(vq.max())],
        "prior_var": prior_var,
        "train_corr": round(corr, 4),
    }))


if __name__ == "__main__":
    main()
