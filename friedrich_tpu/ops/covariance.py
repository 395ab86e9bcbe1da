"""Covariance-matrix builders (the compute core, L2).

TPU-native replacement for ``algebra/mod.rs:41-155``. The reference fills
matrices entry-by-entry with per-pair kernel calls (``algebra/mod.rs:49-53``,
``:70-79``, ``:142-151``); here every build is one fused XLA computation:
pairwise features on the MXU + the kernel's elementwise map + masking.

**Capacity padding.** Training buffers are padded to a static capacity so
that the live row count ``n`` can stay a traced value (jit-stable
``add_samples``, the analogue of the reference's ``EMatrix`` 1.5x growth,
``extendable_matrix.rs:38``). The training covariance is padded with the
IDENTITY outside the live n x n block:

    K_pad = [[K_live, 0], [0, I]]

so ``chol(K_pad) = [[L_live, 0], [0, I]]`` and triangular solves against
zero-padded right-hand sides yield zero in the dead region — every
downstream reduction over the full buffer equals the live reduction (except
``trace(K^-1)``, corrected where used; see ``models/optimizer.py``).
"""

from __future__ import annotations

import jax.numpy as jnp

from .distance import diag_features, pairwise_features

Array = jnp.ndarray


def cross_covariance(kernel, x1: Array, x2: Array, method: str = "gram") -> Array:
    """K(X1, X2): one row per row of x1, one column per row of x2.

    Counterpart of ``make_covariance_matrix`` (``algebra/mod.rs:41-54``).
    """
    feats = pairwise_features(x1, x2, kernel.needs, method=method)
    return kernel.pointwise(feats)


def kernel_diag(kernel, x: Array) -> Array:
    """k(x_i, x_i) per row — the prior variance of each point."""
    feats = diag_features(x, kernel.needs)
    return kernel.pointwise(feats)


def train_covariance_padded(
    kernel, x_pad: Array, n, noise, method: str = "gram"
) -> Array:
    """Padded training covariance: K + noise^2 I on the live block, identity
    on the dead block.

    Counterpart of the matrix built by ``make_cholesky_cov_matrix``
    (``algebra/mod.rs:59-79``): kernel evals plus ``noise^2`` (squared, not
    raw noise — ``algebra/mod.rs:78``) on the diagonal.

    Args:
      x_pad: (cap, d) padded inputs (dead rows' contents are irrelevant).
      n: live row count (traced scalar ok).
      noise: observation-noise standard deviation.
    """
    cap = x_pad.shape[0]
    k = cross_covariance(kernel, x_pad, x_pad, method=method)
    # The diagonal is k(x,x) + noise^2 with EXACTLY zero distance — set it
    # from the analytic per-row kernel diagonal rather than the pairwise
    # tile, whose gram-identity cancellation (|x|^2+|x|^2-2x.x) otherwise
    # puts the matmul's rounding error directly on the pivots (dominant at
    # bf16 MXU precision: ~2^-8 |x|^2 absolute in sqdist).
    kd = kernel_diag(kernel, x_pad) + noise * noise
    idx = jnp.arange(cap)
    eye = jnp.eye(cap, dtype=k.dtype)
    diag = idx[:, None] == idx[None, :]
    k = jnp.where(diag, kd[:, None], k)
    live = (idx[:, None] < n) & (idx[None, :] < n)
    return jnp.where(live, k, eye)


def cross_covariance_train_padded(
    kernel, x_pad: Array, n, xq: Array, method: str = "gram"
) -> Array:
    """K(X_train_pad, Xq) with dead training rows zeroed: (cap, m).

    Zero rows in the dead region make padded triangular solves exact (see
    module docstring). Used by every predict path
    (``gaussian_process/mod.rs:234``, ``:257``, ``:297``, ``:378``).
    """
    c = cross_covariance(kernel, x_pad, xq, method=method)
    idx = jnp.arange(x_pad.shape[0])
    return jnp.where((idx < n)[:, None], c, 0.0)


def gradient_covariances_padded(
    kernel, x_pad: Array, n, method: str = "gram"
) -> Array:
    """Stacked per-parameter covariance gradients, zero outside the live
    block: (p, cap, cap).

    Counterpart of ``make_gradient_covariance_matrices``
    (``algebra/mod.rs:129-155``). The zero dead region means traces and
    quadratic forms over the full buffer equal the live ones.
    """
    feats = pairwise_features(x_pad, x_pad, kernel.needs, method=method)
    grads = kernel.pointwise_grads(feats)
    stacked = jnp.stack(list(grads), axis=0)
    # Diagonal from the analytic zero-distance features, for the same
    # reason as in train_covariance_padded: the gram tile's cancellation
    # puts matmul rounding on the diagonal, which feeds the optimizer's
    # trace terms tr(K^-1 dK) directly.
    dfeats = diag_features(x_pad, kernel.needs)
    dgrads = jnp.stack(list(kernel.pointwise_grads(dfeats)), axis=0)
    cap = x_pad.shape[0]
    idx = jnp.arange(cap)
    diag = idx[:, None] == idx[None, :]
    stacked = jnp.where(diag[None, :, :], dgrads[:, :, None], stacked)
    live = (idx[:, None] < n) & (idx[None, :] < n)
    return jnp.where(live[None, :, :], stacked, 0.0)
