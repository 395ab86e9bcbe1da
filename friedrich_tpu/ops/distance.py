"""Pairwise feature (distance / inner-product) computation.

TPU-first replacement for the reference's per-pair kernel closures
(``algebra/mod.rs:49-53``, one ``kernel.kernel(&x, &y)`` call per matrix
entry). Here whole tiles of pairwise features are produced with MXU matmuls
and the kernel's scalar map is applied elementwise (fused by XLA):

    sqdist(X1, X2) = ||x||^2 + ||y||^2 - 2 * X1 @ X2^T   (one GEMM)

Kernels declare which features they need (``dot``, ``sqdist``, ``dist``) and
each feature is computed at most once per covariance build, shared across
Sum/Prod kernel compositions.

Three squared-distance implementations:

- ``gram``: the GEMM identity above — O(n*m*d) FLOPs on the MXU; small
  negative rounding residue clamped to zero. Default, fastest.
- ``gram_bf16``: the same identity with the inputs cast to bfloat16 for
  the GEMM and float32 MXU accumulation (``preferred_element_type``); the
  squared norms stay full-precision. The SURVEY §7 dtype-policy
  performance path: ~2-4x GEMM rate on TPU MXUs at a relative feature
  error of ~2^-8 from the input rounding (documented in BASELINE.md).
  Output dtype is unchanged (f32), so everything downstream — the kernel's
  elementwise map, the factorization — runs at full precision.
- ``direct``: broadcasted (x1-x2)^2 sum — bit-closer to the reference's
  ``(x1 - x2).norm_squared()`` (``kernel.rs:558``), O(n*m*d) memory; used
  for high-accuracy small-n paths.
"""

from __future__ import annotations

from typing import FrozenSet

import jax.numpy as jnp

Array = jnp.ndarray

DOT = "dot"
SQDIST = "sqdist"
DIST = "dist"


def pairwise_features(
    x1: Array,
    x2: Array,
    needs: FrozenSet[str],
    method: str = "gram",
) -> dict[str, Array]:
    """Compute the pairwise features required by a kernel.

    Args:
      x1: (n, d) rows.
      x2: (m, d) rows.
      needs: subset of {"dot", "sqdist", "dist"}.
      method: "gram" (MXU GEMM identity) or "direct" (broadcast diff).

    Returns:
      dict mapping feature name -> (n, m) array.
    """
    feats: dict[str, Array] = {}
    need_sq = SQDIST in needs or DIST in needs
    gram_like = method in ("gram", "gram_bf16")
    dot = None
    if DOT in needs or (need_sq and gram_like):
        if method == "gram_bf16":
            # bf16 inputs, f32 MXU accumulation; result back in x1.dtype
            dot = jnp.dot(
                x1.astype(jnp.bfloat16),
                x2.astype(jnp.bfloat16).T,
                preferred_element_type=jnp.float32,
            ).astype(x1.dtype)
        else:
            dot = jnp.dot(x1, x2.T, preferred_element_type=x1.dtype)
    if DOT in needs:
        feats[DOT] = dot
    if need_sq:
        if gram_like:
            n1 = jnp.sum(x1 * x1, axis=-1)
            n2 = jnp.sum(x2 * x2, axis=-1)
            sq = n1[:, None] + n2[None, :] - 2.0 * dot
            sq = jnp.maximum(sq, 0.0)
        elif method == "direct":
            diff = x1[:, None, :] - x2[None, :, :]
            sq = jnp.sum(diff * diff, axis=-1)
        else:
            raise ValueError(f"unknown distance method {method!r}")
        feats[SQDIST] = sq
        if DIST in needs:
            feats[DIST] = jnp.sqrt(sq)
    return feats


def diag_features(x: Array, needs: FrozenSet[str]) -> dict[str, Array]:
    """Features of each row paired with itself: sqdist=dist=0, dot=||x||^2.

    Used for the k(x, x) diagonal in predictive variance
    (reference ``gaussian_process/mod.rs:266-269``).
    """
    feats: dict[str, Array] = {}
    n = x.shape[0]
    if DOT in needs:
        feats[DOT] = jnp.sum(x * x, axis=-1)
    if SQDIST in needs:
        feats[SQDIST] = jnp.zeros((n,), dtype=x.dtype)
    if DIST in needs:
        feats[DIST] = jnp.zeros((n,), dtype=x.dtype)
    return feats
