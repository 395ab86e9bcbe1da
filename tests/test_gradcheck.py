"""Finite-difference grounding of the transcribed kernel gradients.

The reference hand-derives every kernel's parameter gradient
(``parameters/kernel.rs``). Wherever that formula IS the true derivative of
the kernel, a central finite difference of our ``pointwise`` must match our
``pointwise_grads`` — a check no shared transcription error can pass,
because the two sides come from different code paths (the formula vs the
kernel value itself).

Wherever the reference's gradient is deliberately NOT the true derivative,
the mismatch itself is pinned (the quirk is a feature of 1e-6 parity):

- ``Matern2.grad_ls`` (``kernel.rs:881-900``): dimensionally odd expression
  that does not even vanish at d = 0 (the true derivative does).
- ``Multiquadric.grad_c`` (``kernel.rs:1052-1058``): denominator uses the
  NON-squared norm while the kernel value uses the squared norm.

Everything else — including the *nonstandard* Exponential kernel, whose
gradient is the true derivative of its own quirky formula — must pass FD.
"""

import numpy as np
import jax.numpy as jnp
import pytest

from friedrich_tpu.kernels import (
    Exponential,
    HyperTan,
    Linear,
    Matern1,
    Matern2,
    Multiquadric,
    Polynomial,
    RationalQuadratic,
    SquaredExp,
)
from friedrich_tpu.ops.distance import pairwise_features


def _feats(kernel, seed=0, n=8, m=6, d=3):
    rng = np.random.default_rng(seed)
    x1 = rng.normal(size=(n, d))
    x2 = rng.normal(size=(m, d))
    return pairwise_features(
        jnp.asarray(x1), jnp.asarray(x2), kernel.needs, method="direct"
    )


def _fd_grads(kernel, feats, h=1e-6):
    """Central finite difference of pointwise w.r.t. each parameter."""
    p0 = np.asarray(kernel.get_params())
    out = []
    for i in range(p0.shape[0]):
        ei = np.zeros_like(p0)
        ei[i] = h
        kp = kernel.with_params(jnp.asarray(p0 + ei))
        km = kernel.with_params(jnp.asarray(p0 - ei))
        out.append(
            (np.asarray(kp.pointwise(feats)) - np.asarray(km.pointwise(feats)))
            / (2 * h)
        )
    return out


TRUE_DERIVATIVE_KERNELS = [
    SquaredExp(ls=0.8, ampl=1.7),
    Exponential(ls=0.9, ampl=1.3),  # quirky formula, true derivative OF it
    Matern1(ls=1.1, ampl=0.6),
    RationalQuadratic(alpha=1.3, ls=0.8),
    Linear(c=0.7),
    Polynomial(alpha=0.8, c=1.5, d=2.0),  # inner > 0 so log(inner) is finite
    HyperTan(alpha=0.4, c=0.2),
    # compositions of true-derivative children stay true derivatives
    SquaredExp(ls=0.8, ampl=1.7) + Matern1(ls=1.1, ampl=0.6),
    SquaredExp(ls=0.8, ampl=1.7) * Linear(c=0.7),
]


@pytest.mark.parametrize(
    "kernel", TRUE_DERIVATIVE_KERNELS, ids=lambda k: type(k).__name__
)
def test_gradients_match_finite_differences(kernel, subtests=None):
    feats = _feats(kernel)
    analytic = [np.asarray(g) for g in kernel.pointwise_grads(feats)]
    numeric = _fd_grads(kernel, feats)
    assert len(analytic) == len(numeric) == kernel.nb_params
    for i, (a, f) in enumerate(zip(analytic, numeric)):
        np.testing.assert_allclose(
            a, f, rtol=1e-5, atol=1e-7,
            err_msg=f"{type(kernel).__name__} param {i}",
        )


def test_matern2_ampl_gradient_is_true_derivative():
    kernel = Matern2(ls=1.2, ampl=0.9)
    feats = _feats(kernel)
    analytic = np.asarray(kernel.pointwise_grads(feats)[1])
    numeric = _fd_grads(kernel, feats)[1]
    np.testing.assert_allclose(analytic, numeric, rtol=1e-5, atol=1e-7)


def test_matern2_ls_gradient_is_the_reference_quirk():
    """``kernel.rs:881-900``: the ls-gradient is NOT the true derivative.
    Pin both facts: (a) it disagrees with FD, (b) it equals the reference
    expression computed independently here (scalar transcription)."""
    ls, ampl = 1.2, 0.9
    kernel = Matern2(ls=ls, ampl=ampl)
    feats = _feats(kernel)
    analytic = np.asarray(kernel.pointwise_grads(feats)[0])
    numeric = _fd_grads(kernel, feats)[0]
    # (a) deliberately NOT the true derivative
    assert np.max(np.abs(analytic - numeric)) > 1e-2
    # the true derivative vanishes at d=0; the reference's does not
    from friedrich_tpu.ops.distance import DIST

    zero_feats = {DIST: jnp.zeros((3,))}
    at_zero = np.asarray(kernel.pointwise_grads(zero_feats)[0])
    assert np.all(np.abs(at_zero) > 0.1)
    # (b) matches an independent scalar transcription of kernel.rs:890-896
    d = np.asarray(feats[DIST])
    l = abs(ls)
    x = np.sqrt(5.0) * d / ls
    expected = (
        np.sign(ls)
        * abs(ampl)
        * ((2.0 * l / 3.0 + 1.0) + d * np.sqrt(5.0) * ((l * l / 3.0 + l + 1.0) / (l * l)))
        * np.exp(-x)
    )
    np.testing.assert_allclose(analytic, expected, rtol=1e-12)


def test_multiquadric_gradient_is_the_reference_quirk():
    """``kernel.rs:1052-1058``: grad uses ``hypot(||d||, c)`` (non-squared)
    while the value uses ``hypot(||d||^2, c)``. Pin the mismatch and the
    formula."""
    c = 0.8
    kernel = Multiquadric(c=c)
    feats = _feats(kernel)
    analytic = np.asarray(kernel.pointwise_grads(feats)[0])
    numeric = _fd_grads(kernel, feats)[0]
    assert np.max(np.abs(analytic - numeric)) > 1e-3
    from friedrich_tpu.ops.distance import DIST, SQDIST

    d = np.asarray(feats[DIST])
    sq = np.asarray(feats[SQDIST])
    np.testing.assert_allclose(analytic, c / np.hypot(d, c), rtol=1e-12)
    # the TRUE derivative of the implemented value, for contrast
    np.testing.assert_allclose(numeric, c / np.hypot(sq, c), rtol=1e-4)


def test_exponential_kernel_is_the_reference_quirk_not_standard():
    """``kernel.rs:660-665``: distance NOT squared, denominator still
    ``2*ls^2`` — differs from the standard exponential kernel
    ``exp(-d/ls)``; pin the exact quirky form."""
    ls, ampl = 0.9, 1.3
    kernel = Exponential(ls=ls, ampl=ampl)
    feats = _feats(kernel)
    from friedrich_tpu.ops.distance import DIST

    d = np.asarray(feats[DIST])
    got = np.asarray(kernel.pointwise(feats))
    np.testing.assert_allclose(
        got, ampl * np.exp(-d / (2.0 * ls * ls)), rtol=1e-12
    )
    standard = ampl * np.exp(-d / ls)
    assert np.max(np.abs(got - standard)) > 1e-3
