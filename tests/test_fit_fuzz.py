"""Fit fuzzing across all 9 kernels with optimizer-induced illegal
parameters (VERDICT-r1 item 8).

The reference documents that its optimizer may hand kernels ILLEGAL
(negative) parameter values and that implementations must sanitize
(``kernel.rs:57-58, 66-67``); concrete kernels use ``abs``/``signum``
(e.g. ``kernel.rs:556-560``). This matrix pins, per kernel x fit path:

- sanitized kernels fit cleanly from negative/zero starts (finite
  parameters, finite predictions, no NaN escape);
- kernels whose reference formulas genuinely produce NaN on illegal
  inputs (Polynomial's ``log(inner)`` gradient with ``inner < 0``,
  ``kernel.rs:459-472``) fail the SAME way — parity-faithful NaN, which
  this engine surfaces as a structured ``CholeskyError`` instead of the
  reference's panic;
- scalable kernels are additionally forced down the GENERIC path via a
  non-scalable composition (KernelSum is scalable iff both children are,
  ``kernel.rs:150-153``).
"""

import numpy as np
import jax.numpy as jnp
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.models.optimizer import fit_kernel_noise
from friedrich_tpu.utils.errors import CholeskyError

RNG = np.random.default_rng(7)


def _data(n=14, d=2, positive_dot=False):
    x = RNG.normal(size=(n, d))
    if positive_dot:
        x = np.abs(x) + 0.5  # all pairwise dots strictly positive
    y = np.sin(x.sum(axis=1)) + 0.1 * RNG.normal(size=n)
    return x, y


def _fit(kernel, x, y, iters=3, eps=None):
    gp = ft.GaussianProcess.new(fp.ZeroPrior(), kernel, 0.3, eps, x, y)
    state = fit_kernel_noise(
        gp.state, max_iter=iters, convergence_fraction=1e-12
    )
    return state


# -- sanitized kernels: illegal starts fit cleanly ---------------------------

# Per-case expected outcome. "psd": the kernel is PSD at this start and
# fits cleanly with no epsilon. "eps": indefinite K — construction without
# epsilon raises; with a large-enough epsilon the substituting
# factorization succeeds and the fit stays finite. "garbage": K is so
# indefinite (Multiquadric is conditionally negative definite; Linear with
# c<0) that even nalgebra's substitute semantics explode — each bad pivot's
# column feeds a squaring trailing update, overflowing to inf/NaN. The
# reference returns that garbage factor SILENTLY; this engine detects the
# non-finite factor and raises CholeskyError at any epsilon.
ILLEGAL_STARTS = [
    ("squaredexp-neg", fk.SquaredExp(ls=-0.8, ampl=-1.3), True, "psd"),
    ("exponential-neg", fk.Exponential(ls=-0.9, ampl=-0.7), True, "psd"),
    ("matern1-neg", fk.Matern1(ls=-1.1, ampl=-0.6), True, "psd"),
    ("matern2-neg", fk.Matern2(ls=-1.2, ampl=-0.9), True, "psd"),
    ("rq-neg-ls", fk.RationalQuadratic(alpha=1.3, ls=-0.8), False, "psd"),
    ("linear-neg-c", fk.Linear(c=-0.4), False, "garbage"),
    ("linear-zero-c", fk.Linear(c=0.0), False, "psd"),  # zero -> 1e-8 init
    ("hypertan-neg", fk.HyperTan(alpha=-0.4, c=-0.2), False, "eps"),
    ("multiquadric-neg-c", fk.Multiquadric(c=-0.8), False, "garbage"),
    ("multiquadric-zero-c", fk.Multiquadric(c=0.0), False, "garbage"),
    ("polynomial-posdot", fk.Polynomial(alpha=0.8, c=1.5, d=2.0), False, "psd"),
]


@pytest.mark.parametrize(
    "name,kernel,scaled,outcome",
    ILLEGAL_STARTS,
    ids=[c[0] for c in ILLEGAL_STARTS],
)
def test_fit_survives_illegal_start(name, kernel, scaled, outcome):
    # Polynomial's grad_d needs inner > 0 to stay finite (see below)
    x, y = _data(positive_dot=name.startswith("polynomial"))
    assert kernel.is_scalable == scaled
    if outcome == "psd":
        state = _fit(kernel, x, y)
    elif outcome == "eps":
        with pytest.raises(CholeskyError):
            _fit(kernel, x, y)
        state = _fit(kernel, x, y, eps=1.0)
    else:  # "garbage": detected at construction regardless of epsilon
        with pytest.raises(CholeskyError):
            _fit(kernel, x, y)
        with pytest.raises(CholeskyError):
            _fit(kernel, x, y, eps=1.0)
        return
    params = np.asarray(state.kernel.get_params())
    assert np.all(np.isfinite(params)), params
    assert np.isfinite(float(state.noise))
    xq = RNG.normal(size=(5, x.shape[1]))
    if name.startswith("polynomial"):
        xq = np.abs(xq) + 0.5
    from friedrich_tpu.models.gp import predict_mean

    mu = np.asarray(predict_mean(state, jnp.asarray(xq)))
    assert np.all(np.isfinite(mu))


# -- scalable kernels through the GENERIC path -------------------------------


@pytest.mark.parametrize(
    "kernel",
    [
        fk.SquaredExp(ls=-0.8, ampl=1.3),
        fk.Exponential(ls=0.9, ampl=-0.7),
        fk.Matern1(ls=-1.1, ampl=-0.6),
        fk.Matern2(ls=1.2, ampl=-0.9),
    ],
    ids=["squaredexp", "exponential", "matern1", "matern2"],
)
def test_scalable_kernel_forced_generic_path(kernel):
    """KernelSum with a non-scalable child is non-scalable
    (``kernel.rs:150-153``) — same kernel family, generic ADAM path."""
    x, y = _data()
    composed = kernel + fk.Linear(c=0.3)
    assert not composed.is_scalable
    state = _fit(composed, x, y)
    assert np.all(np.isfinite(np.asarray(state.kernel.get_params())))
    assert np.isfinite(float(state.noise))


# -- parity-faithful NaN: Polynomial's log(inner) gradient -------------------


def test_polynomial_negative_inner_nan_parity():
    """``kernel.rs:459-472``: grad_d = ln(inner) * inner^d — NaN whenever
    any pairwise inner product is negative, in the reference and here. The
    NaN reaches the ADAM parameters, the rebuilt covariance fails, and the
    engine raises the structured CholeskyError (the reference would panic
    at its next Cholesky). Pinned as parity-faithful failure, not a bug."""
    x, y = _data(positive_dot=False)  # mixed-sign dots
    kernel = fk.Polynomial(alpha=0.8, c=0.0, d=2.0)
    # confirm the premise: some inner products really are negative
    dots = x @ x.T * 0.8
    assert (dots < 0).any()
    with pytest.raises(CholeskyError):
        _fit(kernel, x, y, iters=4)


def test_polynomial_gradient_nan_is_formula_faithful():
    """The NaN comes from the transcribed formula itself (log of a
    negative), not from an implementation accident."""
    from friedrich_tpu.ops.distance import DOT

    kernel = fk.Polynomial(alpha=1.0, c=0.0, d=2.0)
    feats = {DOT: jnp.asarray([-1.0, 2.0])}
    grads = kernel.pointwise_grads(feats)
    grad_d = np.asarray(grads[2])
    assert np.isnan(grad_d[0])  # log(-1) * 1
    assert np.isfinite(grad_d[1])
