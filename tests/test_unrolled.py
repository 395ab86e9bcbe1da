"""Trace-time-unrolled panel programs vs their fori_loop twins.

The unrolled streamed factorizer and unrolled blocked solves
(``ops/streamed.py``, ``ops/blocked_solve.py``) are the round-2 large-n
performance paths: static triangular shapes reach the theoretical MAC
count and keep the factor out of every ``while``-loop carry (single-L
peak memory — the property that lets n=50k f32 fit a 16 GB chip).
These tests pin them against the constant-size fori_loop programs and
NumPy f64 oracles, on both dtypes and through the eps-substitute path.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import friedrich_tpu.kernels as fk
from friedrich_tpu.ops.blocked_solve import (
    blocked_cho_solve,
    blocked_solve_lower,
    blocked_solve_lower_t,
)
from friedrich_tpu.ops.streamed import streamed_cholesky_factor

RNG = np.random.default_rng(7)


def _factor_pair(cap, n, block, eps=None, dtype=jnp.float32):
    x = jnp.asarray(RNG.normal(size=(cap, 3)), dtype)
    kern = fk.Matern2(ls=dtype(1.1), ampl=dtype(0.8))
    noise = dtype(0.4)
    lu, oku = streamed_cholesky_factor(
        kern, x, n, noise, eps=eps, block=block, unroll=True
    )
    lf, okf = streamed_cholesky_factor(
        kern, x, n, noise, eps=eps, block=block, unroll=False
    )
    return lu, oku, lf, okf


@pytest.mark.parametrize("cap,n", [(64, 64), (96, 70)])
def test_unrolled_factor_matches_fori(cap, n):
    lu, oku, lf, okf = _factor_pair(cap, n, block=16)
    assert bool(oku) and bool(okf)
    # fat-K downdate reorders the accumulation vs the fori chunks:
    # agreement is to f32 rounding, not bit-identical
    np.testing.assert_allclose(np.asarray(lu), np.asarray(lf), atol=5e-6)


def test_unrolled_factor_eps_path_matches_fori():
    lu, oku, lf, okf = _factor_pair(64, 50, block=16, eps=1e-4)
    assert bool(oku) and bool(okf)
    # fat-K downdate reorders the accumulation vs the fori chunks:
    # agreement is to f32 rounding, not bit-identical
    np.testing.assert_allclose(np.asarray(lu), np.asarray(lf), atol=5e-6)


def test_unrolled_factor_single_panel():
    # cap == block: the degenerate no-below-rows case
    lu, oku, lf, okf = _factor_pair(32, 32, block=32)
    assert bool(oku) and bool(okf)
    # fat-K downdate reorders the accumulation vs the fori chunks:
    # agreement is to f32 rounding, not bit-identical
    np.testing.assert_allclose(np.asarray(lu), np.asarray(lf), atol=5e-6)


@pytest.mark.parametrize("unroll", [True, False])
@pytest.mark.parametrize("precision", ["bf16", "f32x3", "f32"])
def test_precision_modes(precision, unroll):
    """Every precision mode produces a valid factor on both program
    shapes.  On CPU all modes compute f32-exact products, so the factors
    agree tightly; the mode distinction is a TPU MXU pass-count choice
    (measured ladder in BASELINE.md "Matmul precision on TPU")."""
    cap = n = 128
    x = jnp.asarray(RNG.normal(size=(cap, 3)), jnp.float32)
    kern = fk.SquaredExp(ls=jnp.float32(0.9), ampl=jnp.float32(1.0))
    noise = jnp.float32(0.5)
    l_ref, ok_ref = streamed_cholesky_factor(
        kern, x, n, noise, block=32, unroll=unroll
    )
    l_mode, ok_mode = streamed_cholesky_factor(
        kern, x, n, noise, block=32, unroll=unroll, precision=precision
    )
    assert bool(ok_ref) and bool(ok_mode)
    k_ref = np.asarray(l_ref) @ np.asarray(l_ref).T
    k_mode = np.asarray(l_mode) @ np.asarray(l_mode).T
    np.testing.assert_allclose(k_mode, k_ref, atol=3e-2)


def test_precision_gate():
    x = jnp.asarray(RNG.normal(size=(64, 3)), jnp.float32)
    kern = fk.SquaredExp(ls=jnp.float32(0.9), ampl=jnp.float32(1.0))
    with pytest.raises(ValueError):
        streamed_cholesky_factor(
            kern, x, 64, jnp.float32(0.5), block=16, precision="fp8"
        )


def _spd_factor(n, dtype):
    a = RNG.normal(size=(n, n))
    spd = a @ a.T + n * np.eye(n)
    return jnp.asarray(np.linalg.cholesky(spd), dtype), spd


@pytest.mark.parametrize("dtype,tol", [(jnp.float32, 2e-5), (jnp.float64, 1e-12)])
def test_unrolled_solves_match_numpy(dtype, tol):
    n, m, b = 96, 5, 16
    l_mat, spd = _spd_factor(n, dtype)
    c = jnp.asarray(RNG.normal(size=(n, m)), dtype)
    l64 = np.asarray(l_mat, np.float64)
    c64 = np.asarray(c, np.float64)
    for unroll in (True, False):
        yf = blocked_solve_lower(l_mat, c, block=b, unroll=unroll)
        yt = blocked_solve_lower_t(l_mat, c, block=b, unroll=unroll)
        np.testing.assert_allclose(
            np.asarray(yf, np.float64), np.linalg.solve(l64, c64), atol=tol
        )
        np.testing.assert_allclose(
            np.asarray(yt, np.float64), np.linalg.solve(l64.T, c64), atol=tol
        )


def test_unrolled_cho_solve_1d_rhs():
    n, b = 64, 16
    l_mat, spd = _spd_factor(n, jnp.float64)
    c = jnp.asarray(RNG.normal(size=n), jnp.float64)
    got = blocked_cho_solve(l_mat, c, block=b, unroll=True)
    want = np.linalg.solve(
        np.asarray(l_mat, np.float64) @ np.asarray(l_mat, np.float64).T,
        np.asarray(c, np.float64),
    )
    assert got.shape == (n,)
    np.testing.assert_allclose(np.asarray(got), want, atol=1e-10)


class TestSolveBlocks:
    """Sub-blocked panel solves (``solve_blocks`` / ``rsolve_lower_t_blocked``):
    a headline-op FLOP knob that must not move results beyond f32 rounding."""

    @pytest.mark.parametrize("sub", [2, 4])
    def test_rsolve_blocked_matches_plain(self, sub):
        from friedrich_tpu.ops.cholesky import (
            rsolve_lower_t, rsolve_lower_t_blocked,
        )

        b, m = 32, 80
        a = RNG.normal(size=(b, b))
        ld = jnp.asarray(np.linalg.cholesky(a @ a.T + b * np.eye(b)), jnp.float32)
        s = jnp.asarray(RNG.normal(size=(m, b)), jnp.float32)
        plain = rsolve_lower_t(ld, s)
        blocked = rsolve_lower_t_blocked(ld, s, sub)
        np.testing.assert_allclose(
            np.asarray(blocked), np.asarray(plain), atol=2e-5
        )

    def test_rsolve_blocked_f64_oracle(self):
        from friedrich_tpu.ops.cholesky import rsolve_lower_t_blocked

        b, m = 24, 40
        a = RNG.normal(size=(b, b))
        ld64 = np.linalg.cholesky(a @ a.T + b * np.eye(b))
        s64 = RNG.normal(size=(m, b))
        want = s64 @ np.linalg.inv(ld64).T
        got = rsolve_lower_t_blocked(
            jnp.asarray(ld64, jnp.float32), jnp.asarray(s64, jnp.float32), 4
        )
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)

    @pytest.mark.parametrize("sub", [2, 4])
    def test_unrolled_factor_solve_blocks(self, sub):
        x = jnp.asarray(RNG.normal(size=(96, 3)), jnp.float32)
        kern = fk.Matern2(ls=jnp.float32(1.1), ampl=jnp.float32(0.8))
        noise = jnp.float32(0.4)
        base, ok0 = streamed_cholesky_factor(
            kern, x, 80, noise, block=16, unroll=True
        )
        lsub, ok1 = streamed_cholesky_factor(
            kern, x, 80, noise, block=16, unroll=True, solve_blocks=sub
        )
        assert bool(ok0) and bool(ok1)
        np.testing.assert_allclose(
            np.asarray(lsub), np.asarray(base), atol=5e-6
        )

    @pytest.mark.parametrize("sub", [2, 4])
    def test_unrolled_factor_diag_blocks(self, sub):
        x = jnp.asarray(RNG.normal(size=(96, 3)), jnp.float32)
        kern = fk.Matern2(ls=jnp.float32(1.1), ampl=jnp.float32(0.8))
        noise = jnp.float32(0.4)
        base, ok0 = streamed_cholesky_factor(
            kern, x, 80, noise, block=16, unroll=True
        )
        lsub, ok1 = streamed_cholesky_factor(
            kern, x, 80, noise, block=16, unroll=True, diag_blocks=sub,
            solve_blocks=sub,
        )
        assert bool(ok0) and bool(ok1)
        np.testing.assert_allclose(
            np.asarray(lsub), np.asarray(base), atol=5e-6
        )

    @staticmethod
    def _donate_lowered_text(kern, x, n, noise, diag_blocks):
        """Lower (without executing) the HOST-level donate-path program."""
        from friedrich_tpu.ops.streamed import _streamed_unrolled_donate

        leaves, treedef = jax.tree_util.tree_flatten(kern)
        l0 = jnp.zeros((x.shape[0],) * 2, x.dtype)
        lowered = _streamed_unrolled_donate.lower(
            tuple(leaves), treedef, x, jnp.asarray(n, jnp.int32), noise,
            None, 16, "gram", l0, fused=False, precision=None,
            solve_blocks=1, diag_blocks=diag_blocks,
        )
        return lowered.as_text()

    @pytest.mark.parametrize("sub", [2, 4])
    def test_diag_blocks_reaches_donate_program(self, sub):
        """Regression for the round-2 bug where the host-level donate path
        silently dropped ``diag_blocks`` (ran the monolithic diagonal
        factorization regardless): count the native cholesky ops in the
        LOWERED donate-path program — with ``diag_blocks=sub`` each of the
        6 panels must factor ``sub`` sub-blocks instead of 1."""
        x = jnp.asarray(RNG.normal(size=(96, 3)), jnp.float32)
        kern = fk.Matern2(ls=jnp.float32(1.1), ampl=jnp.float32(0.8))
        noise = jnp.float32(0.4)
        base_text = self._donate_lowered_text(kern, x, 80, noise, 1)
        sub_text = self._donate_lowered_text(kern, x, 80, noise, sub)

        def chol_ops(text):
            low = text.lower()
            return max(low.count("potrf"), low.count("cholesky"))

        n_base, n_sub = chol_ops(base_text), chol_ops(sub_text)
        num_panels = 96 // 16
        assert n_base >= num_panels, (
            "lowering did not expose the factorization ops"
        )
        # each of the 6 panels factors `sub` sub-blocks instead of 1
        assert n_sub - n_base == (sub - 1) * num_panels, (
            f"diag_blocks={sub} did not reach the donate-path program: "
            f"{n_sub} cholesky ops vs {n_base} at diag_blocks=1"
        )

    def test_diag_blocks_host_and_jit_programs_agree(self):
        """Host-level (donate) and traced (inline) calls must compute the
        SAME math for the same arguments (before the round-2 fix the host
        path silently ran diag_blocks=1). Bitwise identity across separate
        XLA compilations is not guaranteed (fusion differs when inlined in
        an outer jit), so this pins f32-rounding-level agreement; the
        structural guarantee is the lowered-program op count above."""
        x = jnp.asarray(RNG.normal(size=(96, 3)), jnp.float32)
        kern = fk.Matern2(ls=jnp.float32(1.1), ampl=jnp.float32(0.8))
        noise = jnp.float32(0.4)
        l_host, ok_h = streamed_cholesky_factor(
            kern, x, 80, noise, block=16, unroll=True, diag_blocks=4
        )
        l_jit, ok_j = jax.jit(
            lambda xx, s: streamed_cholesky_factor(
                kern, xx, 80, s, block=16, unroll=True, diag_blocks=4
            )
        )(x, noise)
        assert bool(ok_h) and bool(ok_j)
        np.testing.assert_allclose(
            np.asarray(l_host), np.asarray(l_jit), atol=2e-6
        )

    def test_blocked_diag_cholesky_f64_oracle(self):
        from friedrich_tpu.ops.cholesky import blocked_diag_cholesky

        b = 64
        a = RNG.normal(size=(b, b))
        spd = a @ a.T + b * np.eye(b)
        want = np.linalg.cholesky(spd)
        got = blocked_diag_cholesky(jnp.asarray(spd, jnp.float32), 4)
        np.testing.assert_allclose(np.asarray(got), want, atol=5e-4)
        # f64 inputs fall back to the native factorization unchanged
        got64 = blocked_diag_cholesky(jnp.asarray(spd), 4)
        np.testing.assert_allclose(np.asarray(got64), want, atol=1e-10)

    def test_diag_blocks_must_divide(self):
        x = jnp.asarray(RNG.normal(size=(32, 3)), jnp.float32)
        kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
        with pytest.raises(ValueError, match="diag_blocks"):
            streamed_cholesky_factor(
                kern, x, 32, jnp.float32(0.3), block=16, unroll=True,
                diag_blocks=3,
            )

    def test_solve_blocks_must_divide(self):
        x = jnp.asarray(RNG.normal(size=(32, 3)), jnp.float32)
        kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
        with pytest.raises(ValueError, match="solve_blocks"):
            streamed_cholesky_factor(
                kern, x, 32, jnp.float32(0.3), block=16, unroll=True,
                solve_blocks=3,
            )


class TestWidthSchedule:
    """Uneven per-panel width schedules (unrolled path only)."""

    def test_schedule_matches_uniform(self):
        x = jnp.asarray(RNG.normal(size=(96, 3)), jnp.float32)
        kern = fk.Matern2(ls=jnp.float32(1.1), ampl=jnp.float32(0.8))
        noise = jnp.float32(0.4)
        base, ok0 = streamed_cholesky_factor(
            kern, x, 80, noise, block=16, unroll=True
        )
        sched, ok1 = streamed_cholesky_factor(
            kern, x, 80, noise, block=(8, 8, 16, 16, 24, 24)
        )
        assert bool(ok0) and bool(ok1)
        np.testing.assert_allclose(
            np.asarray(sched), np.asarray(base), atol=5e-6
        )

    def test_schedule_with_eps_and_solve_blocks(self):
        x = jnp.asarray(RNG.normal(size=(64, 3)), jnp.float32)
        kern = fk.SquaredExp(ls=jnp.float32(0.9), ampl=jnp.float32(1.0))
        noise = jnp.float32(0.3)
        base, ok0 = streamed_cholesky_factor(
            kern, x, 64, noise, eps=1e-4, block=16, unroll=True
        )
        sched, ok1 = streamed_cholesky_factor(
            kern, x, 64, noise, eps=1e-4, block=[16, 16, 32], solve_blocks=4
        )
        assert bool(ok0) and bool(ok1)
        np.testing.assert_allclose(
            np.asarray(sched), np.asarray(base), atol=5e-6
        )

    def test_schedule_validation(self):
        x = jnp.asarray(RNG.normal(size=(32, 3)), jnp.float32)
        kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
        with pytest.raises(ValueError, match="sum to the capacity"):
            streamed_cholesky_factor(
                kern, x, 32, jnp.float32(0.3), block=(16, 8)
            )
        with pytest.raises(ValueError, match="unroll=True"):
            streamed_cholesky_factor(
                kern, x, 32, jnp.float32(0.3), block=(16, 16), unroll=False
            )
