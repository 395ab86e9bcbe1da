"""Communication-volume accounting for the distributed factorization.

The >=80% multi-host efficiency claim (BASELINE.md "Multi-host scaling
model") rests on a quantitative contract: the row-sharded streamed
Cholesky performs ONE dominant collective per panel — the psum broadcast
of the owner's (block, cap) factored row strip — so total factorization
traffic is cap^2 floats (the size of L, streamed once over ICI)
regardless of the device count, plus O(block^2)-sized side broadcasts.
These tests pin that contract on the LOWERED program: if someone adds a
collective to the panel loop, or fattens one, the efficiency model is
invalid and this fails.
"""

import re

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import friedrich_tpu.kernels as fk
from friedrich_tpu.parallel.distributed_cholesky import _build_factor_program

CAP, BLOCK, D = 64, 8, 4


def _allreduce_shapes_from_text(text: str):
    """Extract every all-reduce operand shape + dtype from stablehlo text."""
    lines = text.splitlines()
    # the stablehlo.all_reduce op carries its operand type a few lines
    # below (after the reduction-region block):  `}) : (tensor<8x64xf32>)`
    shapes = []
    for i, line in enumerate(lines):
        if "stablehlo.all_reduce" not in line:
            continue
        for j in range(i, min(i + 8, len(lines))):
            m = re.search(
                r"\}\) : \(tensor<([0-9x]*?)(f32|bf16|i32|f64)>", lines[j]
            )
            if m:
                dims = tuple(
                    int(v) for v in m.group(1).rstrip("x").split("x") if v
                )
                shapes.append((dims, m.group(2)))
                break
    assert shapes, "no all_reduce ops found in the lowered program"
    return shapes


def _mesh8():
    return Mesh(np.array(jax.devices()[:8]), ("r",))


def _lowered_allreduce_shapes(storage=None):
    """Lower (without executing) the shard_map factorization and extract
    every all-reduce operand shape + dtype from the stablehlo text."""
    mesh = _mesh8()
    kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
    leaves, treedef = jax.tree_util.tree_flatten(kern)
    fn = _build_factor_program(
        mesh, treedef, len(leaves), CAP, D, BLOCK, None, "gram", storage
    )
    x = jnp.zeros((CAP, D), jnp.float32)
    lowered = fn.lower(
        x, jnp.asarray([CAP], jnp.int32), jnp.asarray([0.5], jnp.float32),
        *[jnp.asarray(v, jnp.float32) for v in leaves],
    )
    return _allreduce_shapes_from_text(lowered.as_text())


@pytest.fixture(scope="module")
def f32_shapes():
    return _lowered_allreduce_shapes(None)


class TestOnePsumPerPanelContract:
    def test_exactly_one_dominant_collective(self, f32_shapes):
        """ONE (block, cap) broadcast in the panel loop body — the only
        collective whose size scales with cap."""
        dominant = [s for s, _ in f32_shapes if s == (BLOCK, CAP)]
        assert len(dominant) == 1, (
            f"expected exactly one (block, cap) psum per panel, found "
            f"{dominant} among {f32_shapes}"
        )

    def test_side_collectives_are_block_sized(self, f32_shapes):
        """Everything else in the loop is O(block^2) or smaller (panel
        inputs (block, d), diagonal block (block, block), the scalar ok
        reduction) — none may scale with cap."""
        for shape, _ in f32_shapes:
            if shape == (BLOCK, CAP):
                continue
            elems = int(np.prod(shape)) if shape else 1
            assert elems <= BLOCK * BLOCK, (
                f"unexpected large collective {shape} — the comm model "
                f"allows only the one (block, cap) strip broadcast"
            )

    def test_total_traffic_is_cap_squared(self, f32_shapes):
        """Total floats over the factorization = num_panels x per-panel
        traffic ~= cap^2 x (1 + small): the size of L, streamed once,
        independent of device count."""
        num_panels = CAP // BLOCK
        per_panel = sum(int(np.prod(s)) for s, _ in f32_shapes if s)
        total = num_panels * per_panel
        # cap^2 for the strip broadcasts + O(cap * block) for the rest
        assert total <= CAP * CAP + num_panels * (BLOCK * BLOCK + BLOCK * D)
        assert total >= CAP * CAP  # the strip broadcasts alone

    def test_bf16_storage_halves_the_dominant_psum(self):
        """storage='bf16' must carry the (block, cap) strip broadcast in
        bfloat16 — halving ICI bytes — while the small side collectives
        stay in the compute dtype."""
        shapes = _lowered_allreduce_shapes("bf16")
        dominant = [
            (s, dt) for s, dt in shapes if s == (BLOCK, CAP)
        ]
        assert len(dominant) == 1
        assert dominant[0][1] == "bf16", (
            f"bf16 storage must broadcast the row strip in bf16, got "
            f"{dominant[0][1]}"
        )


# ---------------------------------------------------------------------------
# Distributed triangular solves (round 4): the sweeps' collectives carry
# only SOLUTION blocks — (block, m) psums — never factor rows, so a sweep
# costs cap*m (forward) / 2*cap*m (backward) floats over ICI regardless
# of device count. The round-3 sweeps broadcast the owner's (block, cap)
# L strip per panel (cap^2 per sweep); these tests make that regression
# impossible to reintroduce silently (VERDICT r3 #7).
# ---------------------------------------------------------------------------

M = 5  # rhs columns


def _lowered_solve_shapes(transposed, rhs_sharded=False, m=M):
    from friedrich_tpu.parallel.distributed_solve import _build_solve_program

    fn = _build_solve_program(_mesh8(), CAP, m, BLOCK, transposed, rhs_sharded)
    l_mat = jnp.zeros((CAP, CAP), jnp.float32)
    c = jnp.zeros((CAP, m), jnp.float32)
    return _allreduce_shapes_from_text(fn.lower(l_mat, c).as_text())


class TestSolveCommContract:
    def test_forward_one_solution_psum_per_panel(self):
        shapes = _lowered_solve_shapes(transposed=False)
        assert shapes == [((BLOCK, M), "f32")], (
            f"forward sweep must psum exactly one (block, m) solved block "
            f"per panel and nothing else, got {shapes}"
        )

    def test_forward_sharded_rhs_same_contract(self):
        shapes = _lowered_solve_shapes(transposed=False, rhs_sharded=True)
        assert shapes == [((BLOCK, M), "f32")], shapes

    def test_backward_two_solution_psums_per_panel(self):
        shapes = _lowered_solve_shapes(transposed=True)
        assert shapes == [((BLOCK, M), "f32")] * 2, (
            f"backward sweep: one contribution psum + one solved-block "
            f"psum, both (block, m), got {shapes}"
        )

    def test_no_collective_scales_with_cap(self):
        for transposed in (False, True):
            for shape, _ in _lowered_solve_shapes(transposed):
                assert CAP not in shape, (
                    f"solve collective {shape} scales with cap — the "
                    f"sweep comm model (cap*m per sweep) is broken"
                )


class TestFitStepCommContract:
    """One distributed fit iteration (LargeScaleGP._make_fit_step): the
    per-iteration ICI traffic is the refactorization's cap^2 floats (one
    (block, cap) strip psum per panel) plus O(block * probes) solve
    psums — nothing else may scale with cap (VERDICT r3 #7)."""

    def _lowered_step_shapes(self):
        import friedrich_tpu.priors as fp
        from friedrich_tpu.models.optimizer import AdamState
        from friedrich_tpu.parallel.large_scale import LargeScaleGP

        rng = np.random.default_rng(0)
        x = jnp.asarray(rng.normal(size=(CAP, D)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(CAP,)), jnp.float32)
        kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
        gp = LargeScaleGP(
            _mesh8(), kern, fp.ZeroPrior(), 0.5, x, y, block=BLOCK
        )
        step = gp._make_fit_step(scaled=True, convergence_fraction=0.05)
        params = gp.kernel.get_params()
        adam = AdamState(
            params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params)
        )
        probes = gp._probes(4, 0)
        lowered = step.lower(
            gp.l_sharded, gp.kernel, gp.noise, gp.resid, adam, probes,
            jnp.asarray(1),
        )
        return _allreduce_shapes_from_text(lowered.as_text())

    def test_one_dominant_strip_psum_and_bounded_sides(self):
        shapes = self._lowered_step_shapes()
        dominant = [s for s, _ in shapes if s == (BLOCK, CAP)]
        assert len(dominant) == 1, (
            f"expected exactly the refactorization's one (block, cap) "
            f"strip psum per panel, got {dominant} among {shapes}"
        )
        for shape, _ in shapes:
            if shape == (BLOCK, CAP):
                continue
            elems = int(np.prod(shape)) if shape else 1
            assert elems <= BLOCK * BLOCK, (
                f"fit-step side collective {shape} exceeds O(block^2) — "
                f"the per-iteration comm model is broken"
            )
