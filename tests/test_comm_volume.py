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


def _lowered_allreduce_shapes(storage=None):
    """Lower (without executing) the shard_map factorization and extract
    every all-reduce operand shape + dtype from the stablehlo text."""
    devices = jax.devices()[:8]
    mesh = Mesh(np.array(devices), ("r",))
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
    lines = lowered.as_text().splitlines()
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
