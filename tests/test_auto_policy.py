"""The tuned panel-schedule policy and its public-API plumbing.

Round-2 verdict items: the 0.670 s headline at n=50k required
``block=5000`` reachable only through ``ops/streamed.py`` directly, and
the fixed 1024 default silently fell back to the ~3x-FLOP ``fori_loop``
program above cap = 65,536 (``MAX_UNROLL_PANELS`` cliff). The policy in
``ops/partition.auto_panel_block`` (block ~ cap/10, auto ``diag_blocks``
above the compile-safe monolithic-diagonal width) is now the default for
every streamed factorization, plumbed from ``GaussianProcessBuilder``
through ``GPState`` to ``streamed_cholesky_factor``.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import friedrich_tpu.kernels as fk
from friedrich_tpu import GaussianProcessBuilder
from friedrich_tpu.ops.partition import (
    MAX_MONOLITHIC_DIAG,
    auto_diag_blocks,
    auto_panel_block,
)
from friedrich_tpu.ops.streamed import MAX_UNROLL_PANELS, streamed_cholesky_factor

RNG = np.random.default_rng(11)


class TestPolicy:
    def test_headline_size_matches_measured_optimum(self):
        # the BASELINE.md sweeps: B=5000 is the measured panel optimum at
        # n=50k (round 2: 0.670 s vs 0.909 s at B=2500), and ~1024-wide
        # solve/diag sub-blocks the round-3 optimum (0.567 s)
        from friedrich_tpu.ops.partition import auto_solve_blocks

        assert auto_panel_block(50_000) == 5000
        assert auto_solve_blocks(5000) == 5
        assert auto_diag_blocks(5000) == 5

    @pytest.mark.parametrize(
        "cap", [1024, 8192, 50_000, 65_536, 80_000, 100_000, 131_072]
    )
    def test_no_unroll_cliff(self, cap):
        """The round-2 cliff: cap > 65,536 with the fixed 1024 block fell
        back to the fori program. The policy must keep the panel count
        unrolled-eligible at every practical capacity."""
        block = auto_panel_block(cap)
        assert cap % block == 0
        assert cap // block <= MAX_UNROLL_PANELS
        # and the diagonal factorization stays compile-safe
        sub = auto_diag_blocks(block)
        assert block % sub == 0
        assert block // sub <= MAX_MONOLITHIC_DIAG

    def test_sub_block_policy(self):
        from friedrich_tpu.ops.partition import SUB_TARGET, auto_solve_blocks

        # at/below the target width: no sub-blocking
        assert auto_solve_blocks(SUB_TARGET) == 1
        assert auto_diag_blocks(1000) == 1
        # ~1024-wide steps, snapped to divisors
        assert auto_solve_blocks(2048) == 2
        assert auto_solve_blocks(6250) == 5  # 1250-wide (6 is not a divisor)
        assert auto_diag_blocks(8000) == 8
        assert auto_diag_blocks(10_000) == 10
        # hard compile-safety ceiling always respected
        for b in (5000, 8000, 10_000, 12_500, 20_000):
            assert b // auto_diag_blocks(b) <= MAX_MONOLITHIC_DIAG

    def test_default_block_resolves_to_policy(self):
        """``block=None`` must produce the SAME program as the explicit
        policy block (bitwise-identical factor)."""
        cap = 160
        x = jnp.asarray(RNG.normal(size=(cap, 3)), jnp.float32)
        kern = fk.SquaredExp(ls=jnp.float32(1.0), ampl=jnp.float32(1.0))
        noise = jnp.float32(0.4)
        l_auto, ok_a = streamed_cholesky_factor(kern, x, 150, noise)
        l_explicit, ok_e = streamed_cholesky_factor(
            kern, x, 150, noise, block=auto_panel_block(cap)
        )
        assert bool(ok_a) and bool(ok_e)
        np.testing.assert_array_equal(
            np.asarray(l_auto), np.asarray(l_explicit)
        )


class TestApiPlumbing:
    def _data(self, n=96, d=3):
        x = RNG.normal(size=(n, d))
        y = np.sin(x[:, 0]) + 0.1 * RNG.normal(size=n)
        return x, y

    def test_builder_panel_block_reaches_state(self):
        x, y = self._data()
        gp = (
            GaussianProcessBuilder(x, y)
            .set_backend("streamed")
            .set_panel_block(16)
            .train()
        )
        assert gp.state.block == 16
        assert gp.state.backend == "streamed"

    def test_builder_default_is_auto_policy(self):
        x, y = self._data()
        gp = GaussianProcessBuilder(x, y).set_backend("streamed").train()
        assert gp.state.block is None  # None = auto policy at factor time

    def test_builder_rejects_nonpositive_block(self):
        from friedrich_tpu.utils.errors import ConfigError

        x, y = self._data()
        with pytest.raises(ConfigError):
            GaussianProcessBuilder(x, y).set_panel_block(0)

    def test_explicit_block_changes_the_program(self):
        """The plumbed block must actually reach the factorizer: two
        different explicit blocks give different panel rounding (f32),
        and each matches the directly-invoked op."""
        x, y = self._data(n=128)
        state16 = (
            GaussianProcessBuilder(x, y)
            .set_dtype("float32")
            .set_backend("streamed")
            .set_panel_block(16)
            .train()
            .state
        )
        direct16, ok = streamed_cholesky_factor(
            state16.kernel, state16.x, state16.n, state16.noise, block=16
        )
        assert bool(ok)
        np.testing.assert_array_equal(
            np.asarray(state16.l), np.asarray(direct16)
        )

    def test_factor_precision_reaches_state_and_survives_reload(
        self, tmp_path
    ):
        x, y = self._data()
        gp = (
            GaussianProcessBuilder(x, y)
            .set_dtype("float32")
            .set_backend("streamed")
            .set_factor_precision("f32")
            .train()
        )
        assert gp.state.precision == "f32"
        path = str(tmp_path / "gp_prec.npz")
        gp.save(path)
        from friedrich_tpu import GaussianProcess

        gp2 = GaussianProcess.load(path)
        assert gp2.state.precision == "f32"
        gp2.set_hyperparameters(noise=0.4)  # rebuild keeps the precision
        assert gp2.state.precision == "f32"

    def test_factor_precision_validation(self):
        from friedrich_tpu.utils.errors import ConfigError

        x, y = self._data()
        with pytest.raises(ConfigError):
            GaussianProcessBuilder(x, y).set_factor_precision("f16")
        with pytest.raises(ConfigError):
            # precision requires the streamed backend
            (
                GaussianProcessBuilder(x, y)
                .set_backend("dense")
                .set_factor_precision("f32")
                .train()
            )

    def test_block_survives_save_load_and_rebuild(self, tmp_path):
        x, y = self._data()
        gp = (
            GaussianProcessBuilder(x, y)
            .set_backend("streamed")
            .set_panel_block(16)
            .train()
        )
        path = str(tmp_path / "gp.npz")
        gp.save(path)
        from friedrich_tpu import GaussianProcess

        gp2 = GaussianProcess.load(path)
        assert gp2.state.block == 16
        # a hyperparameter rebuild keeps the schedule
        gp2.set_hyperparameters(noise=0.3)
        assert gp2.state.block == 16


def test_facade_build_factor_lowers_identical_at_headline_shape():
    """The benchmark's facade path (GaussianProcess.new -> make_state ->
    _build_factor) and the direct op must lower to the SAME program at
    the headline shape (n=50k, d=8, f32) — kills the round-3 caveat that
    bench.py measured something the public API does not run (VERDICT #4).
    Lowering only (no 10 GB buffer, no compile): the unrolled streamed
    factorizer's panel program is fully determined at trace time."""
    import jax

    from friedrich_tpu.models.gp import _build_factor

    cap = 50_000
    n_arr = jnp.asarray(cap, jnp.int32)
    kernel = fk.SquaredExp(
        ls=jnp.asarray(0.5, jnp.float32), ampl=jnp.asarray(1.0, jnp.float32)
    )
    noise = jnp.asarray(1.0, jnp.float32)
    x_shape = jax.ShapeDtypeStruct((cap, 8), jnp.float32)

    facade = jax.jit(
        lambda x: _build_factor(
            kernel, x, n_arr, noise, None, "gram", "streamed"
        )
    )
    direct = jax.jit(
        lambda x: streamed_cholesky_factor(kernel, x, n_arr, noise)
    )
    text_facade = facade.lower(x_shape).as_text()
    text_direct = direct.lower(x_shape).as_text()
    # normalize the jit wrapper's module/function naming, keep the body
    strip = lambda t: "\n".join(
        line for line in t.splitlines()
        if not line.lstrip().startswith(("module @", "func.func", "//"))
    )
    assert strip(text_facade) == strip(text_direct)


def test_fused_constructor_donates_factor_workspace_at_headline_shape():
    """The fused state constructor must DONATE the (cap, cap) workspace
    into the factor output — the single-factor HBM discipline that keeps
    n=50k f32 construction inside a 16 GB chip (without the alias XLA
    keeps a second live L; OOM re-confirmed on hardware round 4). Pinned
    on the LOWERED program at the headline shape, lowering only."""
    import re

    import jax

    import friedrich_tpu.priors as fp
    from friedrich_tpu.models.gp import _make_state_fused_streamed

    cap = 50_000
    kernel = fk.SquaredExp(
        ls=jnp.asarray(0.5, jnp.float32), ampl=jnp.asarray(1.0, jnp.float32)
    )
    lowered = _make_state_fused_streamed.lower(
        kernel, fp.ZeroPrior(),
        jax.ShapeDtypeStruct((cap, 8), jnp.float32),
        jax.ShapeDtypeStruct((cap,), jnp.float32),
        jnp.asarray(cap, jnp.int32),
        jnp.asarray(1.0, jnp.float32),
        jax.ShapeDtypeStruct((cap, cap), jnp.float32),
        cap=cap, eps=None, method="gram", backend="streamed",
        storage=None, block=None, precision=None,
    )
    text = lowered.as_text()
    # exactly one donated input, and it is the (cap, cap) workspace;
    # outputs are (x_pad, r_pad, l_pad, ok) so the factor is output 2
    attrs = re.findall(r"tf\.aliasing_output = (\d+)", text)
    assert attrs == ["2"], attrs
    sig = next(
        line for line in text.splitlines() if "tf.aliasing_output" in line
    )
    assert f"tensor<{cap}x{cap}xf32>" in sig
