"""Multi-device tests on a virtual 8-CPU-device mesh: sharded covariance
build + Cholesky, sharded training step, and sharded predict must match the
single-device path to float64 tolerance."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.models import gp as core
from friedrich_tpu.models.optimizer import AdamState, _scaled_step
from friedrich_tpu.parallel import (
    make_matrix_mesh,
    make_sharded_build_and_factor,
    make_sharded_predict,
    make_sharded_train_step,
    shard_state,
)

RNG = np.random.default_rng(7)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 (virtual) devices"
)


def _state(n=48, d=3, cap=64):
    x = jnp.asarray(RNG.normal(size=(n, d)))
    y = jnp.asarray(RNG.normal(size=(n,)))
    kernel = fk.SquaredExp(ls=1.2, ampl=1.5)
    prior = fp.ConstantPrior(c=0.3)
    state, ok = core.make_state(kernel, prior, 0.25, x, y, cap=cap)
    assert bool(ok)
    return state


def test_sharded_build_factor_matches_single_device():
    state = _state()
    mesh = make_matrix_mesh(8)
    build_factor = make_sharded_build_and_factor(mesh)
    l_sharded, ok = build_factor(state.kernel, state.x, state.n, state.noise)
    assert bool(ok)
    np.testing.assert_allclose(
        np.asarray(l_sharded), np.asarray(state.l), rtol=1e-9, atol=1e-11
    )


def test_sharded_train_step_matches_single_device():
    state = _state()
    mesh = make_matrix_mesh(8)
    params = state.kernel.get_params()
    adam = AdamState(params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params))

    ref_state, ref_adam, ref_prog, ref_ok, _ = _scaled_step(
        state, adam, jnp.asarray(1), jnp.asarray(0.05)
    )

    sstate = shard_state(state, mesh)
    step = make_sharded_train_step(mesh, scalable=True)
    out_state, out_adam, out_prog, out_ok = step(
        sstate, adam, jnp.asarray(1), jnp.asarray(0.05)
    )
    assert bool(out_ok) and bool(ref_ok)
    np.testing.assert_allclose(
        np.asarray(out_adam.params), np.asarray(ref_adam.params), rtol=1e-9
    )
    np.testing.assert_allclose(
        float(out_state.noise), float(ref_state.noise), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out_state.l), np.asarray(ref_state.l), rtol=1e-8, atol=1e-10
    )


def test_sharded_predict_matches_single_device():
    state = _state()
    mesh = make_matrix_mesh(8)
    xq = jnp.asarray(RNG.normal(size=(16, 3)))
    mean_ref, var_ref = core.predict_mean_variance(state, xq)
    predict = make_sharded_predict(mesh)
    mean, var = predict(shard_state(state, mesh), xq)
    np.testing.assert_allclose(np.asarray(mean), np.asarray(mean_ref), rtol=1e-9)
    np.testing.assert_allclose(
        np.asarray(var), np.asarray(var_ref), rtol=1e-8, atol=1e-11
    )


def test_dryrun_multichip_entrypoint():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "__graft_entry__.py"
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    mod.dryrun_multichip(8)
    fn, args = mod.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)


def test_sharded_train_step_generic_path():
    """Generic (non-scalable kernel) fit step under 2-D sharding matches the
    single-device step."""
    from friedrich_tpu.models.optimizer import _generic_step

    x = jnp.asarray(RNG.normal(size=(48, 3)))
    y = jnp.asarray(RNG.normal(size=(48,)))
    kernel = fk.RationalQuadratic(alpha=1.1, ls=0.9)
    state, ok = core.make_state(kernel, fp.ZeroPrior(), 0.25, x, y, cap=64)
    assert bool(ok)
    mesh = make_matrix_mesh(8)
    params = jnp.concatenate(
        [state.kernel.get_params(), jnp.log(state.noise)[None]]
    )
    adam = AdamState(params=params, m=jnp.zeros_like(params), v=jnp.zeros_like(params))
    ref_state, ref_adam, _, ref_ok, _ = _generic_step(
        state, adam, jnp.asarray(1), jnp.asarray(0.05)
    )
    step = make_sharded_train_step(mesh, scalable=False)
    out_state, out_adam, _, out_ok = step(
        shard_state(state, mesh), adam, jnp.asarray(1), jnp.asarray(0.05)
    )
    assert bool(out_ok) and bool(ref_ok)
    np.testing.assert_allclose(
        np.asarray(out_adam.params), np.asarray(ref_adam.params), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(out_state.l), np.asarray(ref_state.l), rtol=1e-8, atol=1e-10
    )
