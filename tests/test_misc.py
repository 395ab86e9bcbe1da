"""Remaining surface coverage: conversion edge cases, MVN failure path,
profiling utilities, config helpers."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu as ft
from friedrich_tpu.conversion import as_input_matrix, as_output_vector
from friedrich_tpu.models.multivariate_normal import MultivariateNormal
from friedrich_tpu.utils.errors import ShapeError
from friedrich_tpu.utils.profiling import annotate, timed


def test_conversion_variants():
    m, a = as_input_matrix([1.0, 2.0, 3.0])
    assert m.shape == (1, 3) and a.kind == "scalar"
    m, a = as_input_matrix([[1.0], [2.0]])
    assert m.shape == (2, 1) and a.kind == "list"
    m, a = as_input_matrix(np.zeros((4, 2)))
    assert m.shape == (4, 2) and a.kind == "numpy"
    m, a = as_input_matrix(np.zeros(3))  # 1-D numpy = one sample
    assert m.shape == (1, 3) and a.kind == "scalar"
    m, a = as_input_matrix(jnp.zeros((4, 2)))
    assert a.kind == "jax"
    y = as_output_vector(np.zeros((5, 1)))  # column vector flattens
    assert y.shape == (5,)
    with pytest.raises(ShapeError):
        as_input_matrix([])
    with pytest.raises(ShapeError):
        as_input_matrix(np.zeros((2, 2, 2)))
    with pytest.raises(ShapeError):
        as_output_vector(np.zeros((5, 2)))
    with pytest.raises(ShapeError):
        as_input_matrix({"not": "supported"})


def test_mvn_raises_on_non_psd():
    mean = jnp.zeros(3)
    cov = -jnp.eye(3)
    with pytest.raises(ft.CholeskyError):
        MultivariateNormal(mean, cov)


def test_mvn_sample_shapes_and_determinism():
    cov = jnp.asarray([[1.0, 0.5], [0.5, 2.0]])
    mvn = MultivariateNormal(jnp.asarray([1.0, -1.0]), cov)
    key = jax.random.PRNGKey(0)
    a = np.asarray(mvn.sample(key))
    b = np.asarray(mvn.sample(key))
    np.testing.assert_array_equal(a, b)  # explicit keys -> deterministic
    draws = mvn.sample_n(key, 7)
    assert draws.shape == (7, 2)


def test_profiling_utils_smoke():
    log = []
    with timed("scope", log):
        with annotate("trace-scope"):
            jnp.ones(4).sum().block_until_ready()
    assert log and log[0][0] == "scope" and log[0][1] >= 0


def test_default_dtype_tracks_x64():
    from friedrich_tpu.config import default_dtype, x64_enabled

    assert x64_enabled()  # conftest enables it
    assert default_dtype() == jnp.float64


def test_debugging_utils():
    from friedrich_tpu.utils.debugging import checksum, debug_nans

    with debug_nans(False):
        pass
    a = checksum({"a": jnp.ones((3,)), "b": jnp.asarray(2.0)})
    assert a == 5.0


def test_bayesian_optimization_example_converges():
    import importlib.util
    import pathlib

    path = pathlib.Path(__file__).resolve().parents[1] / "examples" / "bayesian_optimization.py"
    spec = importlib.util.spec_from_file_location("bo_example", path)
    bo = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(bo)
    best = bo.main(num_iters=15, seed=0)
    # global max ~0.9756 at x~0.867; EI-BO should get close in 15 steps
    assert best > 0.9
