"""Distributed-logprob MCMC: the mesh-sharded density vs single-device.

Validates VERDICT-r1 item 4: the NUTS target whose inner factorization is
itself distributed. On the 8-virtual-device CPU mesh (f64):

- the VALUE must match the single-device exact-LML density to near
  machine precision (same math, different execution);
- the custom-VJP gradient's exact parts (data-fit, value) must match
  autodiff of the single-device density; the Hutchinson trace terms
  converge to the exact gradient as probes grow;
- a short NUTS run with the distributed density must mix and land on the
  same posterior region as single-device NUTS.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu.mcmc import (
    initial_signs,
    initial_theta,
    make_distributed_hyperparam_logprob,
    make_hyperparam_logprob,
    sample_hyperparameters_distributed,
)
from friedrich_tpu.models import gp as core
from friedrich_tpu.parallel.mesh import make_matrix_mesh

RNG = np.random.default_rng(0)


def _state(n=48, d=2, cap=None):
    x = jnp.asarray(RNG.normal(size=(n, d)))
    y = jnp.sin(x.sum(axis=1)) + 0.1 * jnp.asarray(RNG.normal(size=(n,)))
    kern = fk.SquaredExp(ls=1.0, ampl=1.0)
    state, ok = core.make_state(kern, fp.ZeroPrior(), 0.3, x, y, cap=cap)
    assert bool(ok)
    return state


def test_value_matches_single_device_exactly():
    mesh = make_matrix_mesh(8)
    state = _state(n=48)
    signs = initial_signs(state)
    logp_1 = make_hyperparam_logprob(state, signs=signs)
    logp_d = make_distributed_hyperparam_logprob(
        mesh, state, signs=signs, block=8
    )
    for seed in range(4):
        theta = initial_theta(state) + 0.3 * jnp.asarray(
            np.random.default_rng(seed).normal(size=3)
        )
        v1 = float(logp_1(theta))
        vd = float(logp_d(theta))
        assert abs(v1 - vd) < 1e-8, (v1, vd)


def test_value_matches_with_padded_capacity():
    mesh = make_matrix_mesh(8)
    state = _state(n=42, cap=64)  # dead rows + non-divisible live count
    signs = initial_signs(state)
    logp_1 = make_hyperparam_logprob(state, signs=signs)
    logp_d = make_distributed_hyperparam_logprob(
        mesh, state, signs=signs, block=8
    )
    theta = initial_theta(state)
    assert abs(float(logp_1(theta)) - float(logp_d(theta))) < 1e-8


def test_gradient_converges_to_exact_with_probes():
    mesh = make_matrix_mesh(8)
    state = _state(n=48)
    signs = initial_signs(state)
    theta = initial_theta(state)
    exact = jax.grad(make_hyperparam_logprob(state, signs=signs))(theta)
    # few probes: right ballpark; many probes: tight
    g16 = jax.grad(
        make_distributed_hyperparam_logprob(
            mesh, state, signs=signs, block=8, num_probes=16
        )
    )(theta)
    g256 = jax.grad(
        make_distributed_hyperparam_logprob(
            mesh, state, signs=signs, block=8, num_probes=256
        )
    )(theta)
    scale = jnp.maximum(jnp.abs(exact), 1.0)
    err16 = float(jnp.max(jnp.abs(g16 - exact) / scale))
    err256 = float(jnp.max(jnp.abs(g256 - exact) / scale))
    assert err16 < 1.0
    assert err256 < 0.25
    assert err256 < err16 + 1e-12


def test_value_and_grad_work_under_jit():
    """NUTS jits value_and_grad of the density — the custom VJP must
    compose with jit + grad."""
    mesh = make_matrix_mesh(8)
    state = _state(n=48)
    logp_d = make_distributed_hyperparam_logprob(
        mesh, state, signs=initial_signs(state), block=8
    )
    vg = jax.jit(jax.value_and_grad(logp_d))
    v, g = vg(initial_theta(state))
    assert np.isfinite(float(v))
    assert np.all(np.isfinite(np.asarray(g)))


def test_distributed_nuts_matches_single_device_posterior():
    from friedrich_tpu.mcmc import sample_hyperparameters

    mesh = make_matrix_mesh(8)
    state = _state(n=48)
    res_d = sample_hyperparameters_distributed(
        mesh, state, jax.random.PRNGKey(0), num_warmup=150, num_samples=200,
        num_chains=2, block=8, num_probes=32,
    )
    assert res_d.samples.shape == (200, 2, 3)
    assert float(jnp.mean(res_d.divergent)) < 0.05

    res_1 = sample_hyperparameters(
        state, jax.random.PRNGKey(1), num_warmup=150, num_samples=200,
        num_chains=2,
    )
    m_d = np.asarray(res_d.samples).reshape(-1, 3).mean(axis=0)
    m_1 = np.asarray(res_1.samples).reshape(-1, 3).mean(axis=0)
    s_1 = np.asarray(res_1.samples).reshape(-1, 3).std(axis=0)
    # posterior means agree within Monte-Carlo error bars
    assert np.all(np.abs(m_d - m_1) < 4.0 * s_1 / np.sqrt(50) + 0.3)
