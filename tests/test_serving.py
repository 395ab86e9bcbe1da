"""End-to-end serving subsystem: bundle export -> C++ daemon -> client.

Builds the real ``friedrich_served`` binary, starts it on a free port,
and checks the served posterior against the in-process model. The daemon
is killed by its exact PID (GPServer.close) — never by pattern.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu import serving
from friedrich_tpu.native import NativeGP

RNG = np.random.default_rng(3)


def _trained_gp(kernel=None, prior=None, n=40, d=3):
    x = RNG.normal(size=(n, d))
    y = np.sin(x[:, 0]) + 0.1 * RNG.normal(size=n)
    return (
        ft.GaussianProcess.new(
            prior or fp.ConstantPrior(0.3),
            kernel or fk.SquaredExp(1.2, 0.9),
            0.25,
            None,
            x,
            y,
        ),
        x,
        y,
    )


@pytest.fixture(scope="module")
def served(tmp_path_factory):
    gp, x, y = _trained_gp()
    bundle = tmp_path_factory.mktemp("serving") / "model.frsv"
    serving.export_bundle(gp, bundle)
    with serving.GPServer(bundle) as srv:
        with serving.GPClient(port=srv.port) as client:
            yield gp, client


def test_served_matches_in_process(served):
    gp, client = served
    xq = RNG.normal(size=(17, 3))
    mean, var = client.predict_mean_variance(xq)
    want_mean, want_var = gp.predict_mean_variance(xq)
    # same factor/residuals; daemon solves in f64 vs the model's f32
    np.testing.assert_allclose(mean, np.asarray(want_mean), atol=5e-4)
    np.testing.assert_allclose(var, np.asarray(want_var), atol=5e-4)


def test_served_mean_only(served):
    gp, client = served
    xq = RNG.normal(size=(5, 3))
    mean = client.predict(xq)
    np.testing.assert_allclose(
        mean, np.asarray(gp.predict(xq)), atol=5e-4
    )


def test_served_multiple_requests_one_connection(served):
    gp, client = served
    for m in (1, 8, 3):
        xq = RNG.normal(size=(m, 3))
        mean, var = client.predict_mean_variance(xq)
        assert mean.shape == (m,) and var.shape == (m,)
        assert np.all(np.isfinite(mean)) and np.all(var > 0)


def test_served_concurrent_connections(served):
    """Thread-per-connection accept loop: a second client is served while
    the module fixture's first connection stays open (the old serial loop
    would block here until the first client disconnected)."""
    gp, client = served
    xq = RNG.normal(size=(4, 3))
    with serving.GPClient(port=client.port, timeout=10.0) as second:
        mean2 = second.predict(xq)
    # first connection still live and interleavable afterwards
    mean1 = client.predict(xq)
    np.testing.assert_allclose(mean2, mean1, atol=1e-12)


def test_served_dim_mismatch_rejected(served):
    gp, client = served
    with pytest.raises(ft.ConfigError):
        client.predict(RNG.normal(size=(4, 5)))  # trained with d=3


def test_served_matches_native_oracle_f64(tmp_path):
    """Against the independent f64 NativeGP oracle, exporting an
    f64-exact state: agreement to 1e-9."""
    gp, x, y = _trained_gp(kernel=fk.Matern2(0.8, 1.1), prior=fp.ZeroPrior())
    oracle = NativeGP(fk.Matern2(0.8, 1.1), fp.ZeroPrior(), 0.25, x, y)
    # replace the bundle's f32-derived arrays with the oracle's f64 state
    bundle = tmp_path / "model64.frsv"

    class _State:
        n = x.shape[0]
        pass

    st = _State()
    st.x = oracle.x
    st.resid = oracle.resid
    st.l = oracle.l_mat
    st.noise = 0.25
    st.kernel = fk.Matern2(0.8, 1.1)
    st.prior = fp.ZeroPrior()
    serving.export_bundle(st, bundle)
    xq = RNG.normal(size=(9, 3))
    want_mean, want_var = oracle.predict_mean_variance(xq)
    with serving.GPServer(bundle) as srv:
        with serving.GPClient(port=srv.port) as client:
            mean, var = client.predict_mean_variance(xq)
    np.testing.assert_allclose(mean, want_mean, atol=1e-9)
    np.testing.assert_allclose(var, want_var, atol=1e-9)


def test_accelerated_server_matches_model():
    """TPU-backed serving mode: the in-process JAX server speaks the same
    protocol, answers from the live model's solve paths."""
    gp, x, y = _trained_gp()
    xq = RNG.normal(size=(11, 3))
    want_mean, want_var = gp.predict_mean_variance(xq)
    with serving.AcceleratedGPServer(gp) as srv:
        with serving.GPClient(port=srv.port, timeout=30.0) as client:
            mean, var = client.predict_mean_variance(xq)
            mean_only = client.predict(xq)
    np.testing.assert_allclose(mean, np.asarray(want_mean), atol=1e-5)
    np.testing.assert_allclose(var, np.asarray(want_var), atol=1e-5)
    np.testing.assert_allclose(mean_only, mean, atol=1e-12)


def test_accelerated_server_concurrent_and_errors():
    gp, x, y = _trained_gp()
    xq = RNG.normal(size=(3, 3))
    with serving.AcceleratedGPServer(gp) as srv:
        with serving.GPClient(port=srv.port, timeout=30.0) as c1, \
                serving.GPClient(port=srv.port, timeout=30.0) as c2:
            m1 = c1.predict(xq)
            with pytest.raises(ft.ConfigError):
                c2.predict(RNG.normal(size=(2, 7)))  # wrong dim -> status 1
            m2 = c2.predict(xq)  # connection still usable after error
    np.testing.assert_allclose(m1, m2, atol=1e-12)


def test_accelerated_server_large_scale_gp():
    """The distributed engine serves through the same protocol."""
    import jax
    from friedrich_tpu.parallel.large_scale import LargeScaleGP
    from jax.sharding import Mesh

    devs = np.array(jax.devices()[: min(4, len(jax.devices()))])
    mesh = Mesh(devs, ("rows",))
    n, d = 96, 3
    x = RNG.normal(size=(n, d)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    gp = LargeScaleGP(
        mesh, fk.SquaredExp(1.0, 0.9), fp.ZeroPrior(), 0.3, x, y, block=32
    )
    xq = RNG.normal(size=(5, d))
    want_mean, want_var = gp.predict_mean_variance(
        np.asarray(xq, np.float32)
    )
    with serving.AcceleratedGPServer(gp) as srv:
        with serving.GPClient(port=srv.port, timeout=60.0) as client:
            mean, var = client.predict_mean_variance(xq)
    np.testing.assert_allclose(mean, np.asarray(want_mean), atol=5e-4)
    np.testing.assert_allclose(var, np.asarray(want_var), atol=5e-4)


def test_served_composite_kernel(tmp_path):
    """Sum-composed kernel goes through the daemon's composite path."""
    kern = fk.SquaredExp(1.0, 0.8) + fk.Linear(0.2)
    gp, x, y = _trained_gp(kernel=kern, prior=fp.ZeroPrior())
    bundle = tmp_path / "model_sum.frsv"
    serving.export_bundle(gp, bundle)
    xq = RNG.normal(size=(6, 3))
    want_mean, want_var = gp.predict_mean_variance(xq)
    with serving.GPServer(bundle) as srv:
        with serving.GPClient(port=srv.port) as client:
            mean, var = client.predict_mean_variance(xq)
    np.testing.assert_allclose(mean, np.asarray(want_mean), atol=5e-4)
    np.testing.assert_allclose(var, np.asarray(want_var), atol=5e-4)


def test_accelerated_server_outofcore_gp():
    """The host-RAM-factor engine serves through the same protocol."""
    from friedrich_tpu.models import OutOfCoreGP

    n, d = 120, 3
    x = RNG.normal(size=(n, d)).astype(np.float32)
    y = np.sin(x[:, 0]).astype(np.float32)
    gp = OutOfCoreGP(
        fk.SquaredExp(jnp.float32(1.0), jnp.float32(0.9)), fp.ZeroPrior(),
        0.3, x, y, block=24,
    )
    xq = RNG.normal(size=(5, d))
    want_mean, want_var = gp.predict_mean_variance(np.asarray(xq, np.float32))
    with serving.AcceleratedGPServer(gp) as srv:
        with serving.GPClient(port=srv.port, timeout=60.0) as client:
            mean, var = client.predict_mean_variance(xq)
    np.testing.assert_allclose(mean, np.asarray(want_mean), atol=5e-4)
    np.testing.assert_allclose(var, np.asarray(want_var), atol=5e-4)


def test_accelerated_server_continuous_batching():
    """Concurrent requests are merged into shared device sweeps (padded
    to power-of-two buckets): results must match per-request predictions
    exactly, across distinct query shapes and many client threads."""
    import threading

    gp, x, y = _trained_gp()
    shapes = [3, 7, 11, 5, 9, 2, 8, 4]
    queries = [RNG.normal(size=(s, 3)) for s in shapes]
    want = [np.asarray(gp.predict_mean_variance(q)[0]) for q in queries]
    got = [None] * len(queries)
    errs = []
    with serving.AcceleratedGPServer(gp, min_bucket=8, max_rows=16) as srv:
        barrier = threading.Barrier(len(queries))

        def one(i):
            try:
                with serving.GPClient(port=srv.port, timeout=30.0) as c:
                    barrier.wait()
                    got[i] = c.predict(queries[i])
            except Exception as e:  # noqa: BLE001
                errs.append(e)

        threads = [
            threading.Thread(target=one, args=(i,))
            for i in range(len(queries))
        ]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert not errs, errs
    for i, w in enumerate(want):
        np.testing.assert_allclose(got[i], w, atol=1e-5)


def test_accelerated_server_batching_delivers_errors_to_all_waiters():
    """A failing model must fail every co-batched request, and the server
    must keep serving afterwards."""
    gp, x, y = _trained_gp()

    class Flaky:
        def __init__(self, inner):
            self.state = inner.state
            self._inner = inner
            self.fail = True

        def predict_mean_variance(self, xq):
            if self.fail:
                self.fail = False
                raise RuntimeError("transient device error")
            return self._inner.predict_mean_variance(xq)

    flaky = Flaky(gp)
    xq = RNG.normal(size=(4, 3))
    with serving.AcceleratedGPServer(flaky) as srv:
        with serving.GPClient(port=srv.port, timeout=30.0) as c:
            with pytest.raises(Exception):
                c.predict(xq)  # first call: the model raises
            m = c.predict(xq)  # server recovered
    np.testing.assert_allclose(
        m, np.asarray(gp.predict_mean_variance(xq)[0]), atol=1e-5
    )
