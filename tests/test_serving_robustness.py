"""Serving-protocol robustness: partial reads, oversized batches,
malformed headers — for both the C++ daemon and the TPU-backed server.

The wire protocol (``native/friedrich_served.cpp``): request =
``[magic u32, flags u32][nq u64, d u64][nq*d f64]``; response =
``[magic u32, status u32][count u64][count f64 mean][count f64 var?]``.
A broken client must never take the server down or poison the next
connection.
"""

import socket
import struct

import numpy as np
import pytest

import friedrich_tpu as ft
import friedrich_tpu.kernels as fk
import friedrich_tpu.priors as fp
from friedrich_tpu import serving

RNG = np.random.default_rng(5)

REQ_MAGIC = 0x46525131  # serving.py::_REQ_MAGIC / friedrich_served.cpp
D = 3


def _trained_gp(n=32):
    x = RNG.normal(size=(n, D))
    y = np.sin(x[:, 0]) + 0.1 * RNG.normal(size=n)
    return ft.GaussianProcess.new(
        fp.ConstantPrior(0.3), fk.SquaredExp(1.2, 0.9), 0.25, None, x, y
    )


@pytest.fixture(scope="module", params=["daemon", "accelerated"])
def server(request, tmp_path_factory):
    gp = _trained_gp()
    if request.param == "daemon":
        bundle = tmp_path_factory.mktemp("srv") / "model.frsv"
        serving.export_bundle(gp, bundle)
        with serving.GPServer(bundle) as srv:
            yield gp, srv.port
    else:
        with serving.AcceleratedGPServer(gp) as srv:
            yield gp, srv.port


def _raw(port):
    s = socket.create_connection(("127.0.0.1", port), timeout=10)
    s.settimeout(10)
    return s


def _healthy(gp, port):
    """The server must still answer a well-formed request correctly."""
    with serving.GPClient(port=port) as client:
        xq = RNG.normal(size=(5, D))
        mean = client.predict(xq)
        want = np.asarray(gp.predict(xq), dtype=np.float64)
        np.testing.assert_allclose(mean, want, rtol=1e-5, atol=1e-5)


class TestMalformedTraffic:
    def test_bad_magic_closes_connection_server_survives(self, server):
        gp, port = server
        with _raw(port) as s:
            s.sendall(struct.pack("<II", 0xDEADBEEF, 0))
            # the server may close the moment it reads the bad magic —
            # racing our remaining sends (EPIPE/RST is a PASS: the
            # contract is no response, connection closed, server alive)
            try:
                s.sendall(struct.pack("<QQ", 1, D))
                s.sendall(b"\x00" * (8 * D))
                # server closes without a response: clean FIN (b"") or
                # RST (it may close with our unread payload buffered)
                assert s.recv(1) == b""
            except (BrokenPipeError, ConnectionResetError):
                pass
        _healthy(gp, port)

    def test_partial_header_then_close(self, server):
        gp, port = server
        with _raw(port) as s:
            s.sendall(struct.pack("<I", REQ_MAGIC))  # half a header
        _healthy(gp, port)

    def test_partial_payload_then_close(self, server):
        gp, port = server
        with _raw(port) as s:
            s.sendall(struct.pack("<II", REQ_MAGIC, 1))
            s.sendall(struct.pack("<QQ", 4, D))
            s.sendall(b"\x00" * 8)  # 1 of 4*D doubles, then EOF
        _healthy(gp, port)

    def test_zero_rows_rejected(self, server):
        gp, port = server
        with _raw(port) as s:
            s.sendall(struct.pack("<II", REQ_MAGIC, 0))
            s.sendall(struct.pack("<QQ", 0, D))
            head = s.recv(8)
            assert len(head) == 8
            magic, status = struct.unpack("<II", head)
            assert status != 0  # error response
        _healthy(gp, port)

    def test_oversized_batch_rejected_without_allocation(self, server):
        """nq far beyond kMaxBatch (2^20) must be rejected from the header
        alone — the server must not try to read or allocate nq*d doubles."""
        gp, port = server
        huge = 1 << 40
        with _raw(port) as s:
            s.sendall(struct.pack("<II", REQ_MAGIC, 1))
            s.sendall(struct.pack("<QQ", huge, D))
            head = s.recv(8)
            assert len(head) == 8
            _, status = struct.unpack("<II", head)
            assert status != 0
        _healthy(gp, port)

    def test_dim_mismatch_rejected(self, server):
        gp, port = server
        with _raw(port) as s:
            s.sendall(struct.pack("<II", REQ_MAGIC, 1))
            s.sendall(struct.pack("<QQ", 2, D + 5))
            # full (mis-dimensioned) payload: the TPU-backed server drains
            # it to keep the connection usable before responding
            s.sendall(b"\x00" * (8 * 2 * (D + 5)))
            head = s.recv(8)
            assert len(head) == 8
            _, status = struct.unpack("<II", head)
            assert status != 0
        _healthy(gp, port)

    def test_many_broken_connections_no_leak(self, server):
        """A burst of abandoned connections (the thread-per-connection
        model's worst case) must leave the server serving."""
        gp, port = server
        for _ in range(20):
            s = _raw(port)
            s.sendall(struct.pack("<I", REQ_MAGIC))
            s.close()
        _healthy(gp, port)


class TestDispatcherLifecycle:
    """Round-5 advisor fixes: a dying dispatcher or a post-close enqueue
    must fail requests promptly instead of hanging them forever."""

    def test_predict_after_close_raises(self):
        gp = _trained_gp()
        srv = serving.AcceleratedGPServer(gp)
        srv.close()
        with pytest.raises(RuntimeError, match="closing|dispatcher"):
            srv._predict(np.zeros((2, D)))

    def test_dispatcher_survives_padding_error(self):
        """An exception raised while PREPARING a chunk (before the model
        call) must reach the waiter as an error — and the dispatcher
        must keep serving afterwards."""
        gp = _trained_gp()
        with serving.AcceleratedGPServer(gp) as srv:
            # a 1-D array breaks np.concatenate/padding inside _run_chunk
            with pytest.raises(Exception):
                srv._predict(np.zeros((3,)))
            # dispatcher alive: a good request still answers
            xq = RNG.normal(size=(4, D))
            mean, var = srv._predict(xq)
            want = np.asarray(gp.predict(xq), dtype=np.float64)
            np.testing.assert_allclose(
                np.asarray(mean, dtype=np.float64), want, rtol=1e-5,
                atol=1e-5,
            )

    def test_waiter_unblocks_when_dispatcher_dies(self):
        """If the dispatcher thread exits while a request waits, the
        bounded wait must surface an error (not hang)."""
        import threading

        gp = _trained_gp()
        srv = serving.AcceleratedGPServer(gp)
        try:
            # simulate an abrupt dispatcher death: close the queue flag
            # without notifying, then stop the thread by letting close()
            # drain — enqueue first so the waiter is parked
            results = {}

            def waiter():
                try:
                    srv._predict(RNG.normal(size=(2, D)))
                    results["ok"] = True
                except RuntimeError as e:
                    results["err"] = str(e)

            # kill the dispatcher by making the model call explode AND
            # marking closing so the loop exits after the failure
            srv._model = None  # model call will raise AttributeError
            t = threading.Thread(target=waiter)
            t.start()
            t.join(timeout=30)
            assert not t.is_alive(), "waiter hung"
            # either delivered as an error or (rarely) a race with close
            assert "err" in results or "ok" not in results
        finally:
            srv.close()
