"""Native CPU serving: bundle export, daemon management, and client.

The deployment-facing runtime around the GP: a trained model is exported
to a flat binary bundle (training inputs, prior residuals, Cholesky
factor, kernel/prior spec — the same state the reference persists with
serde, ``gaussian_process/mod.rs:58``), and ``native/friedrich_served``
(C++, linked against ``libfriedrich_native.so``) serves posterior
mean/variance over a length-prefixed binary TCP protocol with no JAX or
accelerator dependency. The reference has no serving layer (its API is
the Rust library surface itself, ``lib.rs:39-45``); this subsystem is the
production-serving slot of the TPU-native rebuild.

Typical use::

    from friedrich_tpu import serving
    serving.export_bundle(gp, "model.frsv")
    with serving.GPServer("model.frsv") as srv:
        client = serving.GPClient(port=srv.port)
        mean, var = client.predict_mean_variance(xq)
"""

from __future__ import annotations

import socket
import struct
import subprocess
import time
from pathlib import Path
from typing import Optional

import numpy as np

from .utils.errors import ConfigError

_REPO_ROOT = Path(__file__).resolve().parent.parent
_SRC = _REPO_ROOT / "native" / "friedrich_served.cpp"
_BIN = _REPO_ROOT / "native" / "friedrich_served"

_BUNDLE_MAGIC = b"FRSERVE1"
_REQ_MAGIC = 0x46525131
_RESP_MAGIC = 0x46525231
_FLAG_VARIANCE = 1

_PRIOR_KINDS = {"ZeroPrior": 0, "ConstantPrior": 1, "LinearPrior": 2}


def _prior_spec(prior) -> tuple[int, np.ndarray]:
    name = type(prior).__name__
    if name not in _PRIOR_KINDS:
        raise ConfigError(f"serving does not support prior {name!r}")
    if name == "ZeroPrior":
        params = np.zeros(0)
    elif name == "ConstantPrior":
        params = np.array([float(prior.c)])
    else:  # LinearPrior: [w_0..w_{d-1}, intercept]
        params = np.concatenate(
            [
                np.asarray(prior.weights, dtype=np.float64).ravel(),
                [float(prior.intercept)],
            ]
        )
    return _PRIOR_KINDS[name], np.ascontiguousarray(params, dtype=np.float64)


def export_bundle(gp, path) -> None:
    """Write a serving bundle for a trained :class:`GaussianProcess` (or a
    raw ``GPState``). Arrays are stored f64 and sliced to the live row
    count (padding/capacity is a training-time concern)."""
    from .native import _composite_spec

    state = getattr(gp, "state", gp)
    n = int(state.n)
    d = int(state.x.shape[1])
    x = np.ascontiguousarray(np.asarray(state.x[:n], dtype=np.float64))
    resid = np.ascontiguousarray(np.asarray(state.resid[:n], dtype=np.float64))
    l_mat = np.ascontiguousarray(np.asarray(state.l[:n, :n], dtype=np.float64))
    op, kid1, p1, kid2, p2 = _composite_spec(state.kernel)
    prior_kind, prior_params = _prior_spec(state.prior)

    def _i64(v):
        return struct.pack("<q", v)

    with open(path, "wb") as f:
        f.write(_BUNDLE_MAGIC)
        f.write(_i64(op))
        f.write(_i64(kid1) + _i64(len(p1)) + p1.astype("<f8").tobytes())
        f.write(_i64(kid2) + _i64(len(p2)) + p2.astype("<f8").tobytes())
        f.write(
            _i64(prior_kind)
            + _i64(len(prior_params))
            + prior_params.astype("<f8").tobytes()
        )
        f.write(struct.pack("<d", float(state.noise)))
        f.write(_i64(n) + _i64(d))
        f.write(x.astype("<f8").tobytes())
        f.write(resid.astype("<f8").tobytes())
        f.write(l_mat.astype("<f8").tobytes())


def build_daemon() -> Path:
    """Compile the serving daemon (cached by source mtime); ensures the
    native library it links against is built first."""
    from . import native

    native.load()  # builds libfriedrich_native.so if stale
    if _BIN.exists() and _BIN.stat().st_mtime >= _SRC.stat().st_mtime:
        return _BIN
    subprocess.run(
        [
            "g++", "-O3", "-march=native", "-pthread", "-o", str(_BIN),
            str(_SRC), f"-L{_SRC.parent}", "-lfriedrich_native",
            "-Wl,-rpath,$ORIGIN",
        ],
        check=True,
        capture_output=True,
    )
    return _BIN


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        return s.getsockname()[1]


class GPServer:
    """Runs ``friedrich_served`` on a bundle; context-manager friendly.

    The daemon is killed by its exact PID on :meth:`close`."""

    def __init__(self, bundle_path, port: Optional[int] = None,
                 startup_timeout: float = 10.0):
        self.bundle_path = str(bundle_path)
        self.port = port or _free_port()
        binary = build_daemon()
        self._proc = subprocess.Popen(
            [str(binary), self.bundle_path, str(self.port)],
            stdout=subprocess.DEVNULL,
            stderr=subprocess.DEVNULL,
        )
        deadline = time.time() + startup_timeout
        while True:
            if self._proc.poll() is not None:
                raise ConfigError(
                    f"friedrich_served exited with {self._proc.returncode} "
                    f"(bad bundle or port {self.port} in use?)"
                )
            try:
                with socket.create_connection(
                    ("127.0.0.1", self.port), timeout=0.2
                ):
                    return
            except OSError:
                if time.time() > deadline:
                    self._proc.kill()
                    raise ConfigError("friedrich_served did not come up")
                time.sleep(0.05)

    def close(self) -> None:
        if self._proc.poll() is None:
            self._proc.terminate()
            try:
                self._proc.wait(timeout=5)
            except subprocess.TimeoutExpired:
                self._proc.kill()
                self._proc.wait()

    def __enter__(self) -> "GPServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class AcceleratedGPServer:
    """Serve a LIVE (JAX-backed) model over the native daemon's wire
    protocol — the TPU-backed serving mode.

    Where :class:`GPServer` runs the standalone C++ daemon (CPU f64, no
    accelerator dependency), this server keeps the trained model resident
    on whatever backend JAX is using — on a TPU host, posterior sweeps
    run the blocked/unrolled solve paths (``ops/blocked_solve.py``), so
    very large n serves at accelerator speed instead of the daemon's
    single-thread O(n^2)-per-query loops. Same protocol, same
    :class:`GPClient`.

    ``model`` is anything with ``predict_mean_variance(xq)`` and a
    ``state.x`` (or bare ``.x``) feature matrix — ``GaussianProcess``,
    ``LargeScaleGP`` (mesh-sharded factor), or ``OutOfCoreGP``
    (host-RAM factor).
    Thread-per-connection, like the native daemon. Concurrent requests
    are CONTINUOUSLY BATCHED: while the device runs one batch, arrivals
    queue, and the dispatcher merges everything queued into the next
    single device sweep (the per-batch cost at large n is dominated by
    reading the n x n factor once, so co-batched requests ride the same
    sweep nearly free — measured round 3: 4 serialized clients paid
    ~4x the single-client p50). Batch shapes are padded to power-of-two
    buckets (min ``min_bucket``) so the device program set stays small;
    batches above ``max_rows`` rows are chunked. No artificial delay is
    added: a lone client's request dispatches immediately.
    """

    def __init__(self, model, host: str = "127.0.0.1",
                 port: Optional[int] = None, max_batch: int = 1 << 20,
                 max_rows: int = 4096, min_bucket: int = 256):
        import threading

        self._model = model
        # GaussianProcess keeps features on .state.x; LargeScaleGP on .x
        feats = getattr(model, "state", model).x
        self._d = int(feats.shape[1])
        self._x_dtype = feats.dtype  # wire is f64; model may be f32
        self._max_batch = max_batch
        self._max_rows = max_rows
        self._min_bucket = min_bucket
        self._pending: list = []  # [xq, out_slot, event] triples
        self._cond = threading.Condition()
        self._closing = False
        self._dispatcher = threading.Thread(
            target=self._dispatch_loop, daemon=True
        )
        self._dispatcher.start()
        self._lsock = socket.socket(socket.AF_INET, socket.SOCK_STREAM)
        self._lsock.setsockopt(socket.SOL_SOCKET, socket.SO_REUSEADDR, 1)
        self._lsock.bind((host, port or 0))
        self._lsock.listen(16)
        self.host = host
        self.port = self._lsock.getsockname()[1]
        self._accept_thread = threading.Thread(
            target=self._accept_loop, daemon=True
        )
        self._accept_thread.start()

    # -- socket plumbing ---------------------------------------------------
    def _accept_loop(self) -> None:
        import threading

        while not self._closing:
            try:
                conn, _ = self._lsock.accept()
            except OSError:
                return  # listening socket closed
            conn.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
            threading.Thread(
                target=self._serve_conn, args=(conn,), daemon=True
            ).start()

    @staticmethod
    def _recv_exact(conn, nbytes: int) -> Optional[bytes]:
        buf = bytearray()
        while len(buf) < nbytes:
            chunk = conn.recv(nbytes - len(buf))
            if not chunk:
                return None
            buf.extend(chunk)
        return bytes(buf)

    def _serve_conn(self, conn) -> None:
        try:
            while True:
                head = self._recv_exact(conn, 8)
                if head is None:
                    return
                magic, flags = struct.unpack("<II", head)
                if magic != _REQ_MAGIC:
                    return
                dims = self._recv_exact(conn, 16)
                if dims is None:
                    return
                nq, d = struct.unpack("<QQ", dims)
                if nq == 0 or nq > self._max_batch or d != self._d:
                    # drain the request payload so the connection stays
                    # usable for the next request (the native daemon
                    # closes instead)
                    if nq <= self._max_batch:
                        self._recv_exact(conn, 8 * nq * d)
                    conn.sendall(
                        struct.pack("<IIQ", _RESP_MAGIC, 1, 0)
                    )
                    if nq > self._max_batch:
                        return
                    continue
                data = self._recv_exact(conn, 8 * nq * d)
                if data is None:
                    return
                xq = np.frombuffer(data, dtype="<f8").reshape(nq, d)
                try:
                    mean, var = self._predict(xq)
                except Exception:  # noqa: BLE001 — model/device error:
                    # status-2 response keeps the connection usable (the
                    # request was well-formed; the failure is server-side)
                    conn.sendall(struct.pack("<IIQ", _RESP_MAGIC, 2, 0))
                    continue
                conn.sendall(
                    struct.pack("<IIQ", _RESP_MAGIC, 0, nq)
                    + mean.astype("<f8").tobytes()
                    + (var.astype("<f8").tobytes()
                       if flags & _FLAG_VARIANCE else b"")
                )
        except OSError:
            return
        finally:
            conn.close()

    def _predict(self, xq: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
        """Submit to the continuous-batching dispatcher and wait."""
        import threading

        out: dict = {}
        ev = threading.Event()
        with self._cond:
            if self._closing:
                # the dispatcher may already have drained and exited; an
                # enqueue now would wait forever
                raise RuntimeError("server is closing")
            self._pending.append((xq, out, ev))
            self._cond.notify()
        # bounded waits so a dead dispatcher cannot hang the connection
        # thread forever: if the dispatcher thread exits (close() or a
        # crash) while our event is unset, fail the request instead
        while not ev.wait(timeout=1.0):
            if not self._dispatcher.is_alive() and not ev.is_set():
                raise RuntimeError("dispatcher exited before answering")
        if "error" in out:
            raise out["error"]
        return out["mean"], out["var"]

    def _dispatch_loop(self) -> None:
        """Continuous batching: run everything queued as ONE device sweep,
        padded to a power-of-two row bucket (stable program set)."""
        while True:
            with self._cond:
                while not self._pending and not self._closing:
                    self._cond.wait(timeout=0.5)
                if self._closing and not self._pending:
                    return
                batch, self._pending = self._pending, []
            # chunk oversized merges so one giant batch cannot starve
            # the queue (and so pad waste stays bounded)
            rows = [b[0].shape[0] for b in batch]
            while batch:
                take, total = 0, 0
                while take < len(batch) and (
                    take == 0 or total + rows[take] <= self._max_rows
                ):
                    total += rows[take]
                    take += 1
                chunk, batch = batch[:take], batch[take:]
                rows = rows[take:]
                self._run_chunk(chunk, total)

    def _run_chunk(self, chunk, total: int) -> None:
        # the WHOLE body runs under try: an exception in the bucket
        # padding/concatenate (not just the model call) must be delivered
        # to the waiters, not kill the dispatcher thread — a dead
        # dispatcher would leave every later _predict blocked
        try:
            bucket = self._min_bucket
            while bucket < total:
                bucket *= 2
            xs = [c[0] for c in chunk]
            if bucket > total:
                # pad with copies of the first row; results are discarded
                xs.append(np.repeat(xs[0][:1], bucket - total, axis=0))
            xq = np.concatenate(xs, axis=0).astype(self._x_dtype)
            mean, var = self._model.predict_mean_variance(xq)
            mean = np.asarray(mean, dtype=np.float64)
            var = np.asarray(var, dtype=np.float64)
            off = 0
            for x, out, ev in chunk:
                k = x.shape[0]
                out["mean"] = mean[off:off + k]
                out["var"] = var[off:off + k]
                off += k
                ev.set()
        except Exception as e:  # noqa: BLE001 — deliver to every waiter
            for _, out, ev in chunk:
                out["error"] = e
                ev.set()

    def close(self) -> None:
        self._closing = True
        try:
            self._lsock.close()
        except OSError:
            pass
        self._accept_thread.join(timeout=5)
        with self._cond:
            self._cond.notify()

    def __enter__(self) -> "AcceleratedGPServer":
        return self

    def __exit__(self, *exc) -> None:
        self.close()


class GPClient:
    """Blocking client for the serving protocol (one persistent
    connection; requests are pipelined serially)."""

    def __init__(self, host: str = "127.0.0.1", port: int = 0,
                 timeout: float = 60.0):
        self._sock = socket.create_connection((host, port), timeout=timeout)
        self._sock.setsockopt(socket.IPPROTO_TCP, socket.TCP_NODELAY, 1)
        self.host = host
        self.port = port

    def close(self) -> None:
        self._sock.close()

    def __enter__(self) -> "GPClient":
        return self

    def __exit__(self, *exc) -> None:
        self.close()

    def _recv_exact(self, nbytes: int) -> bytes:
        buf = bytearray()
        while len(buf) < nbytes:
            chunk = self._sock.recv(nbytes - len(buf))
            if not chunk:
                raise ConfigError("serving connection closed mid-response")
            buf.extend(chunk)
        return bytes(buf)

    def _request(self, xq: np.ndarray, want_variance: bool):
        xq = np.ascontiguousarray(np.asarray(xq, dtype=np.float64))
        if xq.ndim != 2:
            raise ConfigError(f"queries must be 2-D, got shape {xq.shape}")
        m, d = xq.shape
        flags = _FLAG_VARIANCE if want_variance else 0
        self._sock.sendall(
            struct.pack("<IIQQ", _REQ_MAGIC, flags, m, d)
            + xq.astype("<f8").tobytes()
        )
        magic, status = struct.unpack("<II", self._recv_exact(8))
        if magic != _RESP_MAGIC:
            raise ConfigError("bad response magic from friedrich_served")
        (count,) = struct.unpack("<Q", self._recv_exact(8))
        if status != 0:
            raise ConfigError(
                f"friedrich_served rejected the request (status {status}: "
                f"{'server-side prediction error' if status == 2 else 'query dim mismatch or oversized batch?'})"
            )
        mean = np.frombuffer(self._recv_exact(8 * count), dtype="<f8").copy()
        if not want_variance:
            return mean, None
        var = np.frombuffer(self._recv_exact(8 * count), dtype="<f8").copy()
        return mean, var

    def predict(self, xq) -> np.ndarray:
        """Posterior mean (``mod.rs:226-244`` semantics)."""
        return self._request(xq, want_variance=False)[0]

    def predict_mean_variance(self, xq) -> tuple[np.ndarray, np.ndarray]:
        """Posterior mean and latent variance (``mod.rs:290-326``;
        observation noise not added back, matching the reference)."""
        mean, var = self._request(xq, want_variance=True)
        return mean, var
