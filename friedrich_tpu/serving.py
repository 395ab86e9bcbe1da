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
                f"friedrich_served rejected the request (status {status}; "
                f"query dim mismatch or oversized batch?)"
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
