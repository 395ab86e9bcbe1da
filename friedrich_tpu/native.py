"""ctypes loader for the native C++ CPU library (``native/``).

Compiles ``native/friedrich_native.cpp`` on demand (g++, cached by source
mtime) and exposes typed wrappers. This fills the slot the reference fills
with Rust/nalgebra: a no-JAX dense f64 compute path used as an independent
parity oracle and a CPU serving fallback.
"""

from __future__ import annotations

import ctypes
import subprocess
from pathlib import Path
from typing import Optional

import numpy as np

from .utils.errors import CholeskyError, ConfigError

_REPO_ROOT = Path(__file__).resolve().parent.parent
_SRC = _REPO_ROOT / "native" / "friedrich_native.cpp"
_LIB = _REPO_ROOT / "native" / "libfriedrich_native.so"

KERNEL_IDS = {
    "SquaredExp": 0,
    "Exponential": 1,
    "Matern1": 2,
    "Matern2": 3,
    "RationalQuadratic": 4,
    "Linear": 5,
    "Polynomial": 6,
    "HyperTan": 7,
    "Multiquadric": 8,
}

_lib: Optional[ctypes.CDLL] = None

_f64p = np.ctypeslib.ndpointer(dtype=np.float64, flags="C_CONTIGUOUS")


def _build() -> None:
    cmd = [
        "g++", "-O3", "-march=native", "-shared", "-fPIC",
        "-o", str(_LIB), str(_SRC),
    ]
    subprocess.run(cmd, check=True, capture_output=True)


def load() -> ctypes.CDLL:
    """Load (building if stale) the native library."""
    global _lib
    if _lib is not None:
        return _lib
    if not _LIB.exists() or _LIB.stat().st_mtime < _SRC.stat().st_mtime:
        _build()
    lib = ctypes.CDLL(str(_LIB))
    i64 = ctypes.c_int64
    lib.cov_matrix.argtypes = [ctypes.c_int, _f64p, _f64p, i64, _f64p, i64, i64, _f64p]
    lib.train_cov.argtypes = [ctypes.c_int, _f64p, _f64p, i64, i64, ctypes.c_double, _f64p]
    lib.cov_matrix2.argtypes = [
        ctypes.c_int, ctypes.c_int, _f64p, ctypes.c_int, _f64p,
        _f64p, i64, _f64p, i64, i64, _f64p,
    ]
    lib.train_cov2.argtypes = [
        ctypes.c_int, ctypes.c_int, _f64p, ctypes.c_int, _f64p,
        _f64p, i64, i64, ctypes.c_double, _f64p,
    ]
    lib.cholesky_factor.argtypes = [_f64p, i64, ctypes.c_double, ctypes.c_int]
    lib.cholesky_factor.restype = ctypes.c_int
    lib.solve_lower.argtypes = [_f64p, _f64p, i64, i64]
    lib.solve_lower_t.argtypes = [_f64p, _f64p, i64, i64]
    lib.gp_predict_mean_var.argtypes = [
        ctypes.c_int, _f64p, _f64p, i64, i64, _f64p, _f64p, _f64p, i64,
        _f64p, _f64p, _f64p,
    ]
    _lib = lib
    return lib


def _kernel_id_and_params(kernel) -> tuple[int, np.ndarray]:
    name = type(kernel).__name__
    if name not in KERNEL_IDS:
        raise ConfigError(
            f"native backend supports simple kernels, not {name!r}"
        )
    params = np.asarray(kernel.get_params(), dtype=np.float64)
    return KERNEL_IDS[name], np.ascontiguousarray(params)


def _composite_spec(kernel):
    """(op, kid1, p1, kid2, p2): single kernels and two-kernel Sum/Prod."""
    name = type(kernel).__name__
    if name in ("KernelSum", "KernelProd"):
        op = 1 if name == "KernelSum" else 2
        kid1, p1 = _kernel_id_and_params(kernel.k1)
        kid2, p2 = _kernel_id_and_params(kernel.k2)
        return op, kid1, p1, kid2, p2
    kid, p = _kernel_id_and_params(kernel)
    return 0, kid, p, 0, np.zeros(1)


def _check_2d(name, a):
    if a.ndim != 2:
        raise ConfigError(f"{name} must be 2-D, got shape {a.shape}")


def cov_matrix(kernel, x1: np.ndarray, x2: np.ndarray) -> np.ndarray:
    lib = load()
    op, kid1, p1, kid2, p2 = _composite_spec(kernel)
    x1 = np.ascontiguousarray(x1, dtype=np.float64)
    x2 = np.ascontiguousarray(x2, dtype=np.float64)
    _check_2d("x1", x1)
    _check_2d("x2", x2)
    if x1.shape[1] != x2.shape[1]:
        raise ConfigError(
            f"feature-dim mismatch: x1 has {x1.shape[1]}, x2 has {x2.shape[1]}"
        )
    out = np.empty((x1.shape[0], x2.shape[0]), dtype=np.float64)
    if op == 0:
        lib.cov_matrix(kid1, p1, x1, x1.shape[0], x2, x2.shape[0], x1.shape[1], out)
    else:
        lib.cov_matrix2(op, kid1, p1, kid2, p2, x1, x1.shape[0], x2,
                        x2.shape[0], x1.shape[1], out)
    return out


def train_cov(kernel, x: np.ndarray, noise: float) -> np.ndarray:
    lib = load()
    op, kid1, p1, kid2, p2 = _composite_spec(kernel)
    x = np.ascontiguousarray(x, dtype=np.float64)
    _check_2d("x", x)
    out = np.empty((x.shape[0], x.shape[0]), dtype=np.float64)
    if op == 0:
        lib.train_cov(kid1, p1, x, x.shape[0], x.shape[1], float(noise), out)
    else:
        lib.train_cov2(op, kid1, p1, kid2, p2, x, x.shape[0], x.shape[1],
                       float(noise), out)
    return out


def cholesky(a: np.ndarray, eps: Optional[float] = None) -> np.ndarray:
    """In-place-style lower Cholesky with nalgebra substitute semantics."""
    lib = load()
    a = np.array(a, dtype=np.float64, order="C")  # copy; factored in place
    if a.ndim != 2 or a.shape[0] != a.shape[1]:
        raise ConfigError(f"cholesky needs a square matrix, got {a.shape}")
    rc = lib.cholesky_factor(
        a, a.shape[0], float(eps or 0.0), 1 if eps is not None else 0
    )
    if rc != 0:
        raise CholeskyError()
    return a


def solve_lower(l_mat: np.ndarray, b: np.ndarray, trans: bool = False) -> np.ndarray:
    lib = load()
    l_mat = np.ascontiguousarray(l_mat, dtype=np.float64)
    b2 = np.array(b, dtype=np.float64, order="C")
    flat = b2.ndim == 1
    if flat:
        b2 = b2[:, None]
    if l_mat.ndim != 2 or l_mat.shape[0] != l_mat.shape[1]:
        raise ConfigError(f"L must be square, got {l_mat.shape}")
    if b2.shape[0] != l_mat.shape[0]:
        raise ConfigError(
            f"rhs rows {b2.shape[0]} != L size {l_mat.shape[0]}"
        )
    (lib.solve_lower_t if trans else lib.solve_lower)(
        l_mat, b2, b2.shape[0], b2.shape[1]
    )
    return b2[:, 0] if flat else b2


def _prior_mean_np(prior, x: np.ndarray) -> np.ndarray:
    """Evaluate a prior's mean in pure NumPy f64 (the jnp implementations
    would truncate to f32 without jax_enable_x64, breaking the oracle)."""
    name = type(prior).__name__
    if name == "ZeroPrior":
        return np.zeros(x.shape[0])
    if name == "ConstantPrior":
        return np.full(x.shape[0], float(prior.c))
    if name == "LinearPrior":
        w = np.asarray(prior.weights, dtype=np.float64)
        return x @ w + float(prior.intercept)
    raise ConfigError(f"native backend does not support prior {name!r}")


class NativeGP:
    """Minimal CPU GP on the native library (no JAX): train + predict.

    Mirrors the reference's core flow (``GaussianProcess::new`` +
    ``predict_mean_variance``) for serving environments without an
    accelerator runtime.
    """

    def __init__(self, kernel, prior, noise: float, x, y,
                 eps: Optional[float] = None):
        self.kernel = kernel
        self.prior = prior
        self.noise = float(noise)
        self.x = np.ascontiguousarray(np.asarray(x, dtype=np.float64))
        _check_2d("x", self.x)
        prior_mean = _prior_mean_np(prior, self.x)
        self.resid = np.ascontiguousarray(
            np.asarray(y, dtype=np.float64) - prior_mean
        )
        k = train_cov(kernel, self.x, self.noise)
        self.l_mat = cholesky(k, eps)

    def predict_mean_variance(self, xq) -> tuple[np.ndarray, np.ndarray]:
        xq = np.ascontiguousarray(np.asarray(xq, dtype=np.float64))
        _check_2d("xq", xq)
        op, kid, p, _, _ = _composite_spec(self.kernel)
        n, d = self.x.shape
        if xq.shape[1] != d:
            raise ConfigError(
                f"query dim {xq.shape[1]} != training dim {d}"
            )
        m = xq.shape[0]
        if op == 0:
            # fused single-kernel C path
            lib = load()
            work = np.empty((n, m), dtype=np.float64)
            mean = np.empty((m,), dtype=np.float64)
            var = np.empty((m,), dtype=np.float64)
            lib.gp_predict_mean_var(
                kid, p, self.x, n, d, self.l_mat, self.resid, xq, m, work,
                mean, var,
            )
        else:
            # composed path for Sum/Prod kernels
            c = cov_matrix(self.kernel, self.x, xq)
            kl = solve_lower(self.l_mat, c)
            # diagonal k(q, q) per row — O(m), not an (m, m) matrix
            base = np.array(
                [cov_matrix(self.kernel, q[None, :], q[None, :])[0, 0]
                 for q in xq]
            ) if m <= 512 else np.concatenate([
                np.diagonal(cov_matrix(self.kernel, xq[i : i + 512],
                                       xq[i : i + 512])).copy()
                for i in range(0, m, 512)
            ])
            var = base - np.sum(kl * kl, axis=0)
            w = solve_lower(self.l_mat, kl, trans=True)
            mean = w.T @ self.resid
        mean += _prior_mean_np(self.prior, xq)
        return mean, var

    def predict(self, xq) -> np.ndarray:
        return self.predict_mean_variance(xq)[0]

    def predict_variance(self, xq) -> np.ndarray:
        return self.predict_mean_variance(xq)[1]
