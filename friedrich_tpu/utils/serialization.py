"""Model persistence: save/load of the full trained GP state.

Counterpart of the reference's serde feature (``Cargo.toml:18-20``; derives
on ``GaussianProcess`` at ``gaussian_process/mod.rs:58``, ``EMatrix``/
``EVector`` at ``extendable_matrix.rs:14,62``, kernels/priors e.g.
``kernel.rs:506``). Like serde, the WHOLE state round-trips — training
inputs, residuals, the Cholesky factor, hyperparameters, noise, epsilon —
so a loaded model produces bit-identical predictions without refactorizing.

Format: a single ``.npz`` holding every array leaf plus a JSON header
describing the pytree structure (kernel/prior class names from the
registries)."""

from __future__ import annotations

import json
from typing import Any

import jax.numpy as jnp
import numpy as np

from ..kernels import KERNEL_REGISTRY
from ..kernels.base import KernelProd, KernelSum
from ..priors import PRIOR_REGISTRY
from ..utils.errors import ConfigError


def _kernel_spec(kernel) -> dict:
    """Recursive structural description of a kernel tree."""
    name = type(kernel).__name__
    if isinstance(kernel, (KernelSum, KernelProd)):
        return {
            "class": name,
            "k1": _kernel_spec(kernel.k1),
            "k2": _kernel_spec(kernel.k2),
        }
    return {
        "class": name,
        "params": {f: float(getattr(kernel, f)) for f in kernel.PARAM_FIELDS},
    }


def _kernel_from_spec(spec: dict):
    cls = KERNEL_REGISTRY.get(spec["class"])
    if cls is None:
        raise ConfigError(f"unknown kernel class {spec['class']!r}")
    if spec["class"] in ("KernelSum", "KernelProd"):
        return cls(k1=_kernel_from_spec(spec["k1"]), k2=_kernel_from_spec(spec["k2"]))
    return cls(**spec["params"])


def _prior_spec(prior) -> dict:
    name = type(prior).__name__
    spec: dict[str, Any] = {"class": name}
    if name == "ConstantPrior":
        spec["c"] = float(prior.c)
    elif name == "LinearPrior":
        spec["intercept"] = float(prior.intercept)
        spec["weights"] = np.asarray(prior.weights).tolist()
    return spec


def _prior_from_spec(spec: dict):
    cls = PRIOR_REGISTRY.get(spec["class"])
    if cls is None:
        raise ConfigError(f"unknown prior class {spec['class']!r}")
    if spec["class"] == "ConstantPrior":
        return cls(c=spec["c"])
    if spec["class"] == "LinearPrior":
        return cls(weights=jnp.asarray(spec["weights"]), intercept=spec["intercept"])
    return cls()


def save_gp(gp, path: str) -> None:
    from ..models.gp import GPState  # noqa: F401 (documentation of layout)

    state = gp.state
    header = {
        "version": 1,
        "kernel": _kernel_spec(state.kernel),
        "prior": _prior_spec(state.prior),
        "eps": state.eps,
        "method": state.method,
        "backend": state.backend,
        "storage": state.storage,
        "block": state.block,
        "precision": state.precision,
        "n": int(state.n),
        "dtype": str(state.x.dtype),
    }
    # bf16-STORAGE factors: .npz has no bfloat16 descr — store the raw bits
    # as uint16 and re-view on load
    l_np = np.asarray(state.l)
    if state.storage == "bf16":
        l_np = l_np.view(np.uint16)
    # np.savez appends .npz when missing but np.load does not — normalize
    # here so save/load round-trips for extensionless paths
    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    np.savez(
        path,
        header=np.frombuffer(json.dumps(header).encode(), dtype=np.uint8),
        x=np.asarray(state.x),
        resid=np.asarray(state.resid),
        l=l_np,
        noise=np.asarray(state.noise),
    )


def load_gp(path: str):
    from ..models.api import GaussianProcess
    from ..models.gp import GPState

    if not str(path).endswith(".npz"):
        path = f"{path}.npz"
    with np.load(path) as data:
        header = json.loads(bytes(data["header"]).decode())
        dtype = jnp.dtype(header["dtype"])
        storage = header.get("storage")
        l_np = data["l"]
        if storage == "bf16":
            l_jax = jnp.asarray(l_np).view(jnp.bfloat16)
        else:
            l_jax = jnp.asarray(l_np, dtype=dtype)
        state = GPState(
            x=jnp.asarray(data["x"], dtype=dtype),
            resid=jnp.asarray(data["resid"], dtype=dtype),
            l=l_jax,
            n=jnp.asarray(header["n"], dtype=jnp.int32),
            noise=jnp.asarray(data["noise"], dtype=dtype),
            kernel=_kernel_from_spec(header["kernel"]),
            prior=_prior_from_spec(header["prior"]),
            eps=header["eps"],
            method=header["method"],
            backend=header.get("backend", "dense"),
            storage=storage,
            block=header.get("block"),
            precision=header.get("precision"),
        )
    return GaussianProcess(state)
