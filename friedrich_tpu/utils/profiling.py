"""Tracing / profiling scopes.

The reference has no tracing at all (only commented-out ``println!`` lines,
``optimizer.rs:140,145-148,274,279-283``). Here: named trace annotations
around the hot phases (covariance build, factorization, solves, fit
iterations, MCMC transitions) that show up in ``jax.profiler`` /
Perfetto traces, plus a lightweight wall-clock timer for host-side logs.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator, Optional

import jax


def annotate(name: str):
    """Host-side named trace scope (shows in profiler timelines; no-op cost
    otherwise). For code INSIDE ``jit``, use :func:`scope` instead — a
    TraceAnnotation around traced code only annotates tracing time.

    Usable as a context manager::

        with annotate("covariance-build"):
            k = train_covariance_padded(...)
    """
    return jax.profiler.TraceAnnotation(name)


def scope(name: str):
    """Device-side named scope for jitted code: prefixes the XLA op names
    emitted under it, so the hot phases (covariance build, factorization,
    solves, fit steps, NUTS transitions) appear as named groups in
    ``jax.profiler`` / Perfetto device traces. Wired through the library's
    hot paths (``models/gp.py``, ``models/optimizer.py``, ``mcmc/nuts.py``)."""
    return jax.named_scope(name)


@contextlib.contextmanager
def timed(name: str, log: Optional[list] = None) -> Iterator[None]:
    """Host-side wall-clock scope; appends (name, seconds) to ``log``."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        if log is not None:
            log.append((name, dt))


def start_trace(logdir: str) -> None:
    """Begin a profiler trace (view with Perfetto / TensorBoard)."""
    jax.profiler.start_trace(logdir)


def stop_trace() -> None:
    jax.profiler.stop_trace()
