"""Panel/block-size selection shared by every blocked op.

All streamed/tiled/hybrid/distributed loops need a panel size that divides
the (static) extent exactly; this is the one place that policy lives.
"""

from __future__ import annotations


def pick_block(extent: int, target: int) -> int:
    """Largest divisor of ``extent`` that is <= ``target``.

    Degrades toward 1 for pathological (e.g. prime) extents — correctness
    is preserved, efficiency callers should pad such capacities up front.
    """
    b = min(target, extent)
    while extent % b:
        b -= 1
    return b


#: Panel widths whose monolithic diagonal-block factorization the remote
#: TPU compiler handles comfortably (measured: 6250 compiles, 10000
#:  crashes the helper — BASELINE.md round 2). Wider auto panels get a
#: ``diag_blocks`` split instead (see :func:`auto_diag_blocks`).
MAX_MONOLITHIC_DIAG = 6250

#: The measured optimum for the streamed unrolled factorizer at n=50k is
#: block = cap/10 (10 panels, BASELINE.md round 2: 0.670 s at B=5000 vs
#: 0.909 s at B=2500). The floor keeps SMALL capacities on few fat
#: panels: wide panels cost nothing there (the monolithic diagonal
#: factorization compiles fine below MAX_MONOLITHIC_DIAG), avoid
#: per-panel dispatch, and — for bf16 factor STORAGE — minimize the
#: downdates that read the rounded stored prefix (cap <= 2048 runs as a
#: single panel: zero storage-rounding amplification).
AUTO_PANEL_DIVISOR = 10
AUTO_PANEL_MIN = 2048


def auto_panel_block(cap: int) -> int:
    """Tuned panel width for a streamed build+factor of a ``cap``-sized
    capacity: ``cap / 10`` (the measured optimum at the headline size),
    floored at 2048 (whole cap below that), snapped down to a divisor of
    ``cap``.

    Guarantees the trace-time-unrolled FLOP-optimal program is selected
    for every capacity with a usable divisor (panel count <= the caller's
    ``MAX_UNROLL_PANELS`` = 64 whenever ``cap/block ~ 10``), closing the
    round-2 cliff where the fixed 1024 default silently fell back to the
    ~3x-FLOP ``fori_loop`` program above cap = 65,536.
    """
    target = max(AUTO_PANEL_MIN, cap // AUTO_PANEL_DIVISOR)
    return pick_block(cap, min(target, cap))


def auto_diag_blocks(block: int) -> int:
    """Sub-blocking for a panel's diagonal factorization: 1 while the
    monolithic ``jnp.linalg.cholesky`` is compile-safe, else the smallest
    split that brings each sub-block under :data:`MAX_MONOLITHIC_DIAG`."""
    if block <= MAX_MONOLITHIC_DIAG:
        return 1
    sub = -(-block // MAX_MONOLITHIC_DIAG)  # ceil division
    while block % sub:
        sub += 1
    return sub
