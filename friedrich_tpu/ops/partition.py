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


#: Measured optimum sub-width for the per-panel trailing solves and
#: diagonal factorizations (n=50k, B=5000 sweep, BASELINE.md round 3):
#: splitting each panel solve into ~1024-wide blocked substitution steps
#: beats both the single inverse-GEMM (solve_blocks=1: 0.675 s) and
#: finer splits (625-wide: 0.601 s) — 0.567 s at 1000-wide.
SUB_TARGET = 1024


def _nearest_divisor(extent: int, target: int) -> int:
    """Divisor of ``extent`` closest to ``target`` (ties: smaller)."""
    best, best_d = 1, abs(target - 1)
    f = 1
    while f * f <= extent:
        if extent % f == 0:
            for cand in (f, extent // f):
                d = abs(target - cand)
                if d < best_d or (d == best_d and cand < best):
                    best, best_d = cand, d
        f += 1
    return best


def auto_solve_blocks(block: int) -> int:
    """Sub-blocking for each panel's trailing solve: target ~1024-wide
    steps (the measured optimum, see :data:`SUB_TARGET`), snapped to a
    divisor of the panel width; 1 for panels at/below the target."""
    if block <= SUB_TARGET:
        return 1
    return _nearest_divisor(block, max(1, round(block / SUB_TARGET)))


def auto_diag_blocks(block: int) -> int:
    """Sub-blocking for a panel's diagonal factorization. Two forces:
    the monolithic ``jnp.linalg.cholesky`` above
    :data:`MAX_MONOLITHIC_DIAG` crashes the TPU compile helper (hard
    constraint), and ~1024-wide sub-blocks measured fastest even where
    the monolithic op compiles (B=5000: diag_blocks=5 shaved ~2% off the
    headline). Same policy as :func:`auto_solve_blocks`, with a
    hard-constraint fallback for widths whose divisors are coarse."""
    if block <= SUB_TARGET:
        return 1
    sub = _nearest_divisor(block, max(1, round(block / SUB_TARGET)))
    while block // sub > MAX_MONOLITHIC_DIAG:  # compile-safety floor
        sub += 1
        while block % sub:
            sub += 1
    return sub
