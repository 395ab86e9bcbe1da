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
