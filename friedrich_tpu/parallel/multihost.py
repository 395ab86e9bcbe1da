"""Multi-host runtime initialization.

One-call setup for running on a multi-host TPU pod slice. All mesh/
shard_map code in this package is host-count-agnostic: the same programs
run unchanged once ``initialize()`` has been called on every host
(``jax.distributed.initialize`` wires the hosts; ``jax.devices()`` then
spans the full slice and ``make_matrix_mesh()``/``make_chain_mesh()``
build global meshes).
"""

from __future__ import annotations

from typing import Optional

import jax


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> dict:
    """Initialize the multi-host runtime; no-op on a single host.

    On TPU pods the arguments are auto-detected from the environment; pass
    them explicitly only for manual cluster setups. Returns a summary dict
    (process index/count, local/global device counts).
    """
    if num_processes is None and coordinator_address is None:
        try:
            jax.distributed.initialize()
        except Exception as e:  # pragma: no cover - environment dependent
            # Single-process environments raise here, which is fine — but a
            # REAL pod-init failure must not silently degrade to one host.
            import warnings

            warnings.warn(
                f"jax.distributed.initialize() failed ({e}); continuing "
                f"single-process. If this is a multi-host pod, fix the "
                f"coordinator setup — collectives will otherwise span only "
                f"local devices.",
                RuntimeWarning,
            )
    else:
        jax.distributed.initialize(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }
