"""Multi-host SPMD entry (C15's DCN side).

On a pod slice every host runs the same program: call
``init_distributed()`` first (reads the TPU env or explicit args), then
build the mesh over ``jax.devices()`` (all chips, all hosts) — XLA routes
intra-slice collectives over ICI and inter-host traffic over DCN
(BASELINE.json:5).  The streaming runner then feeds each host only its
local antennas' packets (``local_antenna_range``).

This dev box has a single chip, so the multi-host path is validated by
the CPU-mesh tests and ``dryrun_multichip``; on real hardware the same
code runs unchanged — the scaling-efficiency measurement at 1 chip /
1 host / N hosts (BASELINE.json:5) uses ``cli bench`` per host.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax

__all__ = ["init_distributed", "local_antenna_range"]


def init_distributed(coordinator: Optional[str] = None,
                     num_processes: Optional[int] = None,
                     process_id: Optional[int] = None) -> dict:
    """Initialise jax.distributed (no-op when single-process).

    With no args, jax auto-detects TPU pod metadata; args override for
    manual bring-up (e.g. ``coordinator="host0:8476"``).
    """
    if num_processes is not None and num_processes > 1 or coordinator:
        jax.distributed.initialize(coordinator_address=coordinator,
                                   num_processes=num_processes,
                                   process_id=process_id)
    return {
        "process_index": jax.process_index(),
        "process_count": jax.process_count(),
        "local_devices": len(jax.local_devices()),
        "global_devices": len(jax.devices()),
    }


def local_antenna_range(n_ants: int) -> Tuple[int, int]:
    """[start, stop) antennas this host ingests: the antenna axis is
    sharded contiguously over processes, matching the mesh layout built
    from ``jax.devices()`` (process-major device order)."""
    p, n = jax.process_index(), jax.process_count()
    if n_ants % n:
        raise ValueError(f"{n_ants} antennas not divisible over {n} hosts")
    per = n_ants // n
    return p * per, (p + 1) * per
