"""Device-mesh construction (C13).

One logical axis ``fx`` covers the standard deployment: antenna-sharded
F-engines before the corner-turn, channel-sharded X/B-engines after — the
same chips play both roles (colocated F/X, SURVEY.md §2.3 PP row).  An
optional ``time`` axis enables stream (sequence-parallel) sharding with
halo exchange.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
from jax.sharding import Mesh

FX_AXIS = "fx"
TIME_AXIS = "time"

__all__ = ["build_mesh", "FX_AXIS", "TIME_AXIS"]


def build_mesh(n_devices: Optional[int] = None,
               devices: Optional[Sequence] = None,
               time_shards: int = 1, time_local: bool = False) -> Mesh:
    """Build a ``(time, fx)`` mesh over the given devices.

    ``time_shards=1`` (default) gives the pure FX layout; >1 additionally
    shards the sample stream (halo exchange becomes active).  On a real
    pod slice, callers pass ``jax.devices()`` after
    ``jax.distributed.initialize()`` and XLA maps the axes onto ICI/DCN.

    ``time_local=True`` lays the TIME axis out within each process's
    contiguous device block (fx across processes, time across each
    host's local chips) — the ingest-locality layout the multi-process
    SP streaming runner requires: one host receives its antennas' whole
    contiguous stream and its local chips split it in time, so the
    overlap-save halo rides ICI, never DCN.  The default (time-major)
    layout spreads each time shard across all processes — right for
    model-level SP tests, unusable for a streaming feed."""
    if devices is None:
        # honour a pinned jax_default_device (tests pin cpu on the axon
        # dev box, where jax.devices() would return the tunnelled TPU)
        pinned = jax.config.jax_default_device
        if pinned is not None:
            platform = pinned if isinstance(pinned, str) else pinned.platform
            devices = jax.devices(platform)
        else:
            devices = jax.devices()
    if n_devices is not None:
        if len(devices) < n_devices:
            # not enough on the default platform: fall back to the
            # virtual CPU pool (the dev-box path) rather than silently
            # building a smaller mesh than requested
            try:
                cpu = jax.devices("cpu")
            except RuntimeError:
                cpu = []
            if len(cpu) >= n_devices:
                devices = cpu
            else:
                raise ValueError(
                    f"requested {n_devices} devices, have {len(devices)}"
                    f" ({len(cpu)} cpu)")
        devices = devices[:n_devices]
    n = len(devices)
    if n % time_shards:
        raise ValueError(f"{n} devices not divisible by {time_shards} "
                         "time shards")
    import numpy as np
    if time_local:
        arr = np.asarray(devices).reshape(n // time_shards, time_shards).T
    else:
        arr = np.asarray(devices).reshape(time_shards, n // time_shards)
    return Mesh(arr, (TIME_AXIS, FX_AXIS))
