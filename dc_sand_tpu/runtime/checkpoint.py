"""Checkpoint / resume (SURVEY.md §5): the streaming state is tiny —
FIR-history tail, partial accumulators, stream position — saved as npz at
any chunk boundary; resume = reload + continue the chunk loop."""

from __future__ import annotations

import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(runner, path: str) -> None:
    np.savez(
        path,
        history=np.asarray(runner.history),
        vis_acc=np.asarray(runner.vis_acc),
        t0=runner.t0,
        chunk_idx=runner.chunk_idx,
        acc_spectra=runner._acc_spectra,
        acc_integrated=runner._acc_integrated,
        config_hash=runner.cfg.config_hash(),
        host_tail=(runner._host_tail if runner._host_tail is not None
                   else np.zeros(0, np.int8)),
    )


def load_state(runner, path: str) -> None:
    """Restore a runner's carry in place; config hash must match."""
    import jax.numpy as jnp
    z = np.load(path, allow_pickle=False)
    saved_hash = str(z["config_hash"])
    if saved_hash != runner.cfg.config_hash():
        raise ValueError(
            f"checkpoint config hash {saved_hash} != runner config "
            f"{runner.cfg.config_hash()}")
    runner.history = jnp.asarray(z["history"])
    runner.vis_acc = jnp.asarray(z["vis_acc"])
    runner.t0 = int(z["t0"])
    runner.chunk_idx = int(z["chunk_idx"])
    runner._acc_spectra = int(z["acc_spectra"])
    runner._acc_integrated = int(z["acc_integrated"])
    if "host_tail" in z.files and z["host_tail"].size:
        runner._host_tail = z["host_tail"].copy()
