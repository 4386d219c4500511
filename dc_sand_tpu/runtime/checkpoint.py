"""Checkpoint / resume (SURVEY.md §5): the streaming state is tiny —
delay polynomials, gains, beam weights, FIR-history tail, partial
accumulators, stream position — saved as npz at any chunk boundary;
resume = reload + continue the chunk loop.

The delay/weight state is part of the carry on purpose: a resume with a
*drifting* delay model (d1 != 0) must keep drifting from where it left
off, not silently re-zero the polynomials — the golden-equivalence test
drives exactly that case across a save/load boundary.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["save_state", "load_state"]


def save_state(runner, path: str) -> str:
    """Save the runner's carry; returns the ACTUAL file path written
    (np.savez appends '.npz' to an extensionless path — callers must
    report/reload the returned name, not the argument)."""
    if not path.endswith(".npz"):
        path = path + ".npz"
    if getattr(runner, "_mp", False):
        raise NotImplementedError(
            "multi-process checkpoint (per-host shard save) is not "
            "supported yet; checkpoint from a single-process runner")
    dm = runner.delay_model
    c = runner.counters
    np.savez(
        path,
        history=np.asarray(runner.history),
        vis_acc=np.asarray(runner.vis_acc),
        t0=runner.t0,
        chunk_idx=runner.chunk_idx,
        acc_spectra=runner._acc_spectra,
        acc_integrated=runner._acc_integrated,
        acc_first_chunk=runner._acc_first_chunk,
        config_hash=runner.cfg.config_hash(),
        host_tail=(runner._host_tail if runner._host_tail is not None
                   else np.zeros(0, np.int8)),
        # delay/weight model state (SURVEY.md §5 checkpoint row)
        delay_d0=dm.d0, delay_d1=dm.d1, delay_p0=dm.p0, delay_p1=dm.p1,
        delay_max=dm.max_delay,
        gains=np.asarray(runner.gains),
        weights=np.asarray(runner.weights),
        counters=np.array([c.chunks_in, c.chunks_dropped, c.samples_in,
                           c.spectra_out, c.dumps], np.int64),
    )
    return path


def load_state(runner, path: str) -> None:
    """Restore a runner's carry in place; config hash must match."""
    import jax.numpy as jnp
    import os
    if getattr(runner, "_mp", False):
        # mirror save_state: restoring host-local arrays would replace
        # the global sharded carries the multi-process step requires
        raise NotImplementedError(
            "multi-process checkpoint restore is not supported yet; "
            "resume with a single-process runner")
    if not os.path.exists(path) and os.path.exists(path + ".npz"):
        path = path + ".npz"      # accept the pre-normalisation name
    z = np.load(path, allow_pickle=False)
    saved_hash = str(z["config_hash"])
    if saved_hash != runner.cfg.config_hash():
        raise ValueError(
            f"checkpoint config hash {saved_hash} != runner config "
            f"{runner.cfg.config_hash()}")
    if z["history"].shape != tuple(runner.history.shape):
        raise ValueError(
            f"checkpoint history shape {z['history'].shape} != runner's "
            f"{tuple(runner.history.shape)} — saved under a different "
            "step I/O convention (frames vs samples; platform-dependent)")
    runner.history = jnp.asarray(z["history"])
    runner.vis_acc = jnp.asarray(z["vis_acc"])
    runner.t0 = int(z["t0"])
    runner.chunk_idx = int(z["chunk_idx"])
    runner._acc_spectra = int(z["acc_spectra"])
    runner._acc_integrated = int(z["acc_integrated"])
    if "acc_first_chunk" in z.files:
        runner._acc_first_chunk = int(z["acc_first_chunk"])
    if "host_tail" in z.files and z["host_tail"].size:
        runner._host_tail = z["host_tail"].copy()
    if "delay_d0" in z.files:
        if int(z["delay_max"]) != runner.max_delay:
            # the runner's host-tail buffer / step program were built
            # for ITS delay model's max_delay: restoring a different
            # one would either silently skip the coarse gather (runner
            # md=0) or feed a wrong-shaped tail — resume with a runner
            # constructed over an equivalent DelayModel instead
            raise ValueError(
                f"checkpoint delay max_delay {int(z['delay_max'])} != "
                f"runner's {runner.max_delay}; build the resuming "
                "runner with a DelayModel of the same max_delay")
        dm = runner.delay_model
        dm.d0 = z["delay_d0"].copy()
        dm.d1 = z["delay_d1"].copy()
        dm.p0 = z["delay_p0"].copy()
        dm.p1 = z["delay_p1"].copy()
        dm.max_delay = int(z["delay_max"])
        runner.gains = jnp.asarray(z["gains"])
        runner.weights = jnp.asarray(z["weights"])
        c = z["counters"]
        runner.counters = dataclasses.replace(
            runner.counters, chunks_in=int(c[0]), chunks_dropped=int(c[1]),
            samples_in=int(c[2]), spectra_out=int(c[3]), dumps=int(c[4]))
