#!/usr/bin/env /opt/venv/bin/python
"""Session-10 attribution of the 4k wire kernel at the m1=128 radix.

The m1=256 attribution (session 8) said floor ~41% / stage-2+output
~25%; m1=128 halved the stage-2 MXU work, so the shares must be
re-measured before choosing the next lever (VERDICT r3 weak #6: the
speed-of-light clause has no diminishing-returns escape hatch).
Cumulative ablations: each flag removes one phase; successive deltas
attribute per-phase walls.  Ablated kernels produce WRONG output —
timing only.
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ABLATES = [
    None,                                    # full kernel
    "no_output",                             # - requant/phasor/output
    "no_output,no_stage2",                   # - stage-2 matmul DFT
    "no_output,no_stage2,no_twiddle",        # - twiddle apply
    "no_output,no_stage2,no_twiddle,no_fft",  # - stage-1 radix
    "no_output,no_stage2,no_twiddle,no_fft,no_fir",  # DMA+decode floor
    "no_output,no_stage2,no_twiddle,no_fft,no_fir,no_convert",
    # ^ floor minus MOST of the int8->fp32 unpack: the probe still
    #   tiles one converted 8-row block through tb//8 concatenates, so
    #   a small fraction of the unpack cost remains in this "floor"
    #   bucket; what's left is DMA in/out, the (wire) decode pass,
    #   per-grid-step fixed cost, and that concat residue
]

LAYOUT = "wire_flat" if "--flat" in sys.argv else "wire"


def main():
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dc_sand_tpu.ops.fengine_fused import fengine_fused
    from dc_sand_tpu.bench.harness import time_throughput
    from dc_sand_tpu.windows import pfb_window

    taps, n_chans = 16, 4096
    m = 2 * n_chans
    n_streams, n_spectra = 16, 512
    n_frames = n_spectra + taps - 1
    rng = np.random.default_rng(0)
    x = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0),
                                   (n_streams, n_frames * m)) * 30)
        .astype(jnp.int8))())
    w = pfb_window(taps, m)
    gains = jnp.asarray(np.stack(
        [np.full((n_chans,), 0.05, np.float32),
         np.zeros((n_chans,), np.float32)], -1))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, (n_streams, n_spectra)),
                     dtype=jnp.float32)
    ph = jnp.zeros((n_streams, n_spectra), jnp.float32)
    samples = n_streams * n_spectra * m

    prev = None
    for ab in ABLATES:
        def step(xx, fd_, ph_, g_, ab=ab):
            return fengine_fused(xx, w, taps, n_chans, frac_delay=fd_,
                                 phase=ph_, gains=g_, m1=128,
                                 layout=LAYOUT, _ablate=ab)
        wall = time_throughput(step, (x, fd, ph, gains), iters=128)
        ms = wall * 1e3
        delta = "" if prev is None else f"  (phase {prev - ms:+.3f} ms)"
        print(f"{ab or 'FULL':<50s} {ms:7.3f} ms "
              f"{samples/wall/1e9:6.2f} G{delta}", flush=True)
        prev = ms


if __name__ == "__main__":
    main()
