#!/usr/bin/env /opt/venv/bin/python
"""Session-10 floor decomposition: the all-compute-ablated kernel's
1.71 ms is additive with the compute phases (1.585 + 1.714 = 3.30 ~
3.31 ms full) — nothing overlaps.  Separate (a) per-grid-step cost
(tb=128 halves the step count at the same bytes) from (b) the XLA
decode pass (layout='native' drops it).
"""

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

FLOOR = "no_output,no_stage2,no_twiddle,no_fft,no_fir,no_convert"


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

    cases = [
        ("tb=64  wire  ", dict(tb=64, layout="wire")),
        ("tb=64  native", dict(tb=64, layout="native")),
        ("tb=128 wire  ", dict(tb=128, layout="wire")),
        ("tb=128 native", dict(tb=128, layout="native")),
    ]
    for label, kw in cases:
        def step(xx, fd_, ph_, g_, kw=kw):
            return fengine_fused(xx, w, taps, n_chans, frac_delay=fd_,
                                 phase=ph_, gains=g_, m1=128, groups=8,
                                 _ablate=FLOOR, **kw)
        try:
            wall = time_throughput(step, (x, fd, ph, gains), iters=128)
            print(f"{label} {wall*1e3:7.3f} ms  "
                  f"{samples/wall/1e9:6.2f} G", flush=True)
        except Exception as e:
            print(f"{label} FAILED {type(e).__name__}: {e}", flush=True)


if __name__ == "__main__":
    main()
