#!/usr/bin/env /opt/venv/bin/python
"""Session-9 stage-2 radix sweep: m1 in {128, 256} at the 4k wire
contract shape.

Rationale: stage-2 DFT matmul costs 4*m1 MXU FLOPs/sample (m1=256 ->
1024), and the measured 4k attribution puts stage-2+output at ~25% of
the wall.  m1=128 HALVES the stage-2 MXU work for one extra stage-1
radix-2 pass (+5 VPU FLOP/samp) and a still-tile-aligned stage-2
matmul (K = 2*m1 = 256, N = 2*k1n = 128).  The native-layout path is
NOT eligible (k1n = 64 breaks the CMAC kernel's k1n % 128 gate) — this
is a wire/fengine-metric knob only.

CPU cross-check first (m1 variants vs the jnp fallback at a small
shape), then on-chip timing.
"""

import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "..", "bench", "results")


def require_tunnel(timeout_s: float = 240.0):
    out = []
    t = threading.Thread(
        target=lambda: out.append(__import__("jax").devices()),
        daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        print("TPU tunnel down — aborting sweep", file=sys.stderr)
        raise SystemExit(3)
    print("devices:", out[0], flush=True)


def main() -> int:
    require_tunnel()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dc_sand_tpu.ops.fengine_fused import fengine_fused
    from dc_sand_tpu.bench.harness import time_throughput, BenchResult
    from dc_sand_tpu.bench.pipelines import REALTIME_FLOOR_PER_CHIP
    from dc_sand_tpu.windows import pfb_window

    taps = 16
    shapes = {4096: (64, 128, 256, 512), 1024: (128, 256)}
    which = sys.argv[1:]
    for n_chans, m1s in shapes.items():
        m = 2 * n_chans
        n_streams, n_spectra = 16, 512
        n_frames = n_spectra + taps - 1
        rng = np.random.default_rng(0)
        x = jax.block_until_ready(jax.jit(
            lambda n_frames=n_frames, m=m:
                (jax.random.normal(jax.random.key(0),
                                   (n_streams, n_frames * m)) * 30)
            .astype(jnp.int8))())
        w = pfb_window(taps, m)
        gains = jnp.asarray(np.stack(
            [np.full((n_chans,), 0.05, np.float32),
             np.zeros((n_chans,), np.float32)], -1))
        fd = jnp.asarray(rng.uniform(-0.5, 0.5,
                                     (n_streams, n_spectra)),
                         dtype=jnp.float32)
        ph = jnp.zeros((n_streams, n_spectra), jnp.float32)

        for m1 in m1s:
            if which and f"{n_chans}:{m1}" not in which:
                continue

            def step(xx, fd_, ph_, g_, m1=m1, n_chans=n_chans, w=w):
                return fengine_fused(xx, w, taps, n_chans,
                                     frac_delay=fd_, phase=ph_,
                                     gains=g_, m1=m1, layout="wire")
            try:
                wall = time_throughput(step, (x, fd, ph, gains),
                                       iters=96)
                samples = n_streams * n_spectra * m
                rate = samples / wall
                res = BenchResult(
                    name="fengine_m1_sweep",
                    metric="channelized samples/s/chip", value=rate,
                    unit="samp/s", wall_s=wall,
                    bytes_moved=samples + samples // 2,
                    extra={"n_streams": n_streams,
                           "n_spectra": n_spectra,
                           "n_chans": n_chans, "taps": taps, "m1": m1,
                           "layout": "wire",
                           "vs_realtime_floor":
                               rate / REALTIME_FLOOR_PER_CHIP})
                res.finish().save(RESULTS)
                print(json.dumps({"n_chans": n_chans, "m1": m1,
                                  "gsamp_s": rate / 1e9}),
                      flush=True)
            except Exception as e:
                print(f"n_chans={n_chans} m1={m1}: "
                      f"{type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
