#!/usr/bin/env /opt/venv/bin/python
"""Tunnel-window sweep: ``groups`` across the shapes the policy serves.

The session-5 sweep (scripts/sweep_stage2_occupancy.py) measured the
4k wire shape: groups=4 (19.71 Gsamp/s) vs groups=2 (18.81);
z_mode=concat lost (9.7 at the probe shape) and is ruled out.
CORRECTION found while closing the holes: that sweep mislabelled
groups=2 as "current default" — _choose_tiling's model admits groups=1
at m=8192 (est 12.32 MB <= the 12.58 MB budget), so the auto policy
had picked (tb=64, groups=1) at BOTH contract shapes all along; the
recorded auto headlines are g=1 numbers.  This sweep adds the g=1
bench_variant legs for a same-harness comparison, plus:

  * 1k chans (m=2048, m2=8): no groups variant had been measured;
  * native layout (the FX-step / B-engine fast path skips the wire
    transpose): groups was only swept on the wire path.

Outcome (16x512 contract shape, all recorded): 1k wire g=1 17.35 over
g=4 15.74; 4k wire g=4 19.71 over g=1 19.47 over g=2 18.81; 4k native
g=4 16.93 ~ g=1 16.92 over g=2 16.74.  Policy now prefers g=1 at
m<=4096 and g=4 at m>=8192 (_GROUP_CANDIDATES[_BIG_M]).

Protocol identical to sweep_stage2_occupancy.py: probe shape (4x256)
first, contract shape (16x512) only for material winners; every timing
via time_throughput's scan+perturb protocol; JSON records per variant.

Run: /opt/venv/bin/python scripts/sweep_groups_shapes.py [--full]
"""

import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

TAPS = 16
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
    print("devices:", out[0])


def bench_variant(n_streams, n_spectra, n_chans, *, tb, groups,
                  iters, layout="wire"):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dc_sand_tpu.ops.fengine_fused import fengine_fused
    from dc_sand_tpu.bench.harness import time_throughput, BenchResult
    from dc_sand_tpu.bench.pipelines import REALTIME_FLOOR_PER_CHIP
    from dc_sand_tpu.windows import pfb_window

    m = 2 * n_chans
    n_frames = n_spectra + TAPS - 1
    rng = np.random.default_rng(0)
    x = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0),
                                   (n_streams, n_frames * m)) * 30)
        .astype(jnp.int8))())
    w = pfb_window(TAPS, m)
    gains = jnp.asarray(np.stack([np.full((n_chans,), 0.05, np.float32),
                                  np.zeros((n_chans,), np.float32)], -1))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, (n_streams, n_spectra)),
                     dtype=jnp.float32)
    ph = jnp.zeros((n_streams, n_spectra), jnp.float32)

    def step(xx, fd_, ph_, g_):
        return fengine_fused(xx, w, TAPS, n_chans, frac_delay=fd_,
                             phase=ph_, gains=g_, tb=tb, groups=groups,
                             fir_mode="mxu", layout=layout)

    wall = time_throughput(step, (x, fd, ph, gains), iters=iters)
    samples = n_streams * n_spectra * m
    rate = samples / wall
    res = BenchResult(
        name="fengine_tile_sweep",
        metric="channelized samples/s/chip", value=rate, unit="samp/s",
        wall_s=wall, bytes_moved=samples + samples // 2,
        extra={"n_streams": n_streams, "n_spectra": n_spectra,
               "n_chans": n_chans, "taps": TAPS, "tb": tb,
               "groups": groups, "fir_mode": "mxu", "layout": layout,
               "vs_realtime_floor": rate / REALTIME_FLOOR_PER_CHIP},
    ).finish()
    res.save(RESULTS)
    print(f"  chans={n_chans} tb={tb} groups={groups} layout={layout}: "
          f"{rate/1e9:.2f} Gsamp/s "
          f"({rate/REALTIME_FLOOR_PER_CHIP:.2f}x floor)", flush=True)
    return rate


def main():
    require_tunnel()
    full = "--full" in sys.argv

    print("== probe 4x256: 1k wire (policy default groups=1)")
    p1k = {}
    for g in (1, 2, 4):
        try:
            p1k[g] = bench_variant(4, 256, 1024, tb=64, groups=g,
                                   iters=128)
        except Exception as e:
            print(f"  1k groups={g}: FAILED {type(e).__name__}: {e}")

    print("== probe 4x256: 4k native (FX-step path, policy groups=2)")
    p4n = {}
    for g in (2, 4):
        try:
            p4n[g] = bench_variant(4, 256, 4096, tb=64, groups=g,
                                   iters=128, layout="native")
        except Exception as e:
            print(f"  4k native groups={g}: FAILED {type(e).__name__}: {e}")

    if not full:
        return
    print("== contract shape 16x512 (winners + defaults)")
    # 1k: default groups=1 plus any probe winner >3% over it
    if p1k:
        run = {1}
        best = max(p1k, key=p1k.get)
        if 1 in p1k and p1k[best] > 1.03 * p1k[1]:
            run.add(best)
        for g in sorted(run):
            try:
                bench_variant(16, 512, 1024, tb=64, groups=g, iters=128)
            except Exception as e:
                print(f"  1k full groups={g}: FAILED "
                      f"{type(e).__name__}: {e}")
    # 4k native: both (the wire sweep says 4 should win; confirm on the
    # layout the FX step actually uses)
    for g in sorted(p4n):
        try:
            bench_variant(16, 512, 4096, tb=64, groups=g, iters=192,
                          layout="native")
        except Exception as e:
            print(f"  4k native full groups={g}: FAILED "
                  f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
