#!/usr/bin/env /opt/venv/bin/python
"""Tunnel-window sweep: stage-2 MXU occupancy via the ``groups`` tiling.

Lead (STATUS.md session-3 ablation): at the 4k contract shape the fused
kernel's in-kernel stage-2 runs ~31% of MXU peak with M = (m2/groups)*tb
= 1024 rows per matmul (groups=2).  The 12 MB ``_VMEM_BUDGET`` tiling
model predates the raised 64 MB ``vmem_limit_bytes`` compiler cap, so
``groups=1`` (M=2048, one stage-2 matmul per tile, z-scratch 8 MB) was
never measured — it halves the per-tile matmul count and doubles M.

Protocol (axon quirks — see bench/harness.py):
  * probe shape first (4 streams x 256 spectra: ~1 min server compile)
    for candidate ratios; the contract shape (16 x 512) only for the
    winner(s) — its compile is the 10-25 min roulette;
  * every timing via time_throughput's scan+perturb protocol;
  * each variant records a JSON into bench/results (platform-keyed).

Run: /opt/venv/bin/python scripts/sweep_stage2_occupancy.py [--full]
  --full also re-times the current default at the contract shape and
  any probe-winner that beats it by >3%.
"""

import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

N_CHANS = 4096
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


def bench_variant(n_streams, n_spectra, *, tb, groups, fir_mode,
                  iters, layout="wire", z_mode="scratch", m1=None):
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dc_sand_tpu.ops.fengine_fused import fengine_fused
    from dc_sand_tpu.bench.harness import time_throughput, BenchResult
    from dc_sand_tpu.bench.pipelines import REALTIME_FLOOR_PER_CHIP
    from dc_sand_tpu.windows import pfb_window

    m = 2 * N_CHANS
    n_frames = n_spectra + TAPS - 1
    rng = np.random.default_rng(0)
    x = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0),
                                   (n_streams, n_frames * m)) * 30)
        .astype(jnp.int8))())
    w = pfb_window(TAPS, m)
    gains = jnp.asarray(np.stack([np.full((N_CHANS,), 0.05, np.float32),
                                  np.zeros((N_CHANS,), np.float32)], -1))
    fd = jnp.asarray(rng.uniform(-0.5, 0.5, (n_streams, n_spectra)),
                     dtype=jnp.float32)
    ph = jnp.zeros((n_streams, n_spectra), jnp.float32)

    def step(xx, fd_, ph_, g_):
        return fengine_fused(xx, w, TAPS, N_CHANS, frac_delay=fd_,
                             phase=ph_, gains=g_, tb=tb, groups=groups,
                             fir_mode=fir_mode, layout=layout,
                             z_mode=z_mode, m1=m1)

    wall = time_throughput(step, (x, fd, ph, gains), iters=iters)
    samples = n_streams * n_spectra * m
    rate = samples / wall
    res = BenchResult(
        name="fengine_tile_sweep",
        metric="channelized samples/s/chip", value=rate, unit="samp/s",
        wall_s=wall, bytes_moved=samples + samples // 2,
        extra={"n_streams": n_streams, "n_spectra": n_spectra,
               "n_chans": N_CHANS, "taps": TAPS, "tb": tb,
               "groups": groups, "fir_mode": fir_mode, "layout": layout,
               "z_mode": z_mode, "m1": m1,
               "vs_realtime_floor": rate / REALTIME_FLOOR_PER_CHIP},
    ).finish()
    res.save(RESULTS)
    print(f"  tb={tb} groups={groups} z={z_mode} fir={fir_mode} "
          f"layout={layout}: "
          f"{rate/1e9:.2f} Gsamp/s "
          f"({rate/REALTIME_FLOOR_PER_CHIP:.2f}x floor)")
    return rate


def main():
    require_tunnel()
    full = "--full" in sys.argv

    # probe shape: candidate ratios (compiles ~1 min each).
    # (groups, z_mode) axes: groups=1 doubles the stage-2 matmul M-dim
    # (occupancy); z_mode="concat" drops the VMEM Z-scratch round trip
    # (floor); both bitwise-identical to the default (interpret-tested).
    print("== probe shape 4x256 (ratios)")
    cands = (
        # NOTE (post-run correction): (64, 2) was mislabelled "current
        # default" when this sweep was written — the auto policy's VMEM
        # model admits groups=1 at m=8192, so the default was (64, 1).
        # sweep_groups_shapes.py added the same-harness g=1 legs.
        (64, 2, "scratch"),
        (64, 1, "scratch"),
        (64, 4, "scratch"),
        (64, 2, "concat"),
        (64, 1, "concat"),
    )
    probe = {}
    for tb, groups, zm in cands:
        try:
            probe[(tb, groups, zm)] = bench_variant(
                4, 256, tb=tb, groups=groups, fir_mode="mxu",
                z_mode=zm, iters=128)
        except Exception as e:
            print(f"  tb={tb} groups={groups} z={zm}: FAILED "
                  f"{type(e).__name__}: {e}")
    if not probe:
        raise SystemExit(1)
    base = probe.get((64, 2, "scratch"))
    best = max(probe, key=probe.get)
    print(f"probe winner: tb={best[0]} groups={best[1]} z={best[2]}"
          + (f" ({probe[best]/base - 1:+.1%} vs default)" if base else ""))

    if not full:
        return
    # contract shape: default + any >3% probe winner
    print("== contract shape 16x512")
    run = {(64, 2, "scratch")}
    if base and probe[best] > 1.03 * base:
        run.add(best)
    for tb, groups, zm in sorted(run):
        try:
            bench_variant(16, 512, tb=tb, groups=groups, fir_mode="mxu",
                          z_mode=zm, iters=192)
        except Exception as e:
            print(f"  tb={tb} groups={groups} z={zm}: FAILED "
                  f"{type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
