#!/usr/bin/env /opt/venv/bin/python
"""Round-5 F-engine irreducibility table (VERDICT r4 #5).

Runs the cumulative ablation ladder at the 4k contract shape on the
LIVE chip and maps every phase delta against its analytic bound at the
MEASURED unit rates (bench/results microbenches: VPU fp32 FMA 3.86 TF,
hand bf16x3 split ~49 TF-equivalent, bf16 MXU ~20 TF at XLA level,
cos+sin 26.5 Gelem/s, HBM triad ~600 GB/s of the 819 peak).  The
output is the "name every remaining millisecond" table: per phase,
measured ms, bound ms, and the gap factor — recorded to bench/results
as `fengine_floor_table` so the conclusion is an auditable artifact,
not prose.

Phases (cumulative ablation, wire layout, m1=128, tb=64):
  output  : post-stage-2 phasor + gain + requant + store
  stage2  : the [Cr|Ci] matmul-DFT (bf16x3, 4*m1 FLOP/sample)
  twiddle : per-(k2) twiddle apply between stages
  stage1  : iterative DIF radix-2 over m2 lane blocks (VPU)
  fir     : 16-tap FIR = MXU shifted-identity operand builds + VPU FMAs
  convert : int8 -> fp32 unpack of the input tile
  floor   : HBM DMA in/out + (wire) decode transpose + per-grid-step
            fixed cost + the 8-row concat residue of the convert probe

Usage: r5_fengine_floor_table.py [--native]
"""

import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

ABLATES = [
    None,
    "no_output",
    "no_output,no_stage2",
    "no_output,no_stage2,no_twiddle",
    "no_output,no_stage2,no_twiddle,no_fft",
    "no_output,no_stage2,no_twiddle,no_fft,no_fir",
    "no_output,no_stage2,no_twiddle,no_fft,no_fir,no_convert",
]
PHASES = ["output", "stage2", "twiddle", "stage1", "fir", "convert"]

# measured unit rates (bench/results microbenches, v5e single chip)
VPU_TF = 3.86        # fp32 FMA stream
BF16X3_TF = 49.0     # hand hi/lo-split stage-2 effective rate
BF16_TF = 20.0       # XLA-level bf16 matmul (shifted-identity dots)
HBM_GBS = 600.0      # achievable triad; peak 819


def require_tunnel(timeout_s: float = 240.0):
    out = []
    t = threading.Thread(
        target=lambda: out.append(__import__("jax").devices()),
        daemon=True)
    t.start()
    t.join(timeout_s)
    if not out:
        print("TPU tunnel down — aborting", file=sys.stderr)
        raise SystemExit(3)
    print("devices:", out[0], flush=True)


def bounds_ms(n_samples, taps, m1, m2, layout):
    """Analytic per-phase floors at the measured unit rates, ms."""
    n = n_samples
    rows = 16 + 64  # taps_pad + tb at the 4k tile policy
    return {
        # phasor+gain+requant ~16 flop on half-width outputs = 8/sample
        "output": 8 * n / (VPU_TF * 1e12) * 1e3,
        "stage2": 4 * m1 * n / (BF16X3_TF * 1e12) * 1e3,
        "twiddle": 6 * n / (VPU_TF * 1e12) * 1e3,
        # 5 flop-ish per butterfly stage per sample, log2(m2) stages
        "stage1": 5 * (m2 - 1).bit_length() * n / (VPU_TF * 1e12) * 1e3,
        # MXU shifted-identity operand builds (8 dots, 2*rows flop/samp
        # at the bf16 XLA-level rate) + 2*taps VPU FMAs
        "fir": (2 * rows * 8 * n / (BF16_TF * 1e12)
                + 2 * taps * n / (VPU_TF * 1e12)) * 1e3,
        # one fp32 broadcast-convert pass over the tile
        "convert": 1 * n / (VPU_TF * 1e12) * 1e3,
        # int8 in + complex-int8 out (+ decode read+write for wire)
        "floor": ((1 + 2 + (4 if layout == "wire" else 0)) * n
                  / (HBM_GBS * 1e9) * 1e3),
    }


def main() -> int:
    require_tunnel()
    import numpy as np
    import jax
    import jax.numpy as jnp
    from dc_sand_tpu.ops.fengine_fused import fengine_fused, _factor
    from dc_sand_tpu.bench.harness import BenchResult, time_throughput
    from dc_sand_tpu.windows import pfb_window

    layout = "native" if "--native" in sys.argv else "wire"
    taps, n_chans = 16, 4096
    m = 2 * n_chans
    m1 = None if layout == "native" else 128
    m1v, m2 = _factor(m, m1)
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

    walls = []
    for ab in ABLATES:
        def step(xx, fd_, ph_, g_, ab=ab):
            return fengine_fused(xx, w, taps, n_chans, frac_delay=fd_,
                                 phase=ph_, gains=g_, m1=m1,
                                 layout=layout, _ablate=ab)
        wall = time_throughput(step, (x, fd, ph, gains), iters=128)
        walls.append(wall * 1e3)
        print(f"{ab or 'FULL':<58s} {wall*1e3:7.3f} ms "
              f"{samples/wall/1e9:6.2f} G", flush=True)

    bnd = bounds_ms(samples, taps, m1v, m2, layout)
    table = {}
    print(f"\n{'phase':<9s} {'measured':>9s} {'bound':>8s} {'gap':>6s}",
          flush=True)
    for i, phase in enumerate(PHASES):
        meas = walls[i] - walls[i + 1]
        gap = meas / bnd[phase] if bnd[phase] > 0 else float("nan")
        table[phase] = {"measured_ms": round(meas, 4),
                        "bound_ms": round(bnd[phase], 4),
                        "gap_x": round(gap, 2)}
        print(f"{phase:<9s} {meas:8.3f}  {bnd[phase]:7.3f}  {gap:5.2f}x",
              flush=True)
    meas = walls[-1]
    table["floor"] = {"measured_ms": round(meas, 4),
                      "bound_ms": round(bnd["floor"], 4),
                      "gap_x": round(meas / bnd["floor"], 2)}
    print(f"{'floor':<9s} {meas:8.3f}  {bnd['floor']:7.3f}  "
          f"{meas/bnd['floor']:5.2f}x", flush=True)

    res = BenchResult(
        name=f"fengine_floor_table_{layout}",
        metric="full_kernel_wall", value=walls[0], unit="ms",
        wall_s=walls[0] / 1e3,
        extra={"layout": layout, "m1": m1v, "m2": m2,
               "n_streams": n_streams, "n_spectra": n_spectra,
               "n_chans": n_chans, "samples": samples,
               "gsamp_s": samples / walls[0] / 1e6,
               "unit_rates": {"vpu_tf": VPU_TF, "bf16x3_tf": BF16X3_TF,
                              "bf16_tf": BF16_TF, "hbm_gbs": HBM_GBS},
               "table": table}).finish()
    path = res.save(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "bench", "results"))
    print("recorded:", path, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
