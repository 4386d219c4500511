#!/usr/bin/env /opt/venv/bin/python
"""Session-9 production-cadence sweep: the F-engine and the native CMAC
both amortise fixed costs over spectra-per-chunk (the CMAC's plane-
resident accumulator traffic scales 1/nt), so the production chunk size
is a knob worth re-picking from data.  This measures the full-chain
F-engine at the 4k contract shape for b in {512, 1024, 2048} — the
companion CMAC numbers come from sweep_s9_cmac probe2 — to decide the
fx64 preset's spectra_per_chunk.

Real-time context: one 2048-spectra chunk is 9.8 ms of stream at the
856 MHz contract rate — latency is not a constraint at correlator dump
cadences (~0.5 s); HBM is (qn 2.15 GB/chunk at b=2048, fine in 16 GB).
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
    from dc_sand_tpu.bench.pipelines import bench_fengine

    for b in (512, 1024, 2048):
        try:
            r = bench_fengine(n_streams=16, n_spectra=b, n_chans=4096,
                              taps=16, impl="auto", full_chain=True,
                              iters=max(32, 192 // (b // 512)))
            r.save(RESULTS)
            print(json.dumps({"n_spectra": b,
                              "gsamp_s": r.value / 1e9,
                              "vs_floor":
                                  r.extra["vs_realtime_floor"]}),
                  flush=True)
        except Exception as e:
            print(f"fengine b={b}: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
