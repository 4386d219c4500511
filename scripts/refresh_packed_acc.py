#!/usr/bin/env /opt/venv/bin/python
"""Post-packed-accumulator on-chip refresh: every record the (k, ap, ap)
packed X-engine carry touches — CMAC rates at both cadences, the DMA
ablation (did halving the acc traffic move the measured floor?), the
full fx step at 512/1024-spectra chunks, and the flagship fx64 verify.

Run stages in order; each prints a JSON line and saves a record.
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
        print("TPU tunnel down — aborting", file=sys.stderr)
        raise SystemExit(3)
    print("devices:", out[0], flush=True)


def main() -> int:
    require_tunnel()
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dc_sand_tpu import ops
    from dc_sand_tpu.bench.harness import time_throughput

    which = set(sys.argv[1:]) or {"xcorr", "ablate", "fxstep"}

    if "xcorr" in which:
        from dc_sand_tpu.bench.kernels import bench_xcorr
        for b in (1024,):
            r = bench_xcorr(mode="native", n_spectra=b, iters=32)
            r.save(RESULTS)
            print(json.dumps({"stage": "xcorr_native", "n_spectra": b,
                              "int8_tops": r.extra.get("int8_tops"),
                              "value": r.value}), flush=True)

    if "ablate" in which:
        from dc_sand_tpu.ops.fengine_fused import native_factor
        m2, k1n = native_factor(4096)
        qn = jax.block_until_ready(jax.jit(
            lambda: (jax.random.normal(
                jax.random.key(0), (64, 2, m2, 2, 512, k1n)) * 30)
            .astype(jnp.int8))())
        acc = jax.block_until_ready(
            jnp.zeros(ops.acc_shape(64, 2, 4096), jnp.int32))
        for tag, abl in (("full", ()), ("no_relayout", ("relayout",)),
                         ("no_cmac", ("cmac",)),
                         ("dma_only", ("relayout", "cmac"))):
            wall = time_throughput(
                lambda q_, a_: ops.xcorr_accumulate_native(
                    a_, q_, _ablate=abl),
                (qn, acc), iters=32)
            print(json.dumps({"stage": "ablate", "ablate": tag,
                              "wall_ms": wall * 1e3}), flush=True)

    if "fxstep" in which:
        from dc_sand_tpu.bench.pipelines import bench_fx_step
        for b in (512, 1024):
            r = bench_fx_step(n_chans=4096, n_spectra=b, iters=32)
            r.save(RESULTS)
            print(json.dumps({"stage": "fx_step", "n_spectra": b,
                              "gsamp_s": r.value / 1e9,
                              "vs_floor":
                                  r.extra["vs_realtime_floor"]}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
