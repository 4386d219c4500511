#!/usr/bin/env /opt/venv/bin/python
"""Round-3 perf probes (run when a tunnel window opens, AFTER the
record refresh — everything here competes for the same chip):

1. (z_mode x groups) at the FULL 4k contract shape — VERDICT r2 weak #5
   asked for the probe-shape concat/g=2 lead (+0.7%) to be confirmed or
   refuted where it matters before flipping defaults.
2. fx-step chunk-size scaling: the X-engine accumulator read+write
   amortises over spectra_per_chunk, so b=1024 may beat the current
   512 at the same real-time latency budget (2.4 -> 4.9 ms of stream).
3. native-CMAC kernel ablations (relayout-only / cmac-only): attributes
   the measured-vs-roofline gap (6.2 ms vs ~2 ms at b=512) to MXU
   phases vs DMA/fixed cost.

Each timing rides time_throughput's scan+perturb protocol and records a
JSON into bench/results.
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
    import jax
    import jax.numpy as jnp
    import numpy as np
    from dc_sand_tpu.bench.harness import time_throughput
    from dc_sand_tpu import ops

    which = set(sys.argv[1:]) or {"zmode", "fxstep", "ablate"}

    if "zmode" in which:
        # -- 1: z_mode x groups at the contract shape ------------------
        # kernel-level variant sweep via the occupancy-sweep harness
        # (bench_fengine has no z/group knobs)
        print("== z_mode x groups @ 4k contract shape", flush=True)
        sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
        from sweep_stage2_occupancy import bench_variant
        for z_mode in ("scratch", "concat"):
            for groups in (4, 2, 1):
                try:
                    rate = bench_variant(16, 512, tb=64, groups=groups,
                                         fir_mode="mxu", iters=64,
                                         z_mode=z_mode)
                    # bench_variant saves its own record into RESULTS
                    print(json.dumps({"z_mode": z_mode, "groups": groups,
                                      "gsamp_s": rate / 1e9}),
                          flush=True)
                except Exception as e:
                    print(f"z_mode={z_mode} g={groups}: "
                          f"{type(e).__name__}: {e}", flush=True)

    if "fxstep" in which:
        # -- 2: fx step at 512 vs 1024-spectra chunks ------------------
        print("== fx step chunk-size scaling", flush=True)
        from dc_sand_tpu.bench.pipelines import bench_fx_step
        for b in (1024,):
            try:
                r = bench_fx_step(n_chans=4096, n_spectra=b, iters=32)
                print(json.dumps({"n_spectra": b,
                                  "gsamp_s": r.value / 1e9,
                                  "vs_floor":
                                      r.extra["vs_realtime_floor"]}),
                      flush=True)
                r.save(RESULTS)
            except Exception as e:
                print(f"fx_step b={b}: {type(e).__name__}: {e}",
                      flush=True)

    if "ablate" in which:
        # -- 3: native-CMAC ablations ----------------------------------
        print("== native CMAC ablations @ b=512", flush=True)
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
            print(json.dumps({"ablate": tag, "wall_ms": wall * 1e3}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
