#!/usr/bin/env /opt/venv/bin/python
"""Round-5 CMAC overlap sweep (VERDICT r4 #3: 115 -> ~182 int8 TOPS).

The s9 multi-tile kernel measured wall ~= DMA floor + MXU summed
(10.04 ms at b=2048 vs 6.0 DMA + ~4 MXU) — near-fully SERIAL, i.e.
Mosaic's automatic qn block pipelining is not overlapping the 16.8 MB
per-step fetch with compute.  Two levers, both named by the verdict:

  pipe : the _qn_pipe manual two-slot qn streaming kernel (cross-plane
         prefetch, plane flush overlapped with the next plane's fetch)
  bc   : retune the spectra sub-tile at b=2048 under the no-alias
         default (the s9 bc sweep predates no-alias + static unroll;
         smaller bc halves the VMEM the auto-pipeliner must double-
         buffer, which may be what blocked the overlap)

Usage: sweep_r5_cmac_pipe.py [pipe] [bc] [cadence]
"""

import json
import os
import sys
import threading

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))


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
    from dc_sand_tpu.bench.harness import time_throughput
    from dc_sand_tpu import ops
    from dc_sand_tpu.ops.fengine_fused import native_factor

    which = set(sys.argv[1:]) or {"pipe", "bc"}
    m2, k1n = native_factor(4096)
    ap = 128

    def make_qn(b):
        shape = (64, 2, m2, 2, b, k1n)
        return jax.block_until_ready(jax.jit(
            lambda: (jax.random.normal(jax.random.key(0), shape) * 30)
            .astype(jnp.int8))())

    acc = jax.block_until_ready(
        jnp.zeros(ops.acc_shape(64, 2, 4096), jnp.int32))

    def tops(b, wall):
        return 8 * 4096 * ap * ap * b / wall / 1e12

    def run(tag, b, qn, **kw):
        try:
            wall = time_throughput(
                lambda q_, a_, kw=kw:
                    ops.xcorr_accumulate_native(a_, q_, **kw),
                (qn, acc), iters=24)
            print(json.dumps(
                {"probe": tag, "b": b, "wall_ms": wall * 1e3,
                 "int8_tops": tops(b, wall), **{k: v for k, v in
                                                kw.items()}}),
                flush=True)
            return wall
        except Exception as e:
            print(f"{tag} b={b} {kw}: {type(e).__name__}: {e}",
                  flush=True)
            return None

    if "pipe" in which:
        for b in (2048, 1024):
            qn = make_qn(b)
            run("auto", b, qn)                       # baseline re-measure
            for bc in (512, 256):
                run("pipe", b, qn, _qn_pipe=True, _bc=bc)
            del qn

    if "bc" in which:
        qn = make_qn(2048)
        for bc in (256, 128, 1024):   # 1024 may exceed VMEM — caught
            run("bc", 2048, qn, _bc=bc)
        del qn

    if "cadence" in which:
        # production cadence sanity: the chunk the fx64 preset ships
        for b in (2048,):
            qn = make_qn(b)
            best = run("pipe_cadence", b, qn, _qn_pipe=True)
            del qn

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
