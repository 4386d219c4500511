#!/usr/bin/env /opt/venv/bin/python
"""Session-9 native-CMAC attribution sweep (VERDICT r3 #2: push the
X-engine toward ~100 int8 TOPS).

Cost model at the 64-ant 4k contract shape (ap=128, K=4096=m2 32 x
k1n 128), per call of b spectra, v5e (819 GB/s HBM, ~394 int8 TOPS):

  qn read        : 2*ap*K*b bytes   = 1.07 GB @ b=512 -> 1.31 ms
  acc read+write : 2*4*K*ap^2       = 537 MB         -> 0.66 ms
  MXU (relayout) : m2*k1n^2*2ap*b   MACs             -> 0.35 ms @512
  MXU (CMAC)     : K*(2ap)^2*b      MACs             -> 0.70 ms @512
  ideal overlap  : max(DMA, MXU) ~ 2.0 ms @512 (137 TOPS),
                   ~5.9 ms @2048 (186 TOPS)

Measured so far: 4.4 ms @512 (62 TOPS), ~14.4 ms @2048 (~76) — the gap
is unattributed.  This sweep runs, per b in {512, 1024, 2048}:
  full / no_relayout / no_cmac / dma_only ablations,
  the m2-major contiguous-slab probe (strided-fetch share),
  the no-alias probe (aliasing serialisation),
and a bc sub-tile sweep at b=2048.
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
    from dc_sand_tpu.bench.harness import time_throughput
    from dc_sand_tpu import ops
    from dc_sand_tpu.ops.fengine_fused import native_factor

    which = set(sys.argv[1:]) or {"ablate", "m2major", "bc"}
    m2, k1n = native_factor(4096)
    ap = 128

    def make_qn(b, m2major=False):
        shape = ((m2, ap, 2, b, k1n) if m2major
                 else (64, 2, m2, 2, b, k1n))
        return jax.block_until_ready(jax.jit(
            lambda: (jax.random.normal(jax.random.key(0), shape) * 30)
            .astype(jnp.int8))())

    acc = jax.block_until_ready(
        jnp.zeros(ops.acc_shape(64, 2, 4096), jnp.int32))

    def tops(b, wall):
        return 8 * 4096 * ap * ap * b / wall / 1e12

    if "ablate" in which:
        for b in (512, 1024, 2048):
            qn = make_qn(b)
            for tag, abl in (("full", ()),
                             ("no_relayout", ("relayout",)),
                             ("no_cmac", ("cmac",)),
                             ("dma_only", ("relayout", "cmac"))):
                try:
                    wall = time_throughput(
                        lambda q_, a_: ops.xcorr_accumulate_native(
                            a_, q_, _ablate=abl),
                        (qn, acc), iters=24)
                    print(json.dumps(
                        {"probe": "ablate", "b": b, "ablate": tag,
                         "wall_ms": wall * 1e3,
                         "int8_tops": tops(b, wall)}), flush=True)
                except Exception as e:
                    print(f"ablate b={b} {tag}: {type(e).__name__}: {e}",
                          flush=True)
            del qn

    if "m2major" in which:
        for b in (512, 2048):
            qn = make_qn(b, m2major=True)
            try:
                wall = time_throughput(
                    lambda q_, a_: ops.xcorr_accumulate_native(
                        a_, q_, _m2major=True),
                    (qn, acc), iters=24)
                print(json.dumps(
                    {"probe": "m2major", "b": b, "wall_ms": wall * 1e3,
                     "int8_tops": tops(b, wall)}), flush=True)
            except Exception as e:
                print(f"m2major b={b}: {type(e).__name__}: {e}",
                      flush=True)
            del qn

    if "noalias" in which:
        for b in (2048,):
            qn = make_qn(b)
            try:
                wall = time_throughput(
                    lambda q_, a_: ops.xcorr_accumulate_native(
                        a_, q_, _noalias=True),
                    (qn, acc), iters=24)
                print(json.dumps(
                    {"probe": "noalias", "b": b, "wall_ms": wall * 1e3,
                     "int8_tops": tops(b, wall)}), flush=True)
            except Exception as e:
                print(f"noalias b={b}: {type(e).__name__}: {e}",
                      flush=True)
            del qn

    if "probe2" in which:
        # session-9 second wave: noalias default / static unroll /
        # part-major (transpose-free relayout)
        for b in (512, 2048):
            qn = make_qn(b)
            for tag, kw in (("default", {}),
                            ("unroll", {"_unroll": True}),
                            ("alias", {"_noalias": False})):
                if b == 512 and tag == "unroll":
                    continue   # single-tile path has no unroll knob
                try:
                    wall = time_throughput(
                        lambda q_, a_, kw=kw:
                            ops.xcorr_accumulate_native(a_, q_, **kw),
                        (qn, acc), iters=24)
                    print(json.dumps(
                        {"probe": "probe2", "b": b, "variant": tag,
                         "wall_ms": wall * 1e3,
                         "int8_tops": tops(b, wall)}), flush=True)
                except Exception as e:
                    print(f"probe2 b={b} {tag}: {type(e).__name__}: "
                          f"{e}", flush=True)
            del qn
        import jax.numpy as jnp2
        for b in (512, 2048):
            qpm = jax.block_until_ready(jax.jit(
                lambda: (jax.random.normal(
                    jax.random.key(0), (2, ap, m2, b, k1n)) * 30)
                .astype(jnp2.int8))())
            try:
                wall = time_throughput(
                    lambda q_, a_: ops.xcorr_accumulate_native(
                        a_, q_, _partmajor=True),
                    (qpm, acc), iters=24)
                print(json.dumps(
                    {"probe": "probe2", "b": b, "variant": "partmajor",
                     "wall_ms": wall * 1e3,
                     "int8_tops": tops(b, wall)}), flush=True)
            except Exception as e:
                print(f"probe2 b={b} partmajor: {type(e).__name__}: "
                      f"{e}", flush=True)
            del qpm

    if "bt" in which:
        # relayout sub-tile width at the production b=2048 shape
        qn = make_qn(2048)
        for bt in (128, 256, 512):
            try:
                wall = time_throughput(
                    lambda q_, a_, bt=bt: ops.xcorr_accumulate_native(
                        a_, q_, _bt=bt),
                    (qn, acc), iters=24)
                print(json.dumps(
                    {"probe": "bt", "b": 2048, "bt": bt,
                     "wall_ms": wall * 1e3,
                     "int8_tops": tops(2048, wall)}), flush=True)
            except Exception as e:
                print(f"bt={bt}: {type(e).__name__}: {e}", flush=True)
        del qn

    if "bc" in which:
        qn = make_qn(2048)
        for bc in (128, 256, 512):
            try:
                wall = time_throughput(
                    lambda q_, a_: ops.xcorr_accumulate_native(
                        a_, q_, _bc=bc),
                    (qn, acc), iters=24)
                print(json.dumps(
                    {"probe": "bc", "b": 2048, "bc": bc,
                     "wall_ms": wall * 1e3,
                     "int8_tops": tops(2048, wall)}), flush=True)
            except Exception as e:
                print(f"bc={bc}: {type(e).__name__}: {e}", flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
