#!/usr/bin/env /opt/venv/bin/python
"""Round-5 CMAC pack-epilogue hoist sweep (DESIGN.md §4's named next rung).

After the r5 qn-pipe + bc=256 defaults (8.70 ms / 126.3 int8 TOPS at
b=2048), the remaining gap to the 6.0 ms DMA floor is per-step COMPUTE:
relayout convert + quadrant dots + the per-(step, channel) pack
epilogue (~5-6 ms serial).  The `_epi_hoist` kernel variant bumps an
UNPACKED per-plane (dr, di) int32 scratch pair per t-tile (two adds per
channel) and runs the base-select + keep-mul + triangle-pack ONCE per
plane at the last tile — cutting the per-step VPU epilogue roughly in
half for +16.8 MB VMEM scratch.  This sweep A/Bs the hoist against the
shipped default at both cadences and re-probes bc under the changed
VMEM budget.

Usage: sweep_r5_cmac_epi.py
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

    for b in (2048, 1024):
        qn = make_qn(b)
        # shipped default (pipe, bc=256, no hoist) as the baseline
        run("pipe", b, qn, _qn_pipe=True)
        run("epi", b, qn, _qn_pipe=True, _epi_hoist=True)
        # bc re-probe under the hoist's +16.8 MB scratch
        for bc in (512, 128):
            run("epi_bc", b, qn, _qn_pipe=True, _epi_hoist=True, _bc=bc)
        del qn

    return 0


if __name__ == "__main__":
    raise SystemExit(main())
