#!/usr/bin/env /opt/venv/bin/python
"""Round-4 beamformer probe (VERDICT r3 item 3).

Measures at the contract shape (16 beams, 64 ants, 4k chans, b=256):
  1. HEAD default (int8-eye relayout + auto pg plane batching)
  2. pg sweep (planes per grid step — per-step fixed-cost amortization)
  3. decode ablation (_decode=False isolates the wire-order output
     transpose's share — the suspected dominant non-MXU cost)
  4. a 64-beam point (full MXU row fill: 4nb = 256)
Records everything under bench/results/.
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
    from dc_sand_tpu import ops
    from dc_sand_tpu.bench.harness import time_throughput, BenchResult
    from dc_sand_tpu.ops.fengine_fused import native_factor

    n_ants, n_pols, n_chans, b = 64, 2, 4096, 256
    m2, k1n = native_factor(n_chans)

    def data(nb):
        q = jax.block_until_ready(jax.jit(
            lambda: (jax.random.normal(
                jax.random.key(0),
                (n_ants, n_pols, m2, 2, b, k1n)) * 30).astype(jnp.int8))())
        w = jax.block_until_ready(jax.jit(
            lambda: jax.random.normal(jax.random.key(1),
                                      (nb, n_ants, n_chans, 2),
                                      jnp.float32))())
        return q, w

    def run(tag, nb, iters=128, **kw):
        q, w = data(nb)
        try:
            wall = time_throughput(
                lambda x, ww: ops.beamform_native(x, ww, **kw),
                (q, w), iters=iters)
        except Exception as e:
            print(f"{tag}: {type(e).__name__}: {e}", flush=True)
            return None
        flops = 4 * 2 * nb * n_ants * n_pols * b * n_chans
        tf = flops / wall / 1e12
        print(json.dumps({"tag": tag, "n_beams": nb,
                          "wall_ms": wall * 1e3, "fp32_tflops": tf,
                          **{k: str(v) for k, v in kw.items()}}),
              flush=True)
        r = BenchResult(
            name=f"beamform_native_{tag}",
            metric="beamformed samples/s",
            value=nb * n_pols * b * n_chans / wall,
            unit="beam-samples/s", wall_s=wall,
            extra={"fp32_gflops": flops / wall / 1e9, "n_beams": nb,
                   "n_chans": n_chans, "layout": "native",
                   **{k: str(v) for k, v in kw.items()}},
        ).finish()
        r.save(RESULTS)
        return wall

    run("r4head", 16)                      # auto pg + int8 eye
    for pg in (1, 2, 4, 8):
        run("pg", 16, _pg=pg)
    run("nodecode", 16, _decode=False)     # transpose share
    run("beams64", 64)                     # full row fill
    run("beams64_nodecode", 64, _decode=False)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
