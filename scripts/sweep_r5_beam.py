#!/usr/bin/env /opt/venv/bin/python
"""Round-5 beamformer 16-beam lever (VERDICT r4 #6).

The 16-beam contract point is fixed-cost-bound: per-(plane, pol)
relayout dots and per-(k1, pol) beam dots at 4nb = 64 MXU rows.  The
_pmerge kernel folds both pols into the LANE/column axis of every dot
(p*b columns) — half the dispatches at identical MACs, no sublane
padding (that was the reverted round-4 merge).  Measure default vs
_pmerge at 16 and 64 beams, contract shape (64 ants, 4k chans), with
in-kernel int8 quant (the shipped step form).

Usage: sweep_r5_beam.py
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
    import numpy as np
    from dc_sand_tpu.bench.harness import time_throughput
    from dc_sand_tpu import ops
    from dc_sand_tpu.ops.fengine_fused import native_factor

    a, p, n_chans, b = 64, 2, 4096, 512
    m2, k1n = native_factor(n_chans)
    qn = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0),
                                   (a, p, m2, 2, b, k1n)) * 30)
        .astype(jnp.int8))())

    def tf(nb, wall):
        return 4 * 2 * nb * a * p * b * n_chans / wall / 1e12

    for nb in (16, 64):
        rng = np.random.default_rng(3)
        w = jnp.asarray(rng.normal(size=(nb, a, n_chans, 2))
                        .astype(np.float32))
        for tag, kw in (("default", {}),
                        ("pmerge", {"_pmerge": True})):
            for qs in (0.25,):
                try:
                    wall = time_throughput(
                        lambda q_, kw=kw, qs=qs: ops.beamform_native(
                            q_, w, quant_scale=qs, _decode=False, **kw),
                        (qn,), iters=32)
                    print(json.dumps(
                        {"probe": tag, "n_beams": nb, "qs": qs,
                         "wall_ms": wall * 1e3,
                         "tflops": tf(nb, wall)}), flush=True)
                except Exception as e:
                    print(f"{tag} nb={nb}: {type(e).__name__}: {e}",
                          flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
