#!/usr/bin/env /opt/venv/bin/python
"""Probe: what does the wire-format output decode really cost, and does
a flat ``(b, 2k)`` byte-identical layout beat the ``(b, k, 2)`` one?

The fused F-engine kernel emits ``(s, 2*m2, b, k1n)`` planes; the wire
decode is ONE 5-D transpose to ``(s, b, k, 2)`` measured at ~1.4 ms of
the ~5.7 ms 4k dispatch (fengine_fused.py decode comment) — the largest
single non-kernel cost in primary metric 1.  The wire array's minor dim
is 2, a pathological TPU tile (lane dim 2/128); the SAME BYTES in
C-contiguous order are also exactly the flat ``(s, b, 2*n_chans)``
array whose minor dim is lane-perfect.  If XLA transposes to the flat
form measurably faster, the kernel wrapper can return flat wire bytes
and let byte-order consumers (host dumps, SPEAD tx, np.asarray) view
them as (k, 2) for free.

Each timing rides time_throughput's scan+perturb protocol.
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
        print("TPU tunnel down — aborting probe", file=sys.stderr)
        raise SystemExit(3)
    print("devices:", out[0], flush=True)


def main() -> int:
    require_tunnel()
    import jax
    import jax.numpy as jnp
    from dc_sand_tpu.bench.harness import time_throughput

    s, b, n_chans = 16, 512, 4096
    m2, k1n = 32, 128          # native_factor(4096)
    shape = (s, 2 * m2, b, k1n)
    nbytes = s * b * n_chans * 2  # int8 payload

    for dtype, tag in ((jnp.int8, "int8"), (jnp.float32, "f32")):
        src = jax.block_until_ready(jax.jit(
            lambda: (jax.random.normal(jax.random.key(0), shape) * 20)
            .astype(dtype))())

        def dec_current(o):
            o5 = o.reshape(s, m2, 2, b, k1n)
            return o5.transpose(0, 3, 4, 1, 2).reshape(s, b, n_chans, 2)

        def dec_flat(o):
            o5 = o.reshape(s, m2, 2, b, k1n)
            return o5.transpose(0, 3, 4, 1, 2).reshape(s, b, 2 * n_chans)

        def copy_only(o):
            return o + dtype(0) if dtype == jnp.int8 else o * 1.0

        for name, fn in (("decode_kc2", dec_current),
                         ("decode_flat", dec_flat),
                         ("copy", copy_only)):
            wall = time_throughput(fn, (src,), iters=128)
            bs = (nbytes if dtype == jnp.int8 else nbytes * 4)
            print(json.dumps({"dtype": tag, "variant": name,
                              "wall_ms": wall * 1e3,
                              "rw_gbytes_s": 2 * bs / wall / 1e9}),
                  flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
