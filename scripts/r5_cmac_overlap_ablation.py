#!/usr/bin/env /opt/venv/bin/python
"""Round-5 CMAC overlap/floor ablation record (VERDICT r4 #3's
alternate done-criterion: prove the floor instead of reaching 140+).

At the production cadence (b=2048, bc=256) the auto multi-tile kernel
supports `_ablate` phases; measuring the ladder

    full            : relayout + CMAC dots + qn/acc DMA
    ablate cmac     : relayout + DMA
    ablate relayout : (skips the z build; dots still run on stale z)
    ablate both     : DMA floor only

separates the DMA floor from the two compute phases and quantifies how
much of the serial sum the pipeline actually overlaps.  The record is
`xcorr_overlap_ablation` in bench/results; DESIGN.md §4 carries the
conclusion.
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
        print("TPU tunnel down — aborting", file=sys.stderr)
        raise SystemExit(3)
    print("devices:", out[0], flush=True)


def main() -> int:
    require_tunnel()
    import jax
    import jax.numpy as jnp
    from dc_sand_tpu.bench.harness import BenchResult, time_throughput
    from dc_sand_tpu import ops
    from dc_sand_tpu.ops.fengine_fused import native_factor

    m2, k1n = native_factor(4096)
    ap, b = 128, 2048
    qn = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0),
                                   (64, 2, m2, 2, b, k1n)) * 30)
        .astype(jnp.int8))())
    acc = jax.block_until_ready(
        jnp.zeros(ops.acc_shape(64, 2, 4096), jnp.int32))

    walls = {}
    for tag, ablate in [("full", ()), ("no_cmac", ("cmac",)),
                        ("no_relayout", ("relayout",)),
                        ("floor", ("relayout", "cmac"))]:
        wall = time_throughput(
            lambda q_, a_, ab=ablate: ops.xcorr_accumulate_native(
                a_, q_, _ablate=ab), (qn, acc), iters=24)
        walls[tag] = wall * 1e3
        print(f"{tag:<12s} {wall*1e3:7.3f} ms", flush=True)

    # Pipelined-kernel model: wall = max(DMA, compute-chain) + eps.
    # The r5 measurement: BOTH single-phase walls land AT the DMA floor
    # (each compute phase alone hides fully under the fetch), while the
    # full kernel's wall far exceeds floor + either phase's visible
    # cost — i.e. the combined compute chain is the critical path and
    # the DMA is hidden beneath IT.  The kernel is COMPUTE-bound; the
    # "DMA floor => 182 TOPS" bound from the serial-sum model was the
    # wrong model.
    floor = walls["floor"]
    full = walls["full"]
    compute_chain = full  # wall == max(DMA, compute) and full >> floor
    dma_hidden = min(floor, full)
    summary = {
        "floor_dma_ms": round(floor, 3),
        "wall_single_relayout_ms": round(walls["no_cmac"], 3),
        "wall_single_cmac_ms": round(walls["no_relayout"], 3),
        "full_ms": round(full, 3),
        "inferred_compute_chain_ms": round(compute_chain, 3),
        "dma_hidden_ms": round(dma_hidden, 3),
        "dma_hidden_frac": round(dma_hidden / floor, 3),
        "bound_model": "wall=max(dma,compute); compute-bound at full",
    }
    print(json.dumps(summary), flush=True)

    tops = 8 * 4096 * ap * ap * b / (walls["full"] / 1e3) / 1e12
    res = BenchResult(
        name="xcorr_overlap_ablation",
        metric="int8_tops", value=tops, unit="TOPS",
        wall_s=walls["full"] / 1e3,
        extra={"n_chans": 4096, "n_spectra": b, "n_ants": 64,
               "bc": 256, "kernel": "auto_multitile", **summary}).finish()
    path = res.save(os.path.join(os.path.dirname(
        os.path.abspath(__file__)), "..", "bench", "results"))
    print("recorded:", path, flush=True)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
