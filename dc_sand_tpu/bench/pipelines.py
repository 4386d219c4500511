"""Stage and pipeline benchmarks on the local chip (C18).

The headline metric is BASELINE.json:2's "channelized samples/s/chip":
real input samples consumed per second by the F-engine (PFB-FIR + FFT,
plus delay/fringe/requant when enabled).  The real-time floor for the
full 64-ant system on a v5e-16 is 13.7 Gsamp/s/chip (BASELINE.md derived
table) — that is the ``vs_baseline`` denominator.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from dc_sand_tpu.bench.harness import BenchResult, time_throughput
from dc_sand_tpu.models import f_engine
from dc_sand_tpu.windows import pfb_window

__all__ = ["bench_fengine", "REALTIME_FLOOR_PER_CHIP",
           "fengine_cost_model"]

REALTIME_FLOOR_PER_CHIP = 13.7e9  # real samp/s/chip, BASELINE.md [D]

# measured unit capabilities of this box's v5e (bench/results micro
# records, 2026-08-17): fp32 VPU FMA chain, MXU dot_general by mode at
# stage-2-like shapes, HBM spec.  Used only for ATTRIBUTION (which unit
# bounds the kernel), not for the reported throughput.
_VPU_FLOPS = 3.86e12
_MXU_FLOPS = {"fp32": 12.9e12, "bf16x3": 49.3e12, "int16": 60e12}
_HBM_BYTES_S = 819e9


def fengine_cost_model(n_chans: int, taps: int = 16,
                       stage2: str = "fp32", m1: int = None) -> dict:
    """Analytic per-sample cost of the fused F-engine, per unit.

    Returns FLOP/sample on the VPU (FIR FMAs + radix stage-1 + twiddle +
    phasor + requant), FLOP/sample on the MXU (stage-2 matmul-DFT =
    4*m1, scaled by the mode's measured effective rate), HBM
    bytes/sample, and the predicted bottleneck — the unit with the
    largest time share at the measured unit rates.  This is the
    'report the bottleneck explicitly' accounting VERDICT r1 #9 asked
    for; the recorded benches carry it in ``extra``.
    """
    import math

    from dc_sand_tpu.ops.fengine_fused import _factor
    m = 2 * n_chans
    if m1 is None and m >= 8192:
        # mirror the kernel's measured wire-layout radix policy
        # (fengine_fused: m1=128 at m>=8192) so the reported bound is
        # the bound of the program actually dispatched
        m1 = 128
    m1v, m2 = _factor(m, m1)
    # VPU: FIR 2*taps; radix-2 stage-1 ~ 5*log2(m2) cplx-ish tile ops;
    # twiddle apply 6; post-stage-2 phasor+gain+quant ~ 16 on the
    # half-width outputs (= 8 per sample)
    vpu = 2.0 * taps + 5.0 * math.log2(m2) + 6.0 + 8.0
    mxu = 4.0 * m1v
    hbm = 2.0  # int8 in + int8 out (everything else lives in VMEM)
    times = {
        "vpu": vpu / _VPU_FLOPS,
        "mxu": mxu / _MXU_FLOPS.get(stage2, _MXU_FLOPS["fp32"]),
        "hbm": hbm / _HBM_BYTES_S,
    }
    bottleneck = max(times, key=times.get)
    tot = sum(times.values())
    return {
        "vpu_flop_per_samp": vpu,
        "mxu_flop_per_samp": mxu,
        "hbm_bytes_per_samp": hbm,
        "bottleneck": bottleneck,
        "time_share": {k: v / tot for k, v in times.items()},
        "bound_gsamp_s": 1e-9 / times[bottleneck],
    }


def bench_fengine(n_streams: int = 16, n_spectra: int = 512,
                  n_chans: int = 1024, taps: int = 16,
                  impl: str = "auto", full_chain: bool = True,
                  stage2: str = None, layout: str = "wire",
                  iters: int = 256) -> BenchResult:
    """F-engine throughput on one chip.

    ``full_chain=True`` adds fine-delay/fringe + requant (config-2 shape,
    BASELINE.json:8); False is the bare PFB (config 1).  ``stage2``
    picks the fused kernel's stage-2 precision mode.

    ``layout`` defaults to ``"wire"`` — the natural-order (B, K, 2)
    form the streaming F-engine mode ships (models/pipeline.py).  With
    the s10 paired-plane stores (k1n < 128) this is the FASTEST decode
    at the 4k radix (21.0 vs 15.9 Gsamp/s for the flat-shaped variant,
    interleaved reps); the flat (B, 2K) byte view remains free for
    host consumers via np.reshape since the bytes are identical.
    """
    m = 2 * n_chans
    n_frames = n_spectra + taps - 1
    rng = np.random.default_rng(0)
    # stage the input on device via PRNG — host->device transfers ride a
    # slow tunnel on this dev box and must stay out of the timed path
    x = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0),
                                   (n_streams, n_frames * m)) * 30)
        .astype(jnp.int8))())
    w = pfb_window(taps, m)
    # All arrays are explicit jit args: a closed-over array is baked into
    # the program as a constant, and this backend's compiler constant-folds
    # giant transcendentals (cos of the whole phase table) — a multi-minute
    # compile hang (verified empirically).
    if full_chain:
        gains = jnp.asarray(
            np.stack([np.full((n_chans,), 0.05, np.float32),
                      np.zeros((n_chans,), np.float32)], axis=-1))
        fd = jnp.asarray(rng.uniform(-0.5, 0.5,
                                     size=(n_streams, n_spectra)),
                         dtype=jnp.float32)
        ph = jnp.zeros((n_streams, n_spectra), jnp.float32)

        def step(xx, fd_, ph_, g_):
            return f_engine(xx, w, taps, n_chans, frac_delay=fd_, phase=ph_,
                            gains=g_, impl=impl, stage2=stage2,
                            layout=layout)

        args = (x, fd, ph, gains)
    else:
        def step(xx):
            return f_engine(xx, w, taps, n_chans, impl=impl,
                            stage2=stage2, layout=layout)

        args = (x,)

    wall = time_throughput(step, args, iters=iters)
    samples = n_streams * n_spectra * m  # new samples consumed per call
    rate = samples / wall
    # HBM bytes: int8 in (counted once - the kernel design reads each byte
    # once) + output (int8 x2 quantised, or fp32 x2 unquantised).
    out_bytes = n_streams * n_spectra * n_chans * (2 if full_chain else 8)
    bytes_moved = samples * 1 + out_bytes
    extra = {"n_streams": n_streams, "n_spectra": n_spectra,
             "n_chans": n_chans, "taps": taps, "impl": impl,
             "stage2": stage2, "layout": layout,
             "vs_realtime_floor": rate / REALTIME_FLOOR_PER_CHIP}
    try:
        extra["cost_model"] = fengine_cost_model(
            n_chans, taps, stage2 or "bf16x3")
        extra["bottleneck"] = extra["cost_model"]["bottleneck"]
    except ValueError:
        pass  # shape the fused kernel does not tile
    return BenchResult(
        name=f"fengine_{'full' if full_chain else 'pfb'}_{impl}",
        metric="channelized samples/s/chip", value=rate, unit="samp/s",
        wall_s=wall, bytes_moved=bytes_moved, extra=extra,
    ).finish()


def _step_bench_setup(preset: str, taps: int, weights, **overrides):
    """Shared setup for the end-to-end step benches: config + jitted
    production step (coarse delay on the host/ingest path) + staged
    device inputs.  Returns (cfg, step, history, vis_acc, chunk, rest)
    with ``rest = (coarse, frac, phase, gains, weights, reset)``."""
    from dc_sand_tpu.config import get_config
    from dc_sand_tpu.models.pipeline import (make_step, zero_vis_acc,
                                             uses_frames_io,
                                             history_shape, chunk_shape)

    cfg = get_config(preset).replace(**overrides)
    window = pfb_window(taps, cfg.fft_size)
    step = make_step(cfg, window, max_delay=0, mesh=None,
                     impl="auto", donate=False, coarse_on_host=True)
    a, p, k, b = (cfg.n_ants, cfg.n_pols, cfg.n_chans,
                  cfg.spectra_per_chunk)
    fio = uses_frames_io(cfg, "auto", 0)
    history = jnp.zeros(history_shape(cfg, 0, fio), jnp.int8)
    vis_acc = zero_vis_acc(cfg)
    # stage the chunk on device via PRNG (host->device rides a slow
    # tunnel on this dev box; see bench_fengine)
    chunk = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0),
                                   chunk_shape(cfg, fio)) * 30)
        .astype(jnp.int8))())
    rest = (jnp.zeros((a, p), jnp.int32),
            jnp.zeros((a, p, b), jnp.float32),
            jnp.zeros((a, p, b), jnp.float32),
            jnp.asarray(np.stack([np.full((k,), 0.05, np.float32),
                                  np.zeros((k,), np.float32)], -1)),
            weights, jnp.asarray(False))
    return cfg, step, history, vis_acc, chunk, rest


def _time_compiled_scan(loop, history, vis_acc, chunk, rest,
                        iters: int) -> float:
    """Valid-protocol timing of a scan ``loop``: compile, one warm
    dispatch (this backend charges minutes for an executable's first
    real execution), then ONE timed dispatch on a bumped chunk so the
    result cache cannot serve it.  Returns wall seconds per iteration;
    asserts the checksum is finite (NaN would mean dead compute)."""
    import time as _time

    compiled = jax.jit(loop).lower(history, vis_acc, chunk,
                                   *rest).compile()
    np.asarray(compiled(history, vis_acc, chunk, *rest))  # server warm
    ch1 = jax.block_until_ready(jax.jit(lambda v: v + 1)(chunk))
    t0 = _time.perf_counter()
    val = np.asarray(compiled(history, vis_acc, ch1, *rest))
    wall = (_time.perf_counter() - t0) / iters
    assert val == val, "NaN checksum"
    return wall


def bench_fx_step(n_ants: int = 64, n_pols: int = 2, n_chans: int = 1024,
                  n_spectra: int = None, taps: int = 16,
                  iters: int = 64) -> BenchResult:
    """End-to-end single-chip FX streaming step (the flagship path:
    full F-engine -> local corner-turn -> X-engine CMAC + accumulate),
    i.e. ``__graft_entry__.entry``'s program under the valid protocol.

    ``n_spectra`` defaults to the fx64 preset's own chunk size — the
    cadence the production runner dispatches (a 256-spectra default
    silently understated the headline by ~12% once the preset moved to
    2048-spectra chunks, whose 1/nt accumulator amortisation is the
    point of the data-driven cadence)."""
    if n_spectra is None:
        from dc_sand_tpu.config import get_config
        n_spectra = get_config("fx64").spectra_per_chunk
    a, p, k, b = n_ants, n_pols, n_chans, n_spectra
    cfg, step, history, vis_acc, chunk, rest = _step_bench_setup(
        "fx64", taps, jnp.zeros((1, a, k, 2), jnp.float32),
        n_ants=a, n_pols=p, n_chans=k, spectra_per_chunk=b)

    # Production semantics: history and the visibility accumulator are a
    # DONATED carry (the runner updates them in place every chunk), so
    # they must ride the timed scan's carry too — handing the same
    # accumulator buffer to every iteration (time_throughput's protocol)
    # forces XLA to defensively copy the 0.5 GB block accumulator each
    # chunk, ~3 ms/chunk the real streaming path never pays.  The chunk
    # gets the usual data-dependent bump; the carried accumulator chains
    # iterations, defeating result caching.
    def loop(hist0, acc0, ch0, *rest_):
        def body(carry, i):
            hist, acc, ch = carry
            # data-dependent per-iteration chunk (alternating) so the
            # F-engine cannot be hoisted as loop-invariant
            ch = ch.at[(0,) * ch.ndim].add((i % 2).astype(ch.dtype))
            hist, acc, _outs = step(hist, acc, ch, *rest_)
            return (hist, acc, ch), ()

        (hist, acc, _), _ = jax.lax.scan(
            body, (hist0, acc0, ch0), jnp.arange(iters))
        # the FINAL carry is consumed (scalar reads) — each
        # iteration's accumulator keeps exactly one consumer (the next
        # iteration) so the carry updates in place, while the whole
        # X-engine chain stays live (a history-only checksum let XLA
        # dead-code-eliminate the CMAC entirely: 550 "Gsamp/s")
        return (hist.ravel()[0].astype(jnp.float32)
                + acc.ravel()[0].astype(jnp.float32))

    wall = _time_compiled_scan(loop, history, vis_acc, chunk, rest,
                               iters)
    samples = a * p * cfg.chunk_samples
    return BenchResult(
        name="fx_step_64ant",
        metric="FX-step samples/s/chip", value=samples / wall,
        unit="samp/s", wall_s=wall,
        # int8 stream in + packed-triangle accumulator (k, ap, ap)
        # int32 in/out (quarter the round-2 (2ap)^2 carry)
        bytes_moved=samples + 2 * k * (a * p) ** 2 * 4,
        extra={"n_ants": a, "n_chans": k, "n_spectra": b,
               "vs_realtime_floor": samples / wall / REALTIME_FLOOR_PER_CHIP},
    ).finish()


def bench_runner_modes(n_ants: int = 16, n_pols: int = 2,
                       n_chans: int = 1024, spectra: int = 64,
                       n_chunks: int = 16):
    """Streaming ``run`` vs offline ``run_batched`` on the same runner
    config: quantifies the per-dispatch overhead the batched scan
    amortises (one dispatch per dump window instead of per chunk).
    Returns both records; every chunk's data differs, so neither path
    can be served from this backend's result cache."""
    import time as _time

    from dc_sand_tpu.config import get_config
    from dc_sand_tpu.runtime import FXRunner
    from dc_sand_tpu.windows import pfb_window

    cfg = get_config("fx64").replace(
        n_ants=n_ants, n_pols=n_pols, n_chans=n_chans,
        spectra_per_chunk=spectra, n_spectra_per_acc=4 * spectra)
    rng = np.random.default_rng(0)
    n_cache = 4 * (cfg.n_spectra_per_acc // spectra)
    chunks = [rng.integers(-100, 100,
                           (n_ants, n_pols, cfg.chunk_samples),
                           dtype=np.int8) for _ in range(n_cache)]
    window = pfb_window(cfg.n_taps, cfg.fft_size, cfg.window)
    results = []
    for mode in ("batched", "streaming"):
        r = FXRunner(cfg, window, impl="auto")
        fn = r.run_batched if mode == "batched" else r.run
        fn(lambda i: chunks[i % n_cache], n_cache)      # warm + compile
        t0 = _time.perf_counter()
        fn(lambda i: chunks[(i + 1) % n_cache], n_chunks)
        wall = _time.perf_counter() - t0
        samples = n_ants * n_pols * cfg.chunk_samples * n_chunks
        results.append(BenchResult(
            name=f"runner_{mode}",
            metric="runner samples/s", value=samples / wall,
            unit="samp/s", wall_s=wall / n_chunks, bytes_moved=samples,
            extra={"n_ants": n_ants, "n_chans": n_chans,
                   "spectra": spectra, "n_chunks": n_chunks,
                   "chunks_per_dispatch":
                       (cfg.n_spectra_per_acc // spectra
                        if mode == "batched" else 1)},
        ).finish())
    return results


def bench_beam_step(n_ants: int = 64, n_pols: int = 2,
                    n_chans: int = 4096, n_spectra: int = 256,
                    n_beams: int = 16, taps: int = 16,
                    iters: int = 64) -> BenchResult:
    """End-to-end single-chip B-engine streaming step (config 5's
    device path: full F-engine -> native-layout coherent beamformer +
    incoherent sum), same valid-scan protocol as :func:`bench_fx_step`.
    Every iteration's beam outputs feed the checksum — beam mode has no
    carried accumulator, so an unconsumed output would let XLA delete
    the whole B-engine (the DCE hazard bench_fx_step documents)."""
    a, p, k, b = n_ants, n_pols, n_chans, n_spectra
    rng = np.random.default_rng(3)
    weights = jnp.asarray(
        rng.normal(size=(n_beams, a, k, 2)).astype(np.float32) * 0.1)
    cfg, step, history, vis_acc, chunk, rest = _step_bench_setup(
        "beam64", taps, weights, n_ants=a, n_pols=p, n_chans=k,
        n_beams=n_beams, spectra_per_chunk=b)

    def loop(hist0, acc0, ch0, *rest_):
        def body(carry, i):
            hist, acc, ch, s = carry
            ch = ch.at[(0,) * ch.ndim].add((i % 2).astype(ch.dtype))
            hist, acc, outs = step(hist, acc, ch, *rest_)
            for leaf in jax.tree_util.tree_leaves(outs):
                s = s + jax.lax.optimization_barrier(
                    leaf).ravel()[0].astype(jnp.float32)
            return (hist, acc, ch, s), ()

        (hist, _, _, s), _ = jax.lax.scan(
            body, (hist0, acc0, ch0, jnp.float32(0.0)),
            jnp.arange(iters))
        return s + hist.ravel()[0].astype(jnp.float32)

    wall = _time_compiled_scan(loop, history, vis_acc, chunk, rest,
                               iters)
    samples = a * p * cfg.chunk_samples
    out_bytes = (n_beams + 1) * p * b * k * 8
    return BenchResult(
        name="beam_step_64ant",
        metric="B-engine-step samples/s/chip", value=samples / wall,
        unit="samp/s", wall_s=wall,
        bytes_moved=samples + out_bytes,
        extra={"n_ants": a, "n_chans": k, "n_spectra": b,
               "n_beams": n_beams,
               "vs_realtime_floor": samples / wall / REALTIME_FLOOR_PER_CHIP},
    ).finish()
