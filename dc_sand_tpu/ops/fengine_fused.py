"""Fused F-engine Pallas kernel: FIR + MXU FFT + phase + requant in VMEM.

Why this kernel exists (measured on the local v5e): the unfused XLA
pipeline materialises ~700 MB of HBM intermediates per 16.8 M-sample
benchmark iteration (FIR out fp32, complex spectra, phasor tables),
capping the F-engine at ~5 Gsamp/s/chip — under the 13.7 Gsamp/s
real-time floor (BASELINE.md).  Fusing the whole per-antenna chain into
one Pallas kernel keeps every intermediate in VMEM; HBM traffic drops to
int8 in + int8 out (~34 MB), an order of magnitude less.

Per grid step (stream s, tile of TB spectra), designed around Mosaic's
layout rules (no reshapes/transposes of tiled vectors, 8/128-aligned
slices only):

1. **FIR** — overlap-save history carried in VMEM, double-buffered DMA
   of the TB new frames (same design as ops/pfb.py), fp32 accumulation
   over <=8 shifted copies of the [history|tile] buffer (taps grouped
   by offset mod 8, 8-aligned sublane slices).  ``fir_mode`` picks the
   shift engine: ``"mxu"`` (default at rows <= 96) builds each shifted
   copy as a shifted-identity bfloat16 dot — exact for the int8-derived
   integer samples — moving the shuffle work onto the otherwise
   ~12%-busy MXU; ``"roll"`` uses VPU ``pltpu.roll`` (the r1 design,
   default at larger tiles where the dots' (rows, rows) M-dim does not
   amortise).  Bitwise identical (tested); on v5e at the 4k contract
   shape the MXU mode measures 19.4 vs 14.8 Gsamp/s wire end-to-end
   because the VPU is the kernel's critical path (full-shape ablation:
   FIR 37% of kernel time, rolls ~2/3 of that).  A 7-pre-roll
   + aligned-slice VPU variant and unaligned-offset DMA copies were
   both ruled out (perf-neutral / Mosaic compiler crash).
2. **FFT** — Cooley-Tukey ``M = m1*m2`` with ``m1`` lane-aligned:
   stage 1 is a statically-unrolled radix-2 FFT over the ``m2``
   lane-aligned slices (generated at trace time by ``_dif_fft_blocks``,
   the iterative decimation-in-frequency form — ~m2*log2(m2) tile ops
   on the VPU, replacing round-1's m2^2 weighted-sum loop, the measured
   VPU bottleneck at 4k channels; the recursive ``_dft_tiles`` codegen
   is retained as the test oracle for the butterfly math); the k2
   twiddle rows then multiply each stage-1 output; stage 2 is one
   full-width MXU matmul per k2-group —
   sublane-stacked ``[Zr | Zi]`` ``(mg*TB, 2*m1)`` against prebuilt
   ``[w1r^T; -w1i^T]`` / ``[w1i^T; w1r^T]`` matrices.  ``m1`` prefers
   256 so the stage-2 output width k1=m1/2 is exactly one 128-lane tile
   and the per-sample stage-2 FLOPs (= 4*m1) stay minimal.
3. **Fine delay + fringe** — the phasor factorises as
   ``e^(-i p_t) * u^k2 * v^k1`` (``u = e^(-i 2pi d_t/m)``, ``v=u^m2``):
   both parts apply AFTER stage 2 on the k1n-wide outputs (the complex
   scalar commutes through the linear stage-2): the k2 part is a
   per-spectrum complex recurrence, the k1 part a direct small-angle
   cos/sin table over the lane index — half the elementwise work of
   applying the phasor on the m1-wide stage-2 inputs.
4. **Requant** — complex gain, round-half-even, saturate, int8.

Stage-2 precision modes (``stage2=``): ``"fp32"`` — fp32 HIGHEST
dot_general; ``"bf16x3"`` — both operands split hi/lo into bfloat16 and
3 bf16 MXU passes (zh*wh + zh*wl + zl*wh) accumulate in fp32: ~16-bit
effective mantissa (>90 dB stage SNR), at the bf16 MXU rate;
``"int16"`` — hi/lo int8 split, int8-MXU dots (opt-in, thinner margin).

Output layout: ``2*m2`` planes ``(S, 2*m2, B, m1/2)`` — (re, im) per
k2 — because a trailing (re,im) axis of 2 cannot be tiled; the wrapper
decodes to the natural-order ``(..., B, K, 2)`` wire format (channel
``k = k2 + m2*k1``).

The ``groups`` tiling parameter processes k2 in ``groups`` sequential
chunks through a ``m2/groups``-sized Z scratch, trading one big stage-2
matmul for several to cut peak VMEM — this is what lifts the 4k-channel
(m=8192) tile from tb=32 (round-1's VMEM cap, 0.58x real time) to
tb=64.
"""

from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fengine_fused", "fused_native_ok", "native_factor",
           "native_channel_perm"]


def fused_native_ok(n_chans: int, taps: int, b_out: int) -> bool:
    """True when the fused kernel tiles this shape, i.e. the
    ``layout="native"`` fast path is available to pipeline builders."""
    m = 2 * n_chans
    try:
        _, m2 = _factor(m)
    except ValueError:
        return False
    taps_pad = _round_up(taps, 8)
    tb, _g = _choose_tiling(m, m2, b_out, taps_pad)
    return (tb != 0 and tb >= taps_pad and b_out % tb == 0
            and m % 128 == 0 and taps >= 2)


def native_factor(n_chans: int, m1: int = None):
    """(m2, k1n) of the kernel's native plane layout for this size."""
    m1v, m2 = _factor(2 * n_chans, m1)
    return m2, m1v // 2


def native_channel_perm(n_chans: int, m1: int = None) -> np.ndarray:
    """``perm[k_natural]`` = index of channel k in the native (k2-major)
    channel enumeration ``k~ = k2*k1n + k1`` (k = k2 + m2*k1).  Dump- or
    display-time consumers reorder a native channel axis with
    ``arr[..., perm]``."""
    m2, k1n = native_factor(n_chans, m1)
    k = np.arange(n_chans)
    return (k % m2) * k1n + (k // m2)

_P = jax.lax.Precision.HIGHEST

# spectra per grid step: first entry dividing the chunk's spectra count
# and fitting the VMEM model wins.  tb=64 leads since the MXU-shifted
# FIR landed: its (rows, rows) shift dots amortise at rows = taps_pad +
# tb <= ~96, and that combination beats bigger tiles on the roll path
# at both contract shapes (v5e 16x512: 1k tb64+mxu 17.1 vs tb128+roll
# 16.9 vs tb128+mxu 15.1; 4k tb64 19.5 vs tb128 16.9 Gsamp/s).
_TB_CANDIDATES = (64, 128, 32, 16, 8)
# Group preference is measured, not modelled (v5e 16x512 contract-shape
# sweeps, bench/results/fengine_tile_sweep_8424e8f_*).  All three
# ratios fit the VMEM model at both contract shapes, so the order IS
# the policy: at 1k chans (m=2048) the un-grouped Z pass wins clearly
# (g=1 17.35 vs g=4 15.74 Gsamp/s wire); at 4k (m=8192) the quartered
# Z scratch edges it on both layouts (wire g=4 19.71 vs g=1 19.47 vs
# g=2 18.81; native 16.93 / 16.92 / 16.74) — more, smaller stage-2
# matmuls pipeline slightly better once the tile is 4x taller.  The
# halfway g=2 split loses everywhere measured.
_GROUP_CANDIDATES = (1, 4, 2)            # m <= 4096 (and fallback)
_GROUP_CANDIDATES_BIG_M = (4, 1, 2)      # m >= 8192
_VMEM_BUDGET = 12 * 1024 * 1024

# stage-2 DFT matmul mode (see module docstring).  bf16x3 measures
# 108 dB bare / 73+ dB quantized end-to-end — comfortably above the
# 50 dB contract bound — at ~3x the fp32-HIGHEST MXU rate, so it is the
# default; stage2="fp32" stays available where exactness vs golden is
# the point (and is what the interpret-mode bitwise tests pin).
_DEFAULT_STAGE2 = "bf16x3"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _factor(m: int, m1: int = None):
    """m = m1 * m2 with m1 lane-aligned (stage-2 matmul contracts 2*m1
    and emits k1 = m1/2 outputs; m1=256 makes that exactly one 128-lane
    tile) and m2 a power of two (stage 1 is a statically-unrolled
    radix-2 FFT across the m2 lane-chunks)."""
    cands = (m1,) if m1 else (256, 512, 128)
    for c in cands:
        m2 = m // c if c and m % c == 0 else 0
        if m2 >= 4 and m2 <= 64 and (m2 & (m2 - 1)) == 0:
            return c, m2
    raise ValueError(f"FFT size {m} not supported by the fused kernel")


# ----------------------------------------------------------------------
# Stage-1 FFT codegen: radix-2 DIT on (tb, m1) tile values, unrolled at
# trace time.  Values are (re, im) pairs; None = exactly-zero component
# (real inputs), so dead multiplies/adds are never emitted.  Twiddle
# scalars are python floats baked into the program (same scheme as
# round-1's w2 table, but O(m2 log m2) ops instead of O(m2^2)).
# ----------------------------------------------------------------------

def _snap(x: float) -> float:
    for v in (0.0, 1.0, -1.0):
        if abs(x - v) < 1e-12:
            return v
    return float(x)


def _neg(x):
    return None if x is None else -x


def _adds(a, b):
    if a is None:
        return b
    if b is None:
        return a
    return a + b


def _subs(a, b):
    if b is None:
        return a
    if a is None:
        return -b
    return a - b


def _cadd(u, v):
    return (_adds(u[0], v[0]), _adds(u[1], v[1]))


def _csub(u, v):
    return (_subs(u[0], v[0]), _subs(u[1], v[1]))


def _cmul_static(v, wr: float, wi: float):
    """v * (wr + i*wi) with trivial-weight and zero-component elision."""
    re, im = v
    if wi == 0.0:
        if wr == 1.0:
            return v
        if wr == -1.0:
            return (_neg(re), _neg(im))
        return (None if re is None else wr * re,
                None if im is None else wr * im)
    if wr == 0.0:
        if wi == 1.0:
            return (_neg(im), re)
        if wi == -1.0:
            return (im, _neg(re))
        return (None if im is None else (-wi) * im,
                None if re is None else wi * re)
    rr = None if re is None else wr * re
    ii = None if im is None else wi * im
    ri = None if re is None else wi * re
    ir = None if im is None else wr * im
    return (_subs(rr, ii), _adds(ri, ir))


def _dft_tiles(vals):
    """Forward DFT (e^{-2pi i nk/N}) of a list of (re, im) tile pairs;
    natural-order in and out (recursive DIT)."""
    n = len(vals)
    if n == 1:
        return list(vals)
    ev = _dft_tiles(vals[0::2])
    od = _dft_tiles(vals[1::2])
    out = [None] * n
    for k in range(n // 2):
        ang = -2.0 * math.pi * k / n
        t = _cmul_static(od[k], _snap(math.cos(ang)), _snap(math.sin(ang)))
        out[k] = _cadd(ev[k], t)
        out[k + n // 2] = _csub(ev[k], t)
    return out


def _cmul_rt(v, wr, wi):
    """v * (wr + i*wi) for runtime vector weights, zero-component elided."""
    re, im = v
    rr = None if re is None else re * wr
    ii = None if im is None else im * wi
    ri = None if re is None else re * wi
    ir = None if im is None else im * wr
    return (_subs(rr, ii), _adds(ri, ir))


def _bitrev(x: int, bits: int) -> int:
    r = 0
    for _ in range(bits):
        r = (r << 1) | (x & 1)
        x >>= 1
    return r


def _dif_tables(m2: int, m1: int):
    """Packed per-stage DIF twiddle vectors.

    Stage s (1-based, block chunk-count N = m2/2^(s-1)) multiplies its
    difference half by W_N^j per chunk j; as full-lane vectors the
    stage's table has H_s = (N/2)*m1 lanes with the value constant over
    each m1-chunk.  All stages pack into one (2, m2*m1) array at static
    offsets [0, m/2, 3m/4, ...] (total m - m1 lanes)."""
    m = m2 * m1
    tbl = np.zeros((2, m), np.float64)
    offs = []
    off = 0
    n = m2
    while n > 1:
        h = (n // 2) * m1
        j = np.repeat(np.arange(n // 2), m1)
        w = np.exp(-2j * np.pi * j / n)
        tbl[0, off:off + h] = w.real
        tbl[1, off:off + h] = w.imag
        offs.append((off, h))
        off += h
        n //= 2
    return tbl.astype(np.float32), offs


def _dif_fft_blocks(fir, dif_ref, offs, m1: int, m2: int):
    """Iterative DIF radix-2 FFT over the m2 lane-chunks of ``fir``
    (tb, m2*m1), operating on CONTIGUOUS lane blocks — the first stages
    are single ops on (tb, m/2)-wide tiles, which is what keeps the VPU
    at full-tile efficiency (the per-(k2)-pair small-tile form measured
    ~4x off VPU peak).  Returns m2 (re, im) pairs of width m1 in
    BIT-REVERSED k2 order (callers index output ``_bitrev(k2)``)."""
    blocks = [(fir, None)]
    for (off, h) in offs:
        twr = dif_ref[0, off:off + h]
        twi = dif_ref[1, off:off + h]
        nxt = []
        for (re, im) in blocks:
            lo = (re[:, :h], None if im is None else im[:, :h])
            hi = (re[:, h:], None if im is None else im[:, h:])
            u = _cadd(lo, hi)
            d = _csub(lo, hi)
            v = _cmul_rt(d, twr, twi)
            nxt.append(u)
            nxt.append(v)
        blocks = nxt
    return blocks


def _fft_tables(m: int, m1_pref: int = None):
    """Twiddle rows + the stage-2 DFT matrix.

    Returns (m1, m2, tw (2, m2, m1) np.float32, wm (2*m1, m1)
    np.float32) where wm = [wmr | wmi] with wmr = [w1r^T ; -w1i^T],
    wmi = [w1i^T ; w1r^T], so that with Zc = [Zr | Zi] (rows stacked
    over k2) ONE matmul yields both components: Zc @ wm = [Cr | Ci]
    (N = m1 = 2*k1n keeps the MXU fully fed at m1=256).  NUMPY results
    only: this function may first run inside a jit trace, and caching
    jnp arrays created there would cache tracers.
    """
    m1, m2 = _factor(m, m1_pref)
    k1n = m1 // 2
    tw = np.exp(-2j * np.pi * np.outer(np.arange(m2), np.arange(m1)) / m)
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(m1), np.arange(k1n)) / m1)
    wmr = np.concatenate([w1.real, -w1.imag], axis=0)   # (2*m1, k1n)
    wmi = np.concatenate([w1.imag, w1.real], axis=0)
    wm = np.concatenate([wmr, wmi], axis=1)             # (2*m1, 2*k1n)
    return (m1, m2,
            np.stack([tw.real, tw.imag]).astype(np.float32),
            wm.astype(np.float32))


def _kernel(x_hbm, tail_hbm, w_ref, tw_ref, dif_ref, wm_ref, wm_lo_ref,
            frac_ref, phase_ref, gains_ref, out_ref, new_buf,
            hist_buf, hist_stage, z_scratch, sems, *, taps, taps_pad, tb,
            nb, m, m1, m2, groups, dif_offs, quantized, stage2, w_scale,
            ablate, pad0=0, fir_mode="roll", z_mode="scratch",
            btile=False, opack=False):
    s = pl.program_id(0)
    b = pl.program_id(1)
    # btile: the out block carries the b-tile as its own leading axis
    # ((1, 1, 2m2, tb, k1n) over (s, nb, 2m2, tb, k1n)) so each grid
    # step's writeback is ONE dense 512 KB DMA instead of 2*m2 strided
    # 4 KB chunks — the kernel floor decomposition (s10) measured the
    # chunked writeback as the dominant fixed cost
    oz = (0, 0) if btile else (0,)
    # opack: each k2 plane's (re | im) pair is ONE (tb, 2*k1n) lane-
    # concatenated store — a full 128-lane tile at m1=128 (k1n=64),
    # where the separate re/im stores are half-tile minor dims and the
    # out writeback measured 219 GB/s vs 546 in (s10 micro-probes)
    # perf-ablation flags (comma-separated, e.g. "no_fir,no_stage2"):
    # each skips one phase so on-chip deltas attribute the kernel's time
    ab = frozenset(t.strip() for t in (ablate or "").split(",") if t.strip())
    unknown = ab - {"no_fir", "no_fft", "no_twiddle", "no_stage2",
                    "no_output", "no_convert"}
    if unknown:
        # a typo'd flag would silently ablate nothing and read as
        # "this phase is free" in an attribution sweep
        raise ValueError(f"unknown ablate flag(s): {sorted(unknown)}")

    # ---------------- FIR (overlap-save, VMEM history) ----------------
    # Two input conventions (static choice):
    #
    # ``pad0 == 0`` (concatenated): ``x_hbm`` holds history + stream in
    # one array.  The aligned tiling consumes taps_pad + nb*tb frames
    # but the stream only has n_frames = taps_pad + nb*tb - pad frames
    # (pad = taps_pad - taps + 1, 0 < pad <= 8), so the LAST tile splits
    # its DMA: the first tb-8 frames come straight from the stream and
    # the final 8-row group from ``tail_hbm`` — an 8-frame zero-padded
    # copy of the stream's last 8-pad frames built by the wrapper.  That
    # keeps every DMA row count 8-aligned (Mosaic's rule) at a wrapper
    # cost of 8 frames per stream, instead of a padded copy of the
    # WHOLE input (a full extra HBM pass, ~0.5 ms of the 4k dispatch).
    # The pad frames are inert: output spectrum i of tile b uses frames
    # b*tb + i .. + taps - 1, so the top pad frames never feed an FMA
    # (they are only shuffled by the rolls), and hist_buf's last-tile
    # update is overwritten at the next stream's b == 0.
    #
    # ``pad0 == taps_pad - taps + 1 > 0`` (split): ``x_hbm`` is the
    # carried history (s, taps_pad, m) — the previous stream's LAST
    # taps_pad frames (first pad0 of them dead) — and ``tail_hbm`` is
    # the new chunk (s, nb*tb, m).  Output j then uses stream frames
    # j + pad0 .. j + pad0 + taps - 1, every DMA is naturally 8-aligned
    # (no tail machinery), and — the point — the streaming step passes
    # its carry and chunk STRAIGHT through as separate refs: no
    # [history | chunk] concat and no (A, P, T)->(S, nf, m) relayout,
    # which together cost ~7 ms of the 28 ms 64-ant 4k FX step.
    split = pad0 > 0
    chunk_hbm = tail_hbm          # split-mode naming

    if split:
        def new_dma(tile_idx, slot):
            return pltpu.make_async_copy(
                chunk_hbm.at[s, pl.ds(tile_idx * tb, tb)],
                new_buf.at[slot], sems.at[slot])

        @pl.when(b == 0)
        def _():
            hist_dma = pltpu.make_async_copy(
                x_hbm.at[s], hist_stage, sems.at[3])
            hist_dma.start()
            new_dma(0, 0).start()
            hist_dma.wait()
            hist_buf[...] = hist_stage[...].astype(jnp.float32)

        if nb > 1:
            @pl.when(b + 1 < nb)
            def _():
                new_dma(b + 1, (b + 1) % 2).start()

        slot = b % 2
        new_dma(b, slot).wait()
    else:
        def new_dma(tile_idx, slot):
            return pltpu.make_async_copy(
                x_hbm.at[s, pl.ds(taps_pad + tile_idx * tb, tb)],
                new_buf.at[slot], sems.at[slot])

        def last_bulk_dma(slot):
            return pltpu.make_async_copy(
                x_hbm.at[s, pl.ds(taps_pad + (nb - 1) * tb, tb - 8)],
                new_buf.at[slot, pl.ds(0, tb - 8)], sems.at[slot])

        def tail_dma(slot):
            return pltpu.make_async_copy(
                tail_hbm.at[s], new_buf.at[slot, pl.ds(tb - 8, 8)],
                sems.at[2])

        def start_last(slot):
            if tb > 8:
                last_bulk_dma(slot).start()
            tail_dma(slot).start()

        def wait_last(slot):
            if tb > 8:
                last_bulk_dma(slot).wait()
            tail_dma(slot).wait()

        @pl.when(b == 0)
        def _():
            hist_dma = pltpu.make_async_copy(
                x_hbm.at[s, pl.ds(0, taps_pad)], hist_stage, sems.at[3])
            hist_dma.start()
            if nb == 1:
                start_last(0)
            else:
                new_dma(0, 0).start()
            hist_dma.wait()
            hist_buf[...] = hist_stage[...].astype(jnp.float32)

        if nb > 1:
            @pl.when(b + 1 < nb - 1)
            def _():
                new_dma(b + 1, (b + 1) % 2).start()

            @pl.when(b == nb - 2)
            def _():
                start_last((nb - 1) % 2)

        slot = b % 2
        if nb > 1:
            @pl.when(b < nb - 1)
            def _():
                new_dma(b, slot).wait()

            @pl.when(b == nb - 1)
            def _():
                wait_last(slot)
        else:
            wait_last(slot)

    if "no_convert" in ab:
        # attribution probe: replace the full int8->fp32 unpack with
        # tiled copies of one converted 8-row block (the block read
        # keeps the DMA live) — isolates most of the VPU unpack share
        # of the kernel floor; the tb//8 concatenates remain, so a
        # small fraction of the unpack cost stays in the "floor" bucket
        new_f32 = jnp.concatenate(
            [new_buf[slot][0:8].astype(jnp.float32)] * (tb // 8), axis=0)
    else:
        new_f32 = new_buf[slot].astype(jnp.float32)
    if "no_fir" in ab:
        fir = new_f32 * w_ref[0, 0]
    else:
        buf = jnp.concatenate([hist_buf[...], new_f32], axis=0)
        rows = taps_pad + tb
        # taps grouped by (pad0 + t) mod 8: one shifted copy serves
        # every tap of its residue class through 8-aligned sublane
        # slices — <= 7 shifts instead of taps-1, and only one shifted
        # copy is live at a time.  Output j reads buf[j + pad0 + t]
        # (pad0 = 0 concatenated mode).
        #
        # fir_mode picks WHO produces the shifted copies:
        #  * "roll" — pltpu.roll on the VPU (sublane shuffles; measured
        #    ~2x the FIR FMAs' cost, and the VPU is this kernel's
        #    critical path: FIR+stage1+output ~55% vs MXU ~12%);
        #  * "mxu"  — shifted-identity dots on the MXU:
        #    rolled_r = P_r @ buf_bf16 with P_r[i, j] = (j == i + r).
        #    buf holds int8-derived INTEGERS (|x| <= 127, exact in
        #    bfloat16) and P_r is 0/1, so each output element is a
        #    single exact product: the fp32 dot result is BITWISE the
        #    rolled buffer, while the shuffle work moves to the idle
        #    MXU and off the VPU critical path.  No wrap rows are
        #    needed (i + r < rows for every consumed slice), so the
        #    truncated shift equals the circular roll on the read
        #    range.
        fir = None
        residues = sorted({(pad0 + t) % 8 for t in range(taps)})
        bufb = buf.astype(jnp.bfloat16) if fir_mode == "mxu" else None
        if fir_mode == "mxu" and len(residues) > 1:
            ii = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
            jj = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        for r in residues:
            if r == 0:
                rolled = buf
            elif fir_mode == "mxu":
                p_r = (jj == ii + r).astype(jnp.bfloat16)
                rolled = jax.lax.dot_general(
                    p_r, bufb, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            else:
                rolled = pltpu.roll(buf, rows - r, axis=0)
            for t in range(taps):
                off = pad0 + t
                if off % 8 != r:
                    continue
                q = off - r
                term = w_ref[t, 0] * rolled[q:q + tb]
                fir = term if fir is None else fir + term
    hist_buf[...] = new_f32[tb - taps_pad:tb]

    # ---------------- FFT: VPU radix stage-1 + MXU stage-2 ------------
    # sample n = n1 + m1*n2; X[k2 + m2*k1] = sum_n1 W_m1^(k1 n1) *
    #   tw[n1,k2] * Y[k2, n1], Y[k2] = sum_n2 fir[n1 + m1*n2] W_m2^(n2 k2).
    # Stage 1 is an iterative DIF radix-2 FFT over contiguous lane
    # blocks (full-width ops); outputs land in bit-reversed k2 order
    # and no reshapes/transposes ever touch Mosaic.
    if "no_fft" in ab:
        yy = [(fir[:, i * m1:(i + 1) * m1], None) for i in range(m2)]
    else:
        yy = _dif_fft_blocks(fir, dif_ref, dif_offs, m1, m2)
    bits = max(m2.bit_length() - 1, 0)

    # fine-delay + fringe phasor: phasor(k) = e^(-i p_t) * u^k2 * v^k1,
    # u = e^(-i a), v = u^m2, a = 2*pi*d_t/m.  Applied post-stage-2.
    d = frac_ref[0, 0, 0]    # (tb,)
    p = phase_ref[0, 0, 0]   # (tb,)
    ang = -(2.0 * jnp.pi / m) * d
    ur = jnp.cos(ang)[:, None]
    ui = jnp.sin(ang)[:, None]
    frk = jnp.cos(p)[:, None]
    fik = -jnp.sin(p)[:, None]

    # k1-part of the phasor: e^(i*ang*m2*k1) over the lane index.
    # |ang*m2*k1| <= pi/2 for |frac_delay| <= 0.5, so direct cos/sin is
    # both cheap and accurate (no range reduction needed).
    k1n = m1 // 2
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, k1n), 1)
    phi = (ang * m2)[:, None] * k_ids.astype(jnp.float32)
    pr = jnp.cos(phi)
    pi_ = jnp.sin(phi)

    def stage2_mm(z_stack):
        # each mode emits ONE (rows, 2*k1n) matmul product [Cr | Ci]
        # per pass — the concatenated wm doubles N vs separate cr/ci
        # dots, keeping the MXU fully fed at m1=256
        if stage2 == "int16":
            # both operands split to int8 hi/lo; 3 int8 MXU dots (the
            # lo*lo term is below the noise floor).  14-bit split with
            # radix 128: zh in [-127,127], zl in [-64,64] (a 256-radix
            # split overflows int8 at the +/-32767 boundary).  The
            # scale is PER ROW (= per (k2, spectrum)): each row keeps
            # its full 14 bits regardless of cross-spectrum dynamic
            # range (a global max cost ~2.5 effective bits on noise
            # inputs — round-1's 54.7 dB), and a row scale commutes
            # through the contraction exactly.
            zmax = jnp.max(jnp.abs(z_stack), axis=1, keepdims=True)
            zscale = jnp.maximum(zmax, 1e-30) / 16256.0
            z14 = jnp.round(z_stack / zscale)
            zh = jnp.round(z14 / 128.0)
            zl = z14 - zh * 128.0
            zh8 = zh.astype(jnp.int8)
            zl8 = zl.astype(jnp.int8)

            def idot(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)

            wh = wm_ref[...]
            wl = wm_lo_ref[...]
            hi = idot(zh8, wh).astype(jnp.float32)
            mid = (idot(zh8, wl) + idot(zl8, wh)).astype(jnp.float32)
            c = (hi * 16384.0 + mid * 128.0) * (zscale * w_scale)
        elif stage2 == "bf16x3":
            # hi/lo bfloat16 split of both operands, 3 bf16 MXU passes
            # with fp32 accumulation: ~16-bit effective mantissa at the
            # full bf16 MXU rate (fp32 HIGHEST costs 6 passes)
            zh = z_stack.astype(jnp.bfloat16)
            zl = (z_stack - zh.astype(jnp.float32)).astype(jnp.bfloat16)

            def bdot(a, b):
                return jax.lax.dot_general(
                    a, b, (((1,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)

            wh = wm_ref[...]
            wl = wm_lo_ref[...]
            c = bdot(zh, wh) + (bdot(zh, wl) + bdot(zl, wh))
        else:
            c = jax.lax.dot_general(
                z_stack, wm_ref[...], (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.float32, precision=_P)
        k1n_ = m1 // 2
        return c[:, 0:k1n_], c[:, k1n_:2 * k1n_]

    mg = m2 // groups
    for gi in range(groups):
        # stage this group's twiddled stage-1 rows for the stage-2
        # matmul.  z_mode picks how the (mg*tb, 2*m1) operand is built:
        #   "scratch" — store each row block into the VMEM Z scratch and
        #     feed the matmul from the ref (one full write + read of the
        #     stacked operand per tile through VMEM);
        #   "concat"  — jnp.concatenate the row blocks as a VALUE, so
        #     Mosaic schedules the stage-1 outputs straight into the
        #     matmul operand without the explicit scratch round trip
        #     (candidate for the 4k "floor" cost — bitwise identical,
        #     measure on chip before switching the default).
        rows_z = []
        for j in range(mg):
            k2 = gi * mg + j
            if k2 == 0 or "no_twiddle" in ab:
                zr, zi = yy[_bitrev(k2, bits) if k2 else 0]
            else:
                zr, zi = _cmul_rt(yy[_bitrev(k2, bits)],
                                  tw_ref[0, k2], tw_ref[1, k2])
            zr = zr if zr is not None else jnp.zeros((tb, m1), jnp.float32)
            zi = zi if zi is not None else jnp.zeros((tb, m1), jnp.float32)
            if z_mode == "concat":
                rows_z.append(jnp.concatenate([zr, zi], axis=1))
            else:
                z_scratch[j * tb:(j + 1) * tb, 0:m1] = zr
                z_scratch[j * tb:(j + 1) * tb, m1:2 * m1] = zi
        if z_mode == "concat":
            z_stack = (rows_z[0] if mg == 1
                       else jnp.concatenate(rows_z, axis=0))
        else:
            z_stack = z_scratch[...]

        if "no_stage2" in ab:
            cr_all, ci_all = z_stack[:, 0:k1n], z_stack[:, k1n:2 * k1n]
        else:
            cr_all, ci_all = stage2_mm(z_stack)

        for j in range(mg):
            k2 = gi * mg + j
            cr = cr_all[j * tb:(j + 1) * tb]
            ci = ci_all[j * tb:(j + 1) * tb]
            if "no_output" in ab:
                if opack:
                    out_ref[oz + (k2,)] = jnp.concatenate(
                        [cr, ci], axis=1).astype(out_ref.dtype)
                else:
                    out_ref[oz + (2 * k2,)] = cr.astype(out_ref.dtype)
                    out_ref[oz + (2 * k2 + 1,)] = ci.astype(out_ref.dtype)
                continue
            # k2-part of the phasor (per-spectrum complex scalar) ...
            ar = cr * frk - ci * fik
            ai = cr * fik + ci * frk
            # ... then the k1-part table
            vr = ar * pr - ai * pi_
            vi = ar * pi_ + ai * pr
            if quantized:
                gr = gains_ref[0, k2]   # (k1n,)
                gi_ = gains_ref[1, k2]
                qr = vr * gr - vi * gi_
                qi = vr * gi_ + vi * gr
                if opack:
                    out_ref[oz + (k2,)] = jnp.clip(jnp.round(
                        jnp.concatenate([qr, qi], axis=1)),
                        -127, 127).astype(jnp.int8)
                else:
                    out_ref[oz + (2 * k2,)] = jnp.clip(
                        jnp.round(qr), -127, 127).astype(jnp.int8)
                    out_ref[oz + (2 * k2 + 1,)] = jnp.clip(
                        jnp.round(qi), -127, 127).astype(jnp.int8)
            elif opack:
                out_ref[oz + (k2,)] = jnp.concatenate([vr, vi], axis=1)
            else:
                out_ref[oz + (2 * k2,)] = vr
                out_ref[oz + (2 * k2 + 1,)] = vi
            # fold u into the k2 phasor for the next k2
            nfr = frk * ur - fik * ui
            nfi = frk * ui + fik * ur
            frk, fik = nfr, nfi


def _choose_tiling(m: int, m2: int, b_out: int, taps_pad: int):
    """First PREFERRED (tb, groups) — _TB_CANDIDATES order, no longer
    descending — whose VMEM-footprint model fits the budget.

    Model (empirical, v5e): static scratch (new int8 frames, history,
    Z) plus the live fp32 temporaries of the FIR and radix-FFT phases
    ~= m*(14*tb + 8*tb/groups + 6*taps_pad) bytes.  Round-1's flat
    model capped m=8192 at tb=32; the grouped Z scratch is what buys
    tb=64 there.
    """
    order = _GROUP_CANDIDATES_BIG_M if m >= 8192 else _GROUP_CANDIDATES
    for tb in _TB_CANDIDATES:
        if tb < taps_pad or b_out % tb:
            continue
        for g in order:
            if m2 % g:
                continue
            est = m * (14 * tb + 8 * tb // g + 6 * taps_pad)
            if est <= _VMEM_BUDGET:
                return tb, g
    return 0, 1


def fengine_fused(x: jax.Array, window, taps: int, n_chans: int, *,
                  history: jax.Array = None,
                  frac_delay=None, phase=None, gains=None,
                  stage2: str = None, m1: int = None, tb: int = None,
                  groups: int = None, layout: str = "wire",
                  strict: bool = False, fir_mode: str = None,
                  z_mode: str = None, _btile: bool = None,
                  _opack: bool = None,
                  interpret: bool = False, _ablate: str = None):
    """Fused F-engine.  ``x: (..., T)`` int8; returns ``(..., B, K, 2)``
    int8 (with ``gains``) or float32 (without).

    ``history`` (split-I/O mode, the streaming fast path): ``x`` is the
    NEW chunk as frames ``(..., B, M)`` and ``history`` the carried
    overlap-save tail ``(..., taps_pad, M)`` — the previous stream's
    last ``taps_pad = roundup(taps, 8)`` frames, of which only the last
    ``taps-1`` are read.  The two arrays go to the kernel as separate
    HBM refs, so the streaming step never concatenates [history|chunk]
    and never relayouts the chunk parameter — both are full HBM passes
    (~7 ms of the 64-ant 4k FX step) that exist only to build the
    concatenated view this kernel used to want.

    ``frac_delay``/``phase``: ``(..., B)`` float32 per spectrum (zeros
    when None).  ``gains``: ``(K, 2)`` float32 re/im.  ``m1``/``tb``/
    ``groups`` override the factorisation/tiling policy (bench sweeps).
    Falls back to the unfused ops for shapes the kernel does not tile.

    ``layout="wire"`` (default) decodes to natural channel order
    ``(..., B, K, 2)`` — that array's minor dim of 2 forces a 2/128
    lane tile, making the decode a layout-bound HBM pass (~0.43 ms of
    the 4k dispatch vs 0.19 at copy speed).
    ``layout="wire_flat"`` decodes the SAME bytes to ``(..., B, 2K)``
    (k-major interleaved re/im pairs — exactly the wire form's
    C-contiguous bytes, so host consumers ``.reshape(..., K, 2)`` for
    free) at full copy speed; a bench/API surface (``bench_fengine
    --flat``) — the pipeline ships the shaped wire form, and a test
    pins the byte-identity contract between the two.
    ``layout="native"`` returns the kernel's own plane order
    ``(..., m2, 2, B, k1n)`` with channel ``k = k2 + m2*k1`` at
    ``[..., k2, c, b, k1]`` — the FX path consumes this directly (its
    corner-turn transpose absorbs the reorder for free); use
    :func:`native_channel_perm` to map channel axes back to natural
    order at dump cadence.
    """
    m = 2 * n_chans
    # measured stage-2 radix policy (s9 m1 sweep, v5e 16x512 wire):
    # at m=8192 the m1=128 factorisation wins (19.87 vs 18.28 Gsamp/s
    # — half the 4*m1 stage-2 MXU FLOPs/sample for one extra stage-1
    # radix pass; m1=64 collapses to 2.98 on the k1n=32 sub-tile
    # output, m1=512 to 14.96); at m=2048 m1=256 keeps the edge
    # (16.07 vs 15.83).  Wire layouts only: the native plane layout
    # feeds the CMAC/beam kernels, which require k1n = 128.
    if m1 is None and layout.startswith("wire") and m >= 8192:
        m1 = 128
    taps_pad = _round_up(taps, 8)
    if history is not None:
        return _fused_split(x, history, window, taps, n_chans,
                            frac_delay=frac_delay, phase=phase,
                            gains=gains, stage2=stage2, m1=m1, tb=tb,
                            groups=groups, layout=layout, strict=strict,
                            fir_mode=fir_mode, z_mode=z_mode,
                            _btile=_btile, _opack=_opack,
                            interpret=interpret, _ablate=_ablate)
    t_len = x.shape[-1]
    if t_len % m:
        raise ValueError(f"input length {t_len} not a multiple of M={m}")
    lead = x.shape[:-1]
    n_frames = t_len // m
    b_out = n_frames - (taps - 1)
    if b_out <= 0:
        raise ValueError("input shorter than the FIR window")
    s = int(np.prod(lead)) if lead else 1

    try:
        m1v, m2, tw, wm = _fft_tables(m, m1)
    except ValueError:
        m1v = m2 = 0
    if tb is None or groups is None:
        tb_auto, g_auto = _choose_tiling(m, max(m2, 1), b_out, taps_pad)
        if tb is None:
            tb = tb_auto
        if groups is None:
            groups = g_auto
    if (tb == 0 or m % 128 or taps < 2 or m2 == 0 or m2 % groups
            or b_out % tb or tb < taps_pad):
        if strict:
            # production pins impl="fused": an untileable config must
            # fail loudly, not silently run the ~3x-slower unfused path
            raise ValueError(
                f"fused kernel cannot tile n_chans={n_chans}, "
                f"taps={taps}, b_out={b_out} (tb={tb}, m2={m2}); "
                "remove strict/impl='fused' to allow the fallback")
        # fall back to the unfused path
        res = _fallback(x, window, taps, n_chans, frac_delay=frac_delay,
                        phase=phase, gains=gains)
        if layout == "wire_flat":
            return res.reshape(res.shape[:-2] + (2 * n_chans,))
        if layout == "native":
            if m2 == 0:
                raise ValueError(
                    f"native layout unavailable for {n_chans} channels")
            # wire (..., B, K=(k1,k2), c) -> native (..., m2, c, B, k1n)
            k1n = m1v // 2
            res = res.reshape(lead + (b_out, k1n, m2, 2))
            nl = len(lead)
            res = res.transpose(tuple(range(nl))
                                + (nl + 2, nl + 3, nl, nl + 1))
        return res
    nb = b_out // tb
    if stage2 is None:
        stage2 = _DEFAULT_STAGE2
    k1n = m1v // 2
    assert m2 * k1n == n_chans

    xr = x.reshape(s, n_frames, m)
    # the aligned DMA tiling reads taps_pad-taps+1 frames past the
    # stream end; the kernel's final tile fetches its last 8-row group
    # from this small zero-padded tail (8 frames per stream, vs a
    # padded copy of the WHOLE input — Mosaic requires 8-aligned DMA
    # row counts, so the tail DMA cannot simply be shortened)
    pad = taps_pad + nb * tb - n_frames
    assert 0 < pad <= 8
    zpad = jnp.zeros((s, pad, m), xr.dtype)
    tail = (zpad if pad == 8 else jnp.concatenate(
        [xr[:, n_frames - (8 - pad):, :], zpad], axis=1))

    return _launch_fused(
        xr, tail, window, s=s, lead=lead, b_out=b_out, nb=nb, tb=tb,
        groups=groups, taps=taps, taps_pad=taps_pad, m=m, m1v=m1v,
        m2=m2, tw=tw, wm=wm, frac_delay=frac_delay, phase=phase,
        gains=gains, stage2=stage2, pad0=0, layout=layout,
        n_chans=n_chans, fir_mode=fir_mode, z_mode=z_mode,
        _btile=_btile, _opack=_opack, interpret=interpret,
        _ablate=_ablate)


def _fused_split(x, history, window, taps: int, n_chans: int, *,
                 frac_delay=None, phase=None, gains=None, stage2=None,
                 m1=None, tb=None, groups=None, layout="wire",
                 strict=False, fir_mode=None, z_mode=None,
                 _btile=None, _opack=None, interpret=False,
                 _ablate=None):
    """Split-I/O fused F-engine: chunk ``x (..., B, M)`` + carried
    history ``(..., taps_pad, M)`` as separate kernel refs (no concat,
    no input relayout — see :func:`fengine_fused` docstring)."""
    m = 2 * n_chans
    taps_pad = _round_up(taps, 8)
    if x.shape[-1] != m or history.shape[-1] != m:
        raise ValueError(f"frames must be M={m} wide, got chunk "
                         f"{x.shape} / history {history.shape}")
    if history.shape[-2] != taps_pad or \
            history.shape[:-2] != x.shape[:-2]:
        raise ValueError(
            f"history must be (..., {taps_pad}, {m}) matching chunk "
            f"lead dims, got {history.shape} vs chunk {x.shape}")
    lead = x.shape[:-2]
    b_out = x.shape[-2]
    s = int(np.prod(lead)) if lead else 1
    _explicit_tiling = tb is not None or groups is not None
    try:
        m1v, m2, tw, wm = _fft_tables(m, m1)
    except ValueError:
        m1v = m2 = 0
    if tb is None or groups is None:
        tb_auto, g_auto = _choose_tiling(m, max(m2, 1), b_out, taps_pad)
        if tb is None:
            tb = tb_auto
        if groups is None:
            groups = g_auto
    if (tb == 0 or m % 128 or taps < 2 or m2 == 0 or m2 % groups
            or b_out % tb or tb < taps_pad):
        if _explicit_tiling:
            # an EXPLICIT tb/groups request must not be silently
            # re-chosen by the rebuild path — a bench sweep's "tb=128"
            # datapoint would actually measure the auto tiling
            raise ValueError(
                f"explicit tiling tb={tb}, groups={groups} does not "
                f"tile m={m}, b_out={b_out}, taps={taps}")
        # rebuild the concatenated stream and take the normal path
        # (which itself falls back for untileable shapes) — split I/O
        # is a fast-path-only calling convention
        pad0 = taps_pad - taps + 1
        full = jnp.concatenate([history[..., pad0:, :], x], axis=-2)
        return fengine_fused(
            full.reshape(lead + (-1,)), window, taps, n_chans,
            frac_delay=frac_delay, phase=phase, gains=gains,
            stage2=stage2, m1=m1, layout=layout, strict=strict,
            fir_mode=fir_mode, z_mode=z_mode, _btile=_btile,
            _opack=_opack, interpret=interpret, _ablate=_ablate)
    return _launch_fused(
        history.reshape(s, taps_pad, m), x.reshape(s, b_out, m), window,
        s=s, lead=lead, b_out=b_out, nb=b_out // tb, tb=tb,
        groups=groups, taps=taps, taps_pad=taps_pad, m=m, m1v=m1v,
        m2=m2, tw=tw, wm=wm, frac_delay=frac_delay, phase=phase,
        gains=gains, stage2=stage2, pad0=taps_pad - taps + 1,
        layout=layout, n_chans=n_chans, fir_mode=fir_mode,
        z_mode=z_mode, _btile=_btile, _opack=_opack,
        interpret=interpret, _ablate=_ablate)


def _launch_fused(ref_a, ref_b, window, *, s, lead, b_out, nb, tb,
                  groups, taps, taps_pad, m, m1v, m2, tw, wm,
                  frac_delay, phase, gains, stage2, pad0, layout,
                  n_chans, fir_mode, z_mode, _btile, _opack,
                  interpret, _ablate):
    """Shared pallas_call construction + output decode for both input
    conventions (``pad0 == 0``: ref_a = [history|stream], ref_b = tail
    tile; ``pad0 > 0``: ref_a = history frames, ref_b = chunk frames).
    """
    quantized = gains is not None
    if stage2 is None:
        stage2 = _DEFAULT_STAGE2
    if fir_mode not in (None, "roll", "mxu"):
        # same strictness as impl="fused": a typo must not silently
        # select a different engine and poison a crossover measurement
        raise ValueError(f"unknown fir_mode {fir_mode!r}")
    if z_mode not in (None, "scratch", "concat"):
        raise ValueError(f"unknown z_mode {z_mode!r}")
    if layout not in ("wire", "wire_flat", "native"):
        raise ValueError(f"unknown layout {layout!r}")
    # default SETTLED on-chip at the 4k contract shape (r3 probe,
    # scripts/sweep_r3_perf.py zmode): scratch 18.21-18.31 Gsamp/s vs
    # concat 18.05-18.21 across groups {1,2,4} — the +0.7% concat lead
    # from the small 4x256 probe shape did NOT hold where it matters,
    # so the VMEM Z-scratch staging stays the default.
    z_mode = z_mode or "scratch"
    # b-tile-major out array: each grid step writes ONE dense
    # tb*m-byte block instead of 2*m2 strided 4 KB chunks (the s10
    # floor decomposition's dominant fixed cost).  Wire layouts decode
    # from either form with one XLA transpose; the native plane
    # contract keeps the k2-major array (its consumers' BlockSpecs
    # index k2 planes across the full B axis).
    k1n = m1v // 2
    btile = False if _btile is None else bool(_btile)
    # default ON where it was measured to pay: at m1=128 (k1n=64) the
    # separate re/im stores are HALF a 128-lane tile and the paired
    # store is exactly one — interleaved on-chip reps 20.3 -> 21.5
    # Gsamp/s at the 4k wire contract shape; at k1n >= 128 the stores
    # are already tile-aligned and pairing buys nothing
    opack = ((k1n < 128 and not btile and layout != "native")
             if _opack is None else bool(_opack))
    if (btile or opack) and layout == "native":
        raise ValueError("_btile/_opack are incompatible with "
                         "layout='native'")
    if btile and opack:
        raise ValueError("_btile and _opack are mutually exclusive")
    assert m2 * k1n == n_chans
    # (S, nb, 1, tb): trailing block dims equal the array dims, which
    # is the only legal way to hand a per-(stream, tile) vector to the
    # kernel (blocks must be (8,128)-tiled or full-dimension)
    zeros_b = jnp.zeros((s, b_out), jnp.float32)
    fd = (zeros_b if frac_delay is None
          else jnp.asarray(frac_delay, jnp.float32).reshape(s, b_out)
          ).reshape(s, nb, 1, tb)
    ph = (zeros_b if phase is None
          else jnp.asarray(phase, jnp.float32).reshape(s, b_out)
          ).reshape(s, nb, 1, tb)
    # gains in kernel-output layout: g_tbl[c, k2, k1] = gains[k2+m2*k1, c]
    # (channel k = m2*k1 + k2, so this is a pure reshape+transpose)
    if quantized:
        g_tbl = jnp.asarray(gains, jnp.float32).reshape(
            k1n, m2, 2).transpose(2, 1, 0)
    else:
        g_tbl = jnp.zeros((2, m2, k1n), jnp.float32)

    if stage2 == "int16":
        # split the stage-2 DFT matrix into an int8 hi/lo pair
        w14 = np.rint(wm * 16256.0)
        wh14 = np.rint(w14 / 128.0)
        wm_lo = jnp.asarray((w14 - wh14 * 128.0).astype(np.int8))
        wm = jnp.asarray(wh14.astype(np.int8))
        w_scale = 1.0 / 16256.0
    elif stage2 == "bf16x3":
        # pure-numpy hi/lo split: fengine_fused may run inside a jit
        # trace, where round-tripping a jnp array through numpy would
        # touch a tracer
        import ml_dtypes
        wh = wm.astype(ml_dtypes.bfloat16)
        wm_lo = jnp.asarray(
            (wm - wh.astype(np.float32)).astype(ml_dtypes.bfloat16))
        wm = jnp.asarray(wh)
        w_scale = 1.0
    else:
        wm = jnp.asarray(wm)
        wm_lo = jnp.zeros((2 * m1v, m1v), jnp.int8)
        w_scale = 1.0

    w = jnp.asarray(window, jnp.float32).reshape(taps, 1, m)
    dif_tbl, dif_offs = _dif_tables(m2, m1v)
    kernel = functools.partial(
        _kernel, taps=taps, taps_pad=taps_pad, tb=tb, nb=nb, m=m, m1=m1v,
        m2=m2, groups=groups, dif_offs=tuple(dif_offs),
        quantized=quantized, stage2=stage2, w_scale=w_scale,
        ablate=_ablate, pad0=pad0, z_mode=z_mode,
        # measured crossover (v5e, 16x512): the shifted-identity dots
        # pay whenever their (rows, rows) M-dim stays MXU-friendly —
        # rows=80: mxu 19.5 vs roll 14.8 at 4k, 17.2 vs 16.4 at 1k;
        # rows=144 (tb=128): roll 16.9 vs mxu 15.1 at 1k
        fir_mode=fir_mode or
        ("mxu" if taps_pad + tb <= 96 else "roll"),
        btile=btile, opack=opack)
    out_dtype = jnp.int8 if quantized else jnp.float32
    wm_shape = (2 * m1v, m1v)
    out = pl.pallas_call(
        kernel,
        grid=(s, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((taps, 1, m), lambda s_, b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m2, m1v), lambda s_, b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m), lambda s_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wm_shape, lambda s_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec(wm_shape, lambda s_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tb), lambda s_, b_: (s_, b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tb), lambda s_, b_: (s_, b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m2, k1n), lambda s_, b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(pl.BlockSpec((1, 1, 2 * m2, tb, k1n),
                                lambda s_, b_: (s_, b_, 0, 0, 0),
                                memory_space=pltpu.VMEM)
                   if btile else
                   pl.BlockSpec((1, m2, tb, 2 * k1n),
                                lambda s_, b_: (s_, 0, b_, 0),
                                memory_space=pltpu.VMEM)
                   if opack else
                   pl.BlockSpec((1, 2 * m2, tb, k1n),
                                lambda s_, b_: (s_, 0, b_, 0),
                                memory_space=pltpu.VMEM)),
        out_shape=jax.ShapeDtypeStruct(
            (s, nb, 2 * m2, tb, k1n) if btile
            else (s, m2, b_out, 2 * k1n) if opack
            else (s, 2 * m2, b_out, k1n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tb, m), ref_b.dtype),
            pltpu.VMEM((taps_pad, m), jnp.float32),
            pltpu.VMEM((taps_pad, m), ref_b.dtype),
            # concat mode never touches the Z scratch — keep a minimal
            # allocation so the freed VMEM benefits the tiling
            pltpu.VMEM(((8 if z_mode == "concat"
                         else (m2 // groups) * tb), 2 * m1v),
                       jnp.float32),
            pltpu.SemaphoreType.DMA((4,)),
        ],
        interpret=interpret,
        # Mosaic's default 16 MB scoped-vmem stack limit rejects the
        # int16 stage-2 variant at m=8192 (18.1 MB with its int8 z-split
        # temporaries) even though the physical VMEM is 128 MB; the
        # tiling model above already bounds OUR scratch, so give the
        # compiler's stack room to breathe
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
    )(ref_a, ref_b, w, jnp.asarray(tw), jnp.asarray(dif_tbl), wm, wm_lo,
      fd, ph, g_tbl)
    # decode: out[s, 2*k2+c, t, k1] -> spectra[s, t, k2 + m2*k1, c].
    # Axis 1 is (k2, c) nested and channel k = k2 + m2*k1 means (k1, k2)
    # nesting in the wire K axis, so ONE 5-D transpose does the whole
    # decode (the two-plane gather + stack form cost a second full HBM
    # pass — 1.4 ms of the 5.7 ms dispatch at the 4k bench shape).
    if opack:
        # (s, m2, B, [re k1n | im k1n]) -> (s, B, K=(k1,k2), 2)
        out5 = out.reshape(s, m2, b_out, 2, k1n)
        tr = out5.transpose(0, 2, 4, 1, 3)
        if layout == "wire_flat":
            return tr.reshape(lead + (b_out, 2 * n_chans))
        return tr.reshape(lead + (b_out, n_chans, 2))
    if btile:
        # (s, nb, m2, 2, tb, k1n) -> (s, B, k1n-major channels, 2):
        # same single XLA transpose as the k2-major decode below, from
        # the b-tiled array
        out6 = out.reshape(s, nb, m2, 2, tb, k1n)
        res = out6.transpose(0, 1, 4, 5, 2, 3).reshape(
            s, b_out, n_chans, 2)
        if layout == "wire_flat":
            return res.reshape(lead + (b_out, 2 * n_chans))
        return res.reshape(lead + (b_out, n_chans, 2))
    out5 = out.reshape(s, m2, 2, b_out, k1n)
    if layout == "native":
        return out5.reshape(lead + (m2, 2, b_out, k1n))
    if layout == "wire_flat":
        # same transpose, FLAT (b, 2K) output: byte-identical to wire's
        # (b, K, 2) row-major, but the minor dim is 2*K instead of 2 —
        # a lane-perfect tile instead of a 2/128 one.  Measured on chip
        # (scripts/probe_decode_layout.py): the flat decode runs at
        # full copy speed (0.19 ms vs 0.43 ms int8 / 1.0 ms f32 at the
        # 16x512x4k shape) — the (K, 2) minor layout, not the
        # transpose, was the cost.
        res = out5.transpose(0, 3, 4, 1, 2).reshape(s, b_out,
                                                    2 * n_chans)
        return res.reshape(lead + (b_out, 2 * n_chans))
    res = out5.transpose(0, 3, 4, 1, 2).reshape(s, b_out, n_chans, 2)
    return res.reshape(lead + (b_out, n_chans, 2))


def _fallback(x, window, taps, n_chans, *, frac_delay=None, phase=None,
              gains=None):
    from dc_sand_tpu import ops as _ops
    from dc_sand_tpu.utils.cplx import c2ri, ri2c
    m = 2 * n_chans
    fir = _ops.pfb_fir(x, window, taps, m, impl="jnp")
    spec = _ops.channelize(fir, n_chans)
    if frac_delay is not None or phase is not None:
        b_out = spec.shape[-2]
        lead = x.shape[:-1]
        spec = _ops.fine_delay_fringe(
            spec,
            jnp.zeros(lead + (b_out,)) if frac_delay is None else frac_delay,
            jnp.zeros(lead + (b_out,)) if phase is None else phase)
    if gains is not None:
        return _ops.requantize(spec, ri2c(jnp.asarray(gains)))
    return c2ri(spec)


fengine_fused.__wrapped_fallback__ = _fallback
