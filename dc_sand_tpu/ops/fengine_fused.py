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
   via circular rolls.  (A 7-pre-roll + aligned-slice variant that
   halves roll traffic measured perf-neutral on v5e — the VPU FMAs
   dominate, not the rolls.)
2. **FFT** — Cooley-Tukey ``M = m1*m2`` with ``m1`` lane-aligned
   (256/512): stage 1 is ``m2^2`` statically-weighted vector FMAs over
   lane-aligned slices (VPU; the DFT-m2 weights are baked into the
   program as scalars); twiddles ride a per-k2 loop; stage 2 is ONE
   full-width MXU matmul per component — sublane-stacked ``[Zr | Zi]``
   ``(m2*TB, 2*m1)`` against prebuilt ``[w1r^T; -w1i^T]`` /
   ``[w1i^T; w1r^T]`` matrices (fp32 HIGHEST; Mosaic supports only
   DEFAULT/HIGHEST, and DEFAULT's bf16 passes land at ~51 dB — too
   close to the contract bound).
3. **Fine delay + fringe** — the phasor factorises as
   ``e^(-i p_t) * u^k2 * v^k1`` (``u = e^(-i 2pi d_t/M)``, ``v=u^m2``):
   the k2 part folds into the twiddle loop as a complex scalar update,
   the k1 part is direct small-angle cos/sin over the lane index.
4. **Requant** — complex gain, round-half-even, saturate, int8.

Output layout: ``2*m2`` planes ``(S, 2*m2, B, m1/2)`` — (re, im) per
k2 — because a trailing (re,im) axis of 2 cannot be tiled; the wrapper
decodes to the natural-order ``(..., B, K, 2)`` wire format (channel
``k = k2 + m2*k1``).

Measured v5e: 13.9 Gsamp/s/chip full chain (2.6x the unfused XLA path,
above the 13.7 Gsamp/s real-time floor); >80 dB end-to-end on hardware,
exact vs golden in interpreter mode.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["fengine_fused"]

_P = jax.lax.Precision.HIGHEST

# spectra per grid step: first entry dividing the chunk's spectra count
# wins (measured on v5e at 1k chans: tb=128 13.9 Gsamp/s, 64: 13.6,
# 32: 12.7 — bigger tiles amortise better until VMEM runs out)
_TB_CANDIDATES = (128, 64, 32, 16, 8)

# stage-2 DFT matmul mode: "fp32" = dot_general fp32 HIGHEST (3 bf16
# passes per dot); "int16" = split both operands into int8 hi/lo and run
# int8 MXU dots (2x the bf16 rate; ~2x faster stage 2, ~90 dB stage
# accuracy).  Selected per call via fengine_fused(stage2=...).
_DEFAULT_STAGE2 = "fp32"


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


def _factor(m: int):
    """m = m1 * m2 with m1 a lane-aligned power of two (the stage-2
    matmul contracts 2*m1 and emits k1 = m1/2 outputs at full MXU
    width) and m2 small (stage 1 runs as m2^2 scalar-weighted vector
    FMAs on the VPU)."""
    for m1 in (512, 256, 128):
        if m % m1 == 0 and 8 <= m // m1 <= 32:
            return m1, m // m1
    raise ValueError(f"FFT size {m} not supported by the fused kernel")


def _fft_tables(m: int):
    """Stage-1 scalar weights + twiddle/stage-2 matrices + layouts.

    Returns (m1, m2, w2 numpy (2, m2, m2) STATIC python scalars,
    tw (2, m2, m1) jnp, wmr/wmi (2*m1, m1//2) jnp) where
    wmr = [w1r^T ; -w1i^T], wmi = [w1i^T ; w1r^T] so that with
    Zc = [Zr | Zi] (rows stacked over k2): Cr = Zc @ wmr, Ci = Zc @ wmi.
    """
    m1, m2 = _factor(m)
    k1n = m1 // 2
    w2 = np.stack([
        np.cos(2 * np.pi * np.outer(np.arange(m2), np.arange(m2)) / m2),
        -np.sin(2 * np.pi * np.outer(np.arange(m2), np.arange(m2)) / m2),
    ]).astype(np.float64)
    tw = np.exp(-2j * np.pi * np.outer(np.arange(m2), np.arange(m1)) / m)
    w1 = np.exp(-2j * np.pi * np.outer(np.arange(m1), np.arange(k1n)) / m1)
    wmr = np.concatenate([w1.real, -w1.imag], axis=0)   # (2*m1, k1n)
    wmi = np.concatenate([w1.imag, w1.real], axis=0)
    # NUMPY results only: this function may first run inside a jit
    # trace, and caching jnp arrays created there would cache tracers
    return (m1, m2, w2,
            np.stack([tw.real, tw.imag]).astype(np.float32),
            wmr.astype(np.float32), wmi.astype(np.float32))


def _kernel(x_hbm, w_ref, tw_ref, wmr_ref, wmi_ref, wmr_lo_ref,
            wmi_lo_ref, frac_ref, phase_ref, gains_ref, out_ref, new_buf,
            hist_buf, hist_stage, z_scratch, sems, *, taps, taps_pad, tb,
            nb, m, m1, m2, w2, quantized, stage2, w_scale):
    s = pl.program_id(0)
    b = pl.program_id(1)

    # ---------------- FIR (overlap-save, VMEM history) ----------------
    def new_dma(tile_idx, slot):
        return pltpu.make_async_copy(
            x_hbm.at[s, pl.ds(taps_pad + tile_idx * tb, tb)],
            new_buf.at[slot], sems.at[slot])

    @pl.when(b == 0)
    def _():
        hist_dma = pltpu.make_async_copy(
            x_hbm.at[s, pl.ds(0, taps_pad)], hist_stage, sems.at[2])
        hist_dma.start()
        new_dma(0, 0).start()
        hist_dma.wait()
        hist_buf[...] = hist_stage[...].astype(jnp.float32)

    @pl.when(b + 1 < nb)
    def _():
        new_dma(b + 1, (b + 1) % 2).start()

    slot = b % 2
    new_dma(b, slot).wait()

    new_f32 = new_buf[slot].astype(jnp.float32)
    buf = jnp.concatenate([hist_buf[...], new_f32], axis=0)
    rows = taps_pad + tb
    fir = w_ref[0, 0] * buf[0:tb]
    for t in range(1, taps):
        fir = fir + w_ref[t, 0] * pltpu.roll(buf, rows - t, axis=0)[0:tb]
    hist_buf[...] = new_f32[tb - taps_pad:tb]

    # ---------------- FFT: VPU stage-1 + one MXU stage-2 --------------
    # sample n = n1 + m1*n2; X[k2 + m2*k1] = sum_n1 W_m1^(k1 n1) *
    #   tw[n2->k2] * sum_n2 fir[n1 + m1*n2] W_m2^(n2 k2).
    # Stage 1 uses lane-aligned slices fir[:, m1*n2 : m1*(n2+1)] with
    # STATIC scalar weights (w2 is baked into the program), so no
    # reshapes/transposes ever touch Mosaic.
    slices = [fir[:, m1 * n2:m1 * (n2 + 1)] for n2 in range(m2)]

    # fringe + k2-part of the fine-delay phasor, updated per k2:
    # phasor(k) = e^(-i p_t) * u^k2 * v^k1,  u = e^(-i a), v = u^m2,
    # a = 2*pi*d_t/m.
    d = frac_ref[0, 0, 0]    # (tb,)
    p = phase_ref[0, 0, 0]   # (tb,)
    ang = -(2.0 * jnp.pi / m) * d
    ur = jnp.cos(ang)[:, None]
    ui = jnp.sin(ang)[:, None]
    fr = jnp.cos(p)[:, None]
    fi = -jnp.sin(p)[:, None]

    for k2 in range(m2):
        yr = w2[0, 0, k2] * slices[0]
        yi = w2[1, 0, k2] * slices[0]
        for n2 in range(1, m2):
            cr, ci = w2[0, n2, k2], w2[1, n2, k2]
            if cr:
                yr = yr + cr * slices[n2]
            if ci:
                yi = yi + ci * slices[n2]
        # twiddle row (m1,) * k2-phasor (tb, 1), complex multiply
        twr, twi = tw_ref[0, k2], tw_ref[1, k2]
        ar = twr * fr - twi * fi          # (tb, m1) via broadcast
        ai = twr * fi + twi * fr
        # write Z rows straight into the stage-2 operand scratch
        # (a list+concat here would hold two extra copies in VMEM)
        z_scratch[k2 * tb:(k2 + 1) * tb, 0:m1] = yr * ar - yi * ai
        z_scratch[k2 * tb:(k2 + 1) * tb, m1:2 * m1] = yr * ai + yi * ar
        # fold u into the fringe term for the next k2
        nfr = fr * ur - fi * ui
        nfi = fr * ui + fi * ur
        fr, fi = nfr, nfi

    z_stack = z_scratch[...]  # (m2*tb, 2*m1)
    if stage2 == "int16":
        # both operands split to int8 hi/lo; 3 int8 MXU dots per
        # component (the lo*lo term is below the noise floor).  W tables
        # arrive pre-split as int8 with a static scale.
        # 14-bit split with radix 128: zh in [-127,127], zl in [-64,64]
        # (a 256-radix split overflows int8 at the +/-32767 boundary)
        zmax = jnp.max(jnp.abs(z_stack))
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

        def stage2_dot(wh_ref, wl_ref):
            wh = wh_ref[...]
            wl = wl_ref[...]
            hi = idot(zh8, wh).astype(jnp.float32)
            mid = (idot(zh8, wl) + idot(zl8, wh)).astype(jnp.float32)
            return (hi * 16384.0 + mid * 128.0) * (zscale * w_scale)

        cr_all = stage2_dot(wmr_ref, wmr_lo_ref)
        ci_all = stage2_dot(wmi_ref, wmi_lo_ref)
    else:
        cr_all = jax.lax.dot_general(
            z_stack, wmr_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_P)
        ci_all = jax.lax.dot_general(
            z_stack, wmi_ref[...], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_P)

    # k1-part of the phasor: e^(i*ang*m2*k1) over the lane index.
    # |ang*m2*k1| <= pi/2 for |frac_delay| <= 0.5, so direct cos/sin is
    # both cheap and accurate (no range reduction needed).
    k1n = m1 // 2
    k_ids = jax.lax.broadcasted_iota(jnp.int32, (tb, k1n), 1)
    phi = (ang * m2)[:, None] * k_ids.astype(jnp.float32)
    pr = jnp.cos(phi)
    pi_ = jnp.sin(phi)

    for k2 in range(m2):
        cr = cr_all[k2 * tb:(k2 + 1) * tb]
        ci = ci_all[k2 * tb:(k2 + 1) * tb]
        vr = cr * pr - ci * pi_
        vi = cr * pi_ + ci * pr
        if quantized:
            gr = gains_ref[0, k2]   # (k1n,)
            gi = gains_ref[1, k2]
            qr = vr * gr - vi * gi
            qi = vr * gi + vi * gr
            out_ref[0, 2 * k2] = jnp.clip(
                jnp.round(qr), -127, 127).astype(jnp.int8)
            out_ref[0, 2 * k2 + 1] = jnp.clip(
                jnp.round(qi), -127, 127).astype(jnp.int8)
        else:
            out_ref[0, 2 * k2] = vr
            out_ref[0, 2 * k2 + 1] = vi


def fengine_fused(x: jax.Array, window, taps: int, n_chans: int, *,
                  frac_delay=None, phase=None, gains=None,
                  stage2: str = None, interpret: bool = False):
    """Fused F-engine.  ``x: (..., T)`` int8; returns ``(..., B, K, 2)``
    int8 (with ``gains``) or float32 (without).

    ``frac_delay``/``phase``: ``(..., B)`` float32 per spectrum (zeros
    when None).  ``gains``: ``(K, 2)`` float32 re/im.  Falls back to the
    unfused ops for shapes the kernel does not tile.
    """
    m = 2 * n_chans
    t_len = x.shape[-1]
    if t_len % m:
        raise ValueError(f"input length {t_len} not a multiple of M={m}")
    lead = x.shape[:-1]
    n_frames = t_len // m
    b_out = n_frames - (taps - 1)
    if b_out <= 0:
        raise ValueError("input shorter than the FIR window")
    s = int(np.prod(lead)) if lead else 1
    taps_pad = _round_up(taps, 8)

    tb = 0
    for cand in _TB_CANDIDATES:
        # VMEM footprint model (empirical): ~4*m*(taps_pad + 8*tb) bytes
        # for history+fir+Z stacks+outputs; stay under ~12 MB of the
        # 16 MB scoped budget (m=8192 at tb=128 measured 44 MB -> OOM)
        if (cand >= taps_pad and b_out % cand == 0
                and 4 * m * (taps_pad + 8 * cand) <= 12 * 1024 * 1024):
            tb = cand
            break
    quantized = gains is not None
    if tb == 0 or m % 128 or taps < 2:
        # fall back to the unfused path
        from dc_sand_tpu import ops as _ops
        from dc_sand_tpu.utils.cplx import c2ri
        fir = _ops.pfb_fir(x, window, taps, m, impl="jnp")
        spec = _ops.channelize(fir, n_chans)
        if frac_delay is not None or phase is not None:
            spec = _ops.fine_delay_fringe(
                spec, jnp.zeros(lead + (b_out,)) if frac_delay is None
                else frac_delay,
                jnp.zeros(lead + (b_out,)) if phase is None else phase)
        if quantized:
            from dc_sand_tpu.utils.cplx import ri2c
            return _ops.requantize(spec, ri2c(jnp.asarray(gains)))
        return c2ri(spec)
    nb = b_out // tb
    if stage2 is None:
        stage2 = _DEFAULT_STAGE2
    try:
        m1, m2, w2, tw, wmr, wmi = _fft_tables(m)
    except ValueError:
        return fengine_fused.__wrapped_fallback__(
            x, window, taps, n_chans, frac_delay=frac_delay, phase=phase,
            gains=gains)
    k1n = m1 // 2
    assert m2 * k1n == n_chans

    xr = x.reshape(s, n_frames, m)
    # one zero pad frame: the aligned DMA tiling reads taps_pad-taps+1
    # frames past the stream end (never used in outputs)
    pad = taps_pad + nb * tb - n_frames
    if pad > 0:
        xr = jnp.concatenate(
            [xr, jnp.zeros((s, pad, m), xr.dtype)], axis=1)

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
        # split the stage-2 DFT matrices into int8 hi/lo pairs
        def split14(wm):
            w14 = np.rint(wm * 16256.0)
            wh = np.rint(w14 / 128.0)
            wl = w14 - wh * 128.0
            return (jnp.asarray(wh.astype(np.int8)),
                    jnp.asarray(wl.astype(np.int8)))
        wmr, wmr_lo = split14(wmr)
        wmi, wmi_lo = split14(wmi)
        w_scale = 1.0 / 16256.0
    else:
        wmr = jnp.asarray(wmr)
        wmi = jnp.asarray(wmi)
        zero_lo = jnp.zeros((2 * m1, k1n), jnp.int8)
        wmr_lo = wmi_lo = zero_lo
        w_scale = 1.0

    w = jnp.asarray(window, jnp.float32).reshape(taps, 1, m)
    kernel = functools.partial(
        _kernel, taps=taps, taps_pad=taps_pad, tb=tb, nb=nb, m=m, m1=m1,
        m2=m2, w2=w2, quantized=quantized, stage2=stage2,
        w_scale=w_scale)
    out_dtype = jnp.int8 if quantized else jnp.float32
    out = pl.pallas_call(
        kernel,
        grid=(s, nb),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((taps, 1, m), lambda s_, b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m2, m1), lambda s_, b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * m1, k1n), lambda s_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * m1, k1n), lambda s_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * m1, k1n), lambda s_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2 * m1, k1n), lambda s_, b_: (0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tb), lambda s_, b_: (s_, b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 1, tb), lambda s_, b_: (s_, b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, m2, k1n), lambda s_, b_: (0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 2 * m2, tb, k1n),
                               lambda s_, b_: (s_, 0, b_, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s, 2 * m2, b_out, k1n), out_dtype),
        scratch_shapes=[
            pltpu.VMEM((2, tb, m), xr.dtype),
            pltpu.VMEM((taps_pad, m), jnp.float32),
            pltpu.VMEM((taps_pad, m), xr.dtype),
            pltpu.VMEM((m2 * tb, 2 * m1), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(xr, w, jnp.asarray(tw), wmr, wmi, wmr_lo, wmi_lo, fd, ph,
      g_tbl)
    # decode: out[s, 2*k2+c, t, k1] -> spectra[s, t, k2 + m2*k1, c]
    re = out[:, 0::2]                    # (s, m2, B, k1n)
    im = out[:, 1::2]
    re = re.transpose(0, 2, 3, 1).reshape(s, b_out, n_chans)
    im = im.transpose(0, 2, 3, 1).reshape(s, b_out, n_chans)
    res = jnp.stack([re, im], axis=-1)
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
