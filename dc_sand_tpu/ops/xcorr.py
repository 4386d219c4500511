"""X-engine cross-correlation CMAC (C8) + integration (C9).

Golden semantics: :func:`dc_sand_tpu.golden.chain.xcorr` over the canonical
:func:`~dc_sand_tpu.golden.chain.baseline_pairs` ordering (2080 baselines x
4 pol products at 64 ants, BASELINE.json:5,9,10).

TPU-first design: the CMAC is expressed as a *batched int8 matmul on the
MXU* — per channel, with A = Ar + j*Ai the (antpol, time) int8 matrix,

    V = A A^H  =  (Ar Ar^T + Ai Ai^T)  +  j (Ai Ar^T - Ar Ai^T)

computed as ONE stacked s8 x s8 -> s32 matmul A2 @ A2^T with
A2 = [Ar; Ai] (256 x T at 64 dual-pol antennas — exactly the MXU's
native tile).  This replaces the reference's hand-written CUDA
CMAC/tensor-core kernels (SURVEY.md C8) with the TPU's systolic array;
integration over the time axis happens *inside* the matmul's contraction
at full int32 precision.

The streaming path (:func:`xcorr_accumulate`, used by ``make_step``)
carries the FULL (k, 2ap, 2ap) block matrix as the integration
accumulator and extracts the baseline triangle ONCE per accumulator dump
(:func:`extract_baselines` in the runner), not per chunk — per SURVEY.md
C8/C9.  On production shapes a Pallas kernel accumulates in place
(``input_output_aliases``): per grid step the int8 spectra tile and the
int32 accumulator tile meet in VMEM, so HBM sees the accumulator exactly
once per chunk instead of once for the product plus once for the add.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from dc_sand_tpu.golden.chain import baseline_pairs
from dc_sand_tpu.ops._dispatch import resolve_impl

__all__ = ["xcorr", "xcorr_full", "extract_baselines", "extract_vis",
           "xcorr_accumulate", "xcorr_accumulate_a2",
           "xcorr_accumulate_native", "acc_shape"]


def xcorr_full(q: jax.Array) -> jax.Array:
    """Full correlation matrix from channel-major quantised spectra.

    ``q: (k, ant, pol, b, 2)`` int8 (corner-turned F-engine output) ->
    ``full: (k, ap, ap, 2)`` int32 with ``ap = ant*n_pols + pol``, last axis
    (re, im), integrated over the ``b`` spectra axis.
    """
    k, n_ants, n_pols, b, _ = q.shape
    ap = n_ants * n_pols
    a = q.reshape(k, ap, b, 2)
    # stacked form: one matmul of A2 = [Ar; Ai] against itself gives the
    # four real blocks [[ArAr^T, ArAi^T], [AiAr^T, AiAi^T]] — measured
    # ~16% faster than four separate dot_generals (fewer input passes)
    a2 = jnp.concatenate([a[..., 0], a[..., 1]], axis=1)  # (k, 2ap, b)
    full2 = jax.lax.dot_general(
        a2, a2, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)                 # (k, 2ap, 2ap)
    rr = full2[:, :ap, :ap]
    ri = full2[:, :ap, ap:]
    ir = full2[:, ap:, :ap]
    ii = full2[:, ap:, ap:]
    vr = rr + ii
    vi = ir - ri
    return jnp.stack([vr, vi], axis=-1)


def extract_baselines(full: jax.Array, n_ants: int,
                      n_pols: int) -> jax.Array:
    """(k, ap, ap, 2) int32 -> (n_bl, pol_i, pol_j, k, 2) int32 over the
    canonical i<=j baseline ordering."""
    pairs = baseline_pairs(n_ants)
    p = np.arange(n_pols)
    rows = pairs[:, 0, None] * n_pols + p[None, :]  # (n_bl, pol)
    cols = pairs[:, 1, None] * n_pols + p[None, :]
    out = full[:, rows[:, :, None], cols[:, None, :]]  # (k, bl, pi, pj, 2)
    return jnp.moveaxis(out, 0, 3)


def acc_shape(n_ants: int, n_pols: int, n_chans: int) -> tuple:
    """Shape of the streaming X-engine integration accumulator: the full
    (k, 2ap, 2ap) stacked-block matrix carried across chunks."""
    ap = n_ants * n_pols
    return (n_chans, 2 * ap, 2 * ap)


def _cmac_kernel(q_ref, acc_ref, out_ref, *, kt):
    # q_ref: (kt, 2ap, b) int8; acc_ref/out_ref: (kt, 2ap, 2ap) int32
    # (aliased, accumulated in place in VMEM)
    for c in range(kt):
        a2 = q_ref[c]
        out_ref[c] = acc_ref[c] + jax.lax.dot_general(
            a2, a2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.int32)


def _xcorr_accumulate_pallas(acc: jax.Array, a2: jax.Array,
                             interpret: bool = False) -> jax.Array:
    """acc (k, 2ap, 2ap) int32 += a2 @ a2^T per channel, in place.

    ``a2: (k, 2ap, b) int8`` stacked [Ar; Ai].  Channel tiles of ``kt``
    ride the grid; the accumulator tile is read, bumped and written once
    (donated via ``input_output_aliases``).
    """
    k, tap, b = a2.shape
    kt = None
    for cand in (8, 4, 2, 1):
        # VMEM per step: q tile + 2x acc tile (+ dot temp) — keep << 16M
        if k % cand == 0 and cand * tap * (b + 12 * tap) <= 8 * 1024 * 1024:
            kt = cand
            break
    if kt is None:
        # even a single-channel tile exceeds the VMEM budget (huge
        # tap*b): signal the caller to take the jnp path rather than
        # launching a kernel that fails at compile
        return None
    return pl.pallas_call(
        functools.partial(_cmac_kernel, kt=kt),
        grid=(k // kt,),
        in_specs=[
            pl.BlockSpec((kt, tap, b), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, tap, tap), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kt, tap, tap), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((k, tap, tap), jnp.int32),
        input_output_aliases={1: 0},
        interpret=interpret,
    )(a2, acc)


def xcorr_accumulate(acc: jax.Array, q: jax.Array,
                     impl: str = "auto") -> jax.Array:
    """One chunk of X-engine integration: ``acc + sum_b A A^H`` blocks.

    ``acc: (k, 2ap, 2ap) int32`` (see :func:`acc_shape`); ``q: (k, ant,
    pol, b, 2) int8`` corner-turned F-engine output.  Returns the bumped
    accumulator (same block layout as :func:`xcorr_full`, so
    :func:`extract_baselines` applies at dump time).
    """
    k, n_ants, n_pols, b, _ = q.shape
    ap = n_ants * n_pols
    a = q.reshape(k, ap, b, 2)
    a2 = jnp.concatenate([a[..., 0], a[..., 1]], axis=1)  # (k, 2ap, b)
    return xcorr_accumulate_a2(acc, a2, impl=impl)


def xcorr_accumulate_a2(acc: jax.Array, a2: jax.Array,
                        impl: str = "auto") -> jax.Array:
    """Same as :func:`xcorr_accumulate` on a prebuilt stacked operand
    ``a2: (k, 2ap, b) int8`` ([Ar; Ai] rows) — the form the fused
    F-engine's NATIVE layout produces in one transpose (the per-channel
    ordering of ``k`` is the caller's business; extraction unpermutes at
    dump cadence)."""
    impl = resolve_impl(impl)
    _, tap, b = a2.shape
    # Pallas wants lane/sublane-tileable operands; small test shapes ride
    # the jnp path (same math, XLA batched matmul)
    if impl.startswith("pallas") and tap % 8 == 0 and b % 128 == 0:
        out = _xcorr_accumulate_pallas(
            acc, a2, interpret=(impl == "pallas_interpret"))
        if out is not None:
            return out
    full2 = jax.lax.dot_general(
        a2, a2, dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.int32)
    return acc + full2


def _cmac_native_kernel(keep_ref, qn_ref, eye_ref, acc_ref, out_ref,
                        x2_scr, *, ap, b, k1n, kg):
    """Fused relayout + CMAC for one (k2-plane, k1-group) grid step.

    The native F-engine layout has channel k1 on the LANE axis, but the
    CMAC needs per-channel (2ap, b) matrices — a relayout XLA performs
    as a ~117 GB/s HBM transpose pass (4.6 ms/chunk at the 64-ant 4k
    shape).  Here the relayout happens on the MXU instead: contracting
    an identity against the lane axis moves it to the FRONT
    (``z[k1c, c, s, t] = sum_k1 I[k1c, k1] x2[c, s, t, k1]``) — each
    output is a one-hot sum of int8-range values, exact in bf16 — and
    the operand never round-trips HBM.  The per-channel CMAC then runs
    in bf16 with fp32 accumulation, which is EXACT for int8 spectra as
    long as b <= 1024 (|sum| <= b * 127^2 < 2^24); the wrapper gates on
    that and falls back to the int8-MXU a2 path otherwise.
    """
    g = pl.program_id(1)

    @pl.when(g == 0)
    def _():
        # qn block (ap, 1, 2, b, k1n) int8 — fetched once per k2 (the
        # index map repeats across g, so Pallas skips the re-fetch);
        # cast+leading-permute to stacked-real-major (c-major rows,
        # matching the a2/acc convention)
        x2_scr[...] = qn_ref[:, 0].astype(jnp.bfloat16).transpose(
            1, 0, 2, 3)

    # this k1-group's slice of the relayout: one MXU pass
    zf = jax.lax.dot_general(
        eye_ref[...], x2_scr[...], (((1,), (3,)), ((), ())),
        preferred_element_type=jnp.float32)       # (kg, 2, ap, b)
    z = zf.astype(jnp.bfloat16)                   # exact: int8 range
    # integration-window reset rides into the accumulate (keep = 0
    # zeroes the carry) — a lax.cond at the XLA level costs a full
    # copy of the 1 GB accumulator on its identity arm
    keep = keep_ref[0]
    for k1 in range(kg):
        a2 = z[k1].reshape(2 * ap, b)
        v = jax.lax.dot_general(
            a2, a2, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)   # exact: < 2^24
        out_ref[0, k1] = acc_ref[0, k1] * keep + v.astype(jnp.int32)


def xcorr_accumulate_native(acc: jax.Array, qn: jax.Array,
                            reset=None, impl: str = "auto") -> jax.Array:
    """Streaming X-engine integration STRAIGHT from the fused F-engine's
    native plane layout (no materialised corner-turn).

    ``acc: (K, 2ap, 2ap) int32`` in NATIVE channel order (k2-major,
    ``K = m2 * k1n``); ``qn: (a, p, m2, 2, b, k1n) int8`` as produced by
    ``f_engine(..., layout="native")`` (possibly after an ``all_to_all``
    that split the m2 axis).  Bitwise-identical to building ``a2`` with
    the XLA transpose and calling :func:`xcorr_accumulate_a2`; the
    Pallas kernel does the relayout on the MXU in VMEM, replacing the
    chunk's costliest HBM pass (SURVEY.md:146-150 C8 native kernel).

    ``reset`` (optional traced bool) zeroes the carried accumulator for
    a new integration window INSIDE the kernel — at the XLA level that
    conditional costs a full defensive copy of the accumulator.
    """
    impl = resolve_impl(impl)
    a, p, m2, _, b, k1n = qn.shape
    ap = a * p
    # footprint gate: the b-linear VMEM residents — the double-buffered
    # qn block (ap*2*b*k1n int8 x2) and the x2 relayout scratch
    # (2*ap*b*k1n bf16) — total 8*ap*b*k1n bytes and do NOT shrink with
    # the kg group scaling below; bound them so gate-admitted shapes
    # actually compile (flagship ap=128, b=512, k1n=128 = 67 MB,
    # measured good; b=1024 would be 134 MB > the 100 MB kernel limit)
    ok = (impl.startswith("pallas") and k1n % 128 == 0 and b % 128 == 0
          and b <= 1024                      # fp32-CMAC exactness bound
          and 8 * ap * b * k1n <= 96 * 1024 * 1024
          and (2 * ap) % 8 == 0 and acc.shape[0] == m2 * k1n)
    keep = (jnp.int32(1) if reset is None
            else 1 - jnp.asarray(reset).astype(jnp.int32))
    if not ok:
        if reset is not None:
            acc = acc * keep
        a2 = qn.transpose(2, 5, 3, 0, 1, 4).reshape(
            m2 * k1n, 2 * ap, b)
        return xcorr_accumulate_a2(acc, a2, impl=impl)
    # k1-group size: kg*b bounds the fp32 relayout temporary (kg, 2,
    # ap, b) and the per-group acc/out blocks; scale it down for long
    # integration tiles so the kernel stays inside scoped VMEM (b=512
    # at kg=k1n//4 measured 118.76 MB > the 100 MB limit)
    kg = max(1, min(k1n // 4, (k1n // 4) * 256 // b))
    while k1n % kg:
        kg -= 1
    qn2 = qn.reshape(ap, m2, 2, b, k1n)
    eye = jnp.asarray(np.eye(k1n, dtype=np.float32), jnp.bfloat16)
    acc4 = acc.reshape(m2, k1n, 2 * ap, 2 * ap)
    out = pl.pallas_call(
        functools.partial(_cmac_native_kernel, ap=ap, b=b, k1n=k1n,
                          kg=kg),
        grid=(m2, k1n // kg),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec((ap, 1, 2, b, k1n),
                         lambda k2, g: (0, k2, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kg, k1n), lambda k2, g: (g, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, kg, 2 * ap, 2 * ap),
                         lambda k2, g: (k2, g, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, kg, 2 * ap, 2 * ap),
                               lambda k2, g: (k2, g, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct(acc4.shape, jnp.int32),
        scratch_shapes=[pltpu.VMEM((2, ap, b, k1n), jnp.bfloat16)],
        input_output_aliases={3: 0},
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=(impl == "pallas_interpret"),
    )(keep.reshape(1), qn2, eye, acc4)
    return out.reshape(acc.shape)


def extract_vis(acc: jax.Array, n_ants: int, n_pols: int) -> jax.Array:
    """Dump-time extraction from the streaming block accumulator.

    ``acc: (k, 2ap, 2ap) int32`` (from :func:`xcorr_accumulate`) ->
    ``(n_bl, pi, pj, k, 2) int32`` canonical visibilities.  Runs once
    per accumulator dump (the runner jits it), so its gather cost is
    amortised over the whole integration window.
    """
    ap = n_ants * n_pols
    rr = acc[:, :ap, :ap]
    ri = acc[:, :ap, ap:]
    ir = acc[:, ap:, :ap]
    ii = acc[:, ap:, ap:]
    full = jnp.stack([rr + ii, ir - ri], axis=-1)
    return extract_baselines(full, n_ants, n_pols)


def xcorr(q: jax.Array) -> jax.Array:
    """Channel-major quantised spectra -> integrated visibilities.

    ``q: (k, ant, pol, b, 2)`` int8 -> ``(n_bl, pol, pol, k, 2)`` int32.
    Headroom: |V| <= 2 * 127^2 * b; keep ``b`` per accumulation below
    ~66k spectra (int32 bound) — the runner's dump cadence enforces this.
    """
    _, n_ants, n_pols, _, _ = q.shape
    return extract_baselines(xcorr_full(q), n_ants, n_pols)
