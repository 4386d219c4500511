"""The F-engine: coarse delay -> PFB -> fine delay/fringe -> requantise.

JAX mirror of :func:`dc_sand_tpu.golden.chain.f_engine` (C2..C6), jittable
and shard_map-able over the antenna axis (each antenna's F-engine is
independent — the DP analog in SURVEY.md §2.3's parallelism table).
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from dc_sand_tpu import ops
from dc_sand_tpu.utils.cplx import c2ri, ri2c

__all__ = ["f_engine", "coarse_delay"]


def coarse_delay(x: jax.Array, delays: jax.Array, max_delay: int) -> jax.Array:
    """Integer-sample delay via read-pointer offset (C2).

    ``x: (..., T)`` with ``max_delay`` lead-in samples; ``delays`` int32
    broadcastable over the leading axes.  Output length ``T - max_delay``;
    stream delayed by d reads starting at ``max_delay - d``.  Implemented
    as a vmapped ``dynamic_slice`` — delays may be traced values (they
    change per chunk under jit).

    Out-of-range delays CLAMP to ``[0, max_delay]`` (``dynamic_slice``
    start-index semantics — a traced value cannot raise), unlike the
    golden model's ``ValueError``; :class:`~dc_sand_tpu.runtime.delays.
    DelayModel` clips at evaluation so runner-fed delays never hit the
    clamp.  Direct callers must bound their own delays.
    """
    lead = x.shape[:-1]
    t_len = x.shape[-1]
    n_out = t_len - max_delay
    xs = x.reshape(-1, t_len)
    ds = jnp.broadcast_to(jnp.asarray(delays, jnp.int32), lead).reshape(-1)

    def one(row, d):
        return jax.lax.dynamic_slice(row, (max_delay - d,), (n_out,))

    out = jax.vmap(one)(xs, ds)
    return out.reshape(lead + (n_out,))


def f_engine(x: jax.Array, window: jax.Array, taps: int, n_chans: int, *,
             history: Optional[jax.Array] = None,
             coarse_delays: Optional[jax.Array] = None, max_delay: int = 0,
             frac_delay: Optional[jax.Array] = None,
             phase: Optional[jax.Array] = None,
             gains: Optional[jax.Array] = None,
             impl: str = "auto",
             stage2: Optional[str] = None,
             layout: str = "wire") -> jax.Array:
    """Full F-engine on ``x: (..., t)`` int8/float real streams.

    ``history`` (streaming split-I/O fast path): ``x`` is the new chunk
    as FRAMES ``(..., B, M)`` and ``history`` the carried overlap-save
    tail ``(..., taps_pad, M)``; the fused kernel reads them as separate
    HBM refs — no [history|chunk] concat and no chunk relayout on the
    hot path (see ops/fengine_fused.py).  Requires ``coarse_delays``
    to be None (coarse delay rides the host/ingest feed in this mode).

    Wire format (complex never crosses the jit boundary — see
    :mod:`dc_sand_tpu.utils.cplx`): returns float32 ``(..., b, k, 2)``
    spectra when ``gains`` is None (config 1, BASELINE.json:7), else int8
    quantised ``(..., b, k, 2)`` (configs 2+, BASELINE.json:8).  ``gains``
    is float32 ``(..., k, 2)`` complex-as-ri.
    """
    m = 2 * n_chans
    if history is not None and coarse_delays is not None:
        raise ValueError("split-I/O mode keeps coarse delay on the "
                         "host/ingest path (coarse_delays must be None)")
    if coarse_delays is not None:
        x = coarse_delay(x, coarse_delays, max_delay)
    if impl in ("fused", "fused_interpret", "auto"):
        # the fused Pallas kernel (FIR+FFT+phase+requant in VMEM) is the
        # fast path on TPU; it falls back internally for untileable
        # shapes, and "auto" only takes it on a TPU-like platform.
        # "fused_interpret" runs the same kernel through the Pallas
        # interpreter — the CPU-mesh path for exercising the Pallas
        # program under shard_map exactly as it will run on a pod.
        from dc_sand_tpu.ops._dispatch import _default_platform
        if impl != "auto" or _default_platform() in ("tpu", "axon"):
            from dc_sand_tpu.ops.fengine_fused import fengine_fused
            if history is not None:
                b_out = x.shape[-2]
                lead = x.shape[:-2]
            else:
                b_out = x.shape[-1] // m - (taps - 1)
                lead = x.shape[:-1]
            fd = None if frac_delay is None else jnp.broadcast_to(
                jnp.asarray(frac_delay, jnp.float32), lead + (b_out,))
            ph = None if phase is None else jnp.broadcast_to(
                jnp.asarray(phase, jnp.float32), lead + (b_out,))
            g = None
            if gains is not None:
                g = jnp.asarray(gains)
                if jnp.iscomplexobj(g):
                    g = c2ri(g)
                g = jnp.broadcast_to(g, (n_chans, 2))
            return fengine_fused(x, window, taps, n_chans,
                                 history=history, frac_delay=fd,
                                 phase=ph, gains=g, stage2=stage2,
                                 layout=layout,
                                 strict=(impl == "fused"),
                                 interpret=(impl == "fused_interpret"))
        impl = "jnp"
    if history is not None:
        # non-fused path: rebuild the concatenated stream (correctness
        # fallback only — split I/O is a fused-kernel convention)
        from dc_sand_tpu.ops.fengine_fused import _round_up
        pad0 = _round_up(taps, 8) - taps + 1
        x = jnp.concatenate([history[..., pad0:, :], x], axis=-2)
        x = x.reshape(x.shape[:-2] + (-1,))
    if layout == "native":
        raise ValueError("layout='native' needs the fused kernel path "
                         "(impl='fused'/'auto' on TPU)")
    fir = ops.pfb_fir(x, window, taps, m, impl=impl)
    spec = ops.channelize(fir, n_chans)
    if frac_delay is not None or phase is not None:
        fd = jnp.asarray(0.0 if frac_delay is None else frac_delay)
        ph = jnp.asarray(0.0 if phase is None else phase)
        spec = ops.fine_delay_fringe(spec, fd, ph)
    if gains is not None:
        g = jnp.asarray(gains)
        if not jnp.iscomplexobj(g):
            g = ri2c(g)
        res = ops.requantize(spec, g)
    else:
        res = c2ri(spec)
    if layout == "wire_flat":
        # same bytes as (..., B, K, 2) row-major; see fengine_fused
        return res.reshape(res.shape[:-2] + (2 * n_chans,))
    return res
