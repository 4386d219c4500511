"""Matmul-formulated real FFT — the channelizer FFT on the MXU.

Measured on this chip, XLA's ``rfft`` runs on the VPU at ~1.5 ms for the
benchmark F-engine shape and dominates the pipeline; a Cooley-Tukey
split ``M = M1*M2`` expressed as two batched matmuls + a twiddle
multiply rides the MXU instead:

    x[n1 + M1*n2]  (reshape to [n2, n1])
    Y[n1, k2] = sum_n2 x[n2, n1] * W_M2^(n2 k2)      (matmul over n2)
    Z[n1, k2] = Y[n1, k2] * W_M^(n1 k2)              (twiddle)
    X[k2 + M2*k1] = sum_n1 Z[n1, k2] * W_M1^(n1 k1)  (matmul over n1)

Real input + keeping only bins k < M/2 (the channelizer drops Nyquist)
means the output matmul needs only ``M1/2`` rows of the outer DFT
matrix.  ~6x fewer MACs than a dense DFT and every MAC is MXU work.

Precision: fp32 matmuls with HIGHEST precision keep the >50 dB contract
bound with huge margin (verified vs numpy float64 rfft).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["rfft_mxu", "channelize_mxu"]

_P = jax.lax.Precision.HIGHEST


def _factor(m: int) -> tuple:
    """Pick M1 (outer) * M2 (inner) = m, both MXU-friendly."""
    for m1 in (64, 32, 128, 16, 8):
        if m % m1 == 0 and m // m1 >= 8:
            return m1, m // m1
    raise ValueError(f"FFT size {m} not factorable for the MXU path")


@functools.lru_cache(maxsize=8)
def _tables_np(m: int):
    """DFT + twiddle tables, float32 numpy (built once in float64).

    Cached as NUMPY only: jnp arrays created inside a jit trace would
    cache tracers."""
    m1, m2 = _factor(m)
    n2 = np.arange(m2)
    k2 = np.arange(m2)
    w2 = np.exp(-2j * np.pi * np.outer(n2, k2) / m2)      # (n2, k2)
    n1 = np.arange(m1)
    tw = np.exp(-2j * np.pi * np.outer(n1, k2) / m)        # (n1, k2)
    k1 = np.arange(m1 // 2)
    w1 = np.exp(-2j * np.pi * np.outer(k1, n1) / m1)       # (k1, n1)
    f32 = lambda a: a.astype(np.float32)  # noqa: E731
    return (m1, m2, f32(w2.real), f32(w2.imag), f32(tw.real),
            f32(tw.imag), f32(w1.real), f32(w1.imag))


def _tables(m: int):
    m1, m2, *arrs = _tables_np(m)
    return (m1, m2) + tuple(jnp.asarray(a) for a in arrs)


def rfft_mxu(x: jax.Array) -> jax.Array:
    """rfft over the last axis (length M), keeping bins [0, M/2).

    float32 in -> complex64 ``(..., M/2)`` out.  Matmul path; bins are in
    natural order.
    """
    m = x.shape[-1]
    m1, m2, w2r, w2i, twr, twi, w1r, w1i = _tables(m)
    lead = x.shape[:-1]
    xf = x.astype(jnp.float32).reshape(lead + (m2, m1))

    # inner DFT over n2: real x -> complex Y[n1, k2]
    def inner(w):
        # (..., n2, n1) x (n2, k2) -> (..., n1, k2)
        return jnp.einsum("...na,nk->...ak", xf, w, precision=_P)

    yr, yi = inner(w2r), inner(w2i)
    # twiddle (n1, k2)
    zr = yr * twr - yi * twi
    zi = yr * twi + yi * twr

    # outer DFT over n1: keep k1 < m1/2
    def outer(a, w):
        # (k1, n1) x (..., n1, k2) -> (..., k1, k2)
        return jnp.einsum("ka,...ac->...kc", w, a, precision=_P)

    xr = outer(zr, w1r) - outer(zi, w1i)
    xi = outer(zr, w1i) + outer(zi, w1r)
    k = (m1 // 2) * m2
    return jax.lax.complex(xr, xi).reshape(lead + (k,))


def channelize_mxu(fir_out: jax.Array, n_chans: int) -> jax.Array:
    """Drop-in for :func:`dc_sand_tpu.ops.fft.channelize` on the MXU."""
    if fir_out.shape[-1] != 2 * n_chans:
        raise ValueError(
            f"FFT length {fir_out.shape[-1]} != 2*n_chans={2 * n_chans}")
    return rfft_mxu(fir_out)
