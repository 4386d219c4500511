"""Time-varying delay/phase polynomial state (C12) — host side, NumPy.

Per (ant, pol) stream the geometric model is linear-in-time per chunk
(MeerKAT-style delay tracking interpolates polynomial sets at ~10 s
cadence; within a chunk linear is exact to far below the 50 dB bound):

    delay_samples(t) = d0 + d1 * t        phase(t) = p0 + p1 * t

evaluated at sample count ``t`` since stream start.  Per chunk this
yields the coarse (integer) delay, the per-spectrum fractional residual
fed to the fine-delay phase ramp (C5) and the per-spectrum fringe phase.
"""

from __future__ import annotations

import dataclasses

import numpy as np

__all__ = ["DelayModel"]


@dataclasses.dataclass
class DelayModel:
    """Linear delay/phase models for ``(n_ants, n_pols)`` streams."""

    d0: np.ndarray          # (A, P) samples
    d1: np.ndarray          # (A, P) samples/sample (dimensionless rate)
    p0: np.ndarray          # (A, P) radians
    p1: np.ndarray          # (A, P) radians/sample
    max_delay: int          # coarse-delay budget (lead-in samples)

    @classmethod
    def zeros(cls, n_ants: int, n_pols: int, max_delay: int = 0):
        z = np.zeros((n_ants, n_pols))
        return cls(z, z.copy(), z.copy(), z.copy(), max_delay)

    def evaluate_chunk(self, t0: int, n_spectra: int, fft_size: int):
        """Delay terms for the chunk whose first new sample is ``t0``.

        Returns ``(coarse (A,P) int32, frac (A,P,B) f32, phase (A,P,B)
        f32)``.  Coarse delay is frozen at the chunk start (standard
        F-engine practice: the read-pointer offset holds for a chunk, the
        sub-sample drift rides the fine-delay phase ramp); spectrum b is
        evaluated at its centre sample.
        """
        d_start = self.d0 + self.d1 * t0
        coarse = np.clip(np.rint(d_start), 0, self.max_delay).astype(np.int32)
        # centre of spectrum b within this chunk (new samples only)
        tb = t0 + (np.arange(n_spectra) + 0.5) * fft_size  # (B,)
        d_b = self.d0[..., None] + self.d1[..., None] * tb  # (A,P,B)
        frac = (d_b - coarse[..., None]).astype(np.float32)
        phase = (self.p0[..., None] + self.p1[..., None] * tb).astype(
            np.float32)
        return coarse, frac, phase
