"""Beam-steering weight generation (B-engine support, BASELINE.json:11).

A coherent beam points at a sky direction by compensating each antenna's
geometric delay: weight w[beam, ant, chan] = exp(+2*pi*i * f_k * tau)
(conjugate of the propagation phase), optionally amplitude-tapered.
dc_sand's beamformer experiments drive their CUDA kernels with exactly
such steering-vector weights (SURVEY.md §2.3 C10); here they are plain
NumPy, handed to the runner/B-engine in the (beam, ant, chan, 2) wire
format.
"""

from __future__ import annotations

import numpy as np

__all__ = ["steering_weights"]


def steering_weights(delays_s: np.ndarray, n_chans: int,
                     sample_rate_hz: float,
                     taper: np.ndarray = None) -> np.ndarray:
    """Weights from per-beam per-antenna delays.

    ``delays_s: (n_beams, n_ants)`` geometric delay of each antenna
    toward each beam's pointing (seconds).  Channel k's centre frequency
    is ``k * sample_rate / (2*n_chans)`` (baseband).  Returns float32
    ``(n_beams, n_ants, n_chans, 2)``.
    """
    delays_s = np.asarray(delays_s, np.float64)
    if delays_s.ndim != 2:
        raise ValueError("delays_s must be (n_beams, n_ants)")
    f = np.arange(n_chans) * (sample_rate_hz / (2.0 * n_chans))
    phase = 2.0 * np.pi * delays_s[..., None] * f  # (beam, ant, k)
    w = np.exp(1j * phase)
    if taper is not None:
        w = w * np.asarray(taper)[None, :, None]
    return np.stack([w.real, w.imag], axis=-1).astype(np.float32)
