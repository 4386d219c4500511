"""Synthetic signal sources (C1 in SURVEY.md §2.3) — deterministic, float64.

Config 1 (BASELINE.json:7) requires a synthetic CW-tone stream; noise inputs
exercise the flat-PFB-response property tests.
"""

from __future__ import annotations

import numpy as np

__all__ = ["cw_tone", "gaussian_noise", "quantize_adc"]


def cw_tone(n_samples: int, freq_hz: float, sample_rate_hz: float,
            amplitude: float = 100.0, phase: float = 0.0) -> np.ndarray:
    """Real-valued continuous-wave tone, float64, length ``n_samples``."""
    t = np.arange(n_samples, dtype=np.float64) / sample_rate_hz
    return amplitude * np.cos(2.0 * np.pi * freq_hz * t + phase)


def gaussian_noise(n_samples, sigma: float = 10.0, seed: int = 0) -> np.ndarray:
    """White Gaussian noise, float64.  ``n_samples`` may be a shape tuple."""
    rng = np.random.default_rng(seed)
    shape = n_samples if isinstance(n_samples, tuple) else (n_samples,)
    return rng.normal(0.0, sigma, size=shape)


def quantize_adc(x: np.ndarray) -> np.ndarray:
    """Digitise to int8: round-half-even, saturate to [-127, 127].

    The contract's chain runs int8 stages (BASELINE.json:5); MeerKAT's ADC is
    10-bit but the int8 path is what the contract specifies.  -128 is excluded
    to keep the code symmetric (standard correlator convention).
    """
    return np.clip(np.rint(x), -127, 127).astype(np.int8)
