"""NumPy float64 golden models (no JAX imports allowed here).

These are the accuracy oracle for the whole framework: every TPU kernel and
the end-to-end chain must match these within >50 dB SNR (BASELINE.json:5).
Mirrors the reference's methodology of a NumPy golden model per CUDA kernel
(SURVEY.md §4.1).
"""

from .sources import (  # noqa: F401
    cw_tone, gaussian_noise, gaussian_noise_int8, quantize_adc)
from .chain import (  # noqa: F401
    apply_coarse_delay,
    pfb_fir,
    channelize,
    fine_delay_fringe,
    requantize,
    corner_turn,
    xcorr,
    beamform,
    incoherent_sum,
    f_engine,
    baseline_pairs,
    stokes,
)
