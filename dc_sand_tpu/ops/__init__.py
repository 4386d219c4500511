"""TPU compute kernels (Pallas + jnp) for every hot pipeline stage.

Each op has a reference ``jnp`` implementation (XLA-fused, used on CPU and
as a fallback) and, for the contract's headline kernels (PFB-FIR, X-engine
CMAC, beamformer — BASELINE.json:5 "all as JAX/XLA/Pallas kernels"), a
Pallas-TPU kernel.  ``impl="auto"`` picks Pallas on TPU, jnp elsewhere.

Numerics policy (the >50 dB bound, BASELINE.json:5, drives everything):
int8 input -> float32 FIR accumulation -> float32 FFT and phase rotation ->
int8 requantised output -> int32-exact MXU CMAC.  bfloat16 appears ONLY
where it is exact or error-bounded by construction: hi/lo-split matmuls
accumulating in fp32 (the fused F-engine's stage-2 ``bf16x3``, the
beamformer's weight split — ~108 dB bare, verified >50 dB end-to-end) and
identity-dot relayouts / CMACs of int8-range integers (exact in bf16 for
|v| <= 256; the native X/B-engine kernels gate on the fp32-accumulation
exactness bound b <= 1024).  Plain bf16 arithmetic on the signal path is
not allowed.
"""

from .pfb import pfb_fir  # noqa: F401
from .fft import channelize  # noqa: F401
from .phase import fine_delay_fringe  # noqa: F401
from .quant import requantize, dequantize  # noqa: F401
from .xcorr import (xcorr, xcorr_accumulate,  # noqa: F401
                    xcorr_accumulate_a2, xcorr_accumulate_native,
                    extract_vis, acc_shape)
from .beamform import (beamform, beamform_native,  # noqa: F401
                       incoherent_sum, incoherent_sum_native)
from .stokes import stokes  # noqa: F401
