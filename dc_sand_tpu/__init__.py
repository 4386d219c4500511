"""dc_sand_tpu — a TPU-native radio-astronomy DSP framework.

A brand-new, TPU-first implementation of the capabilities demonstrated by the
reference ``ska-sa/dc_sand`` (SARAO/MeerKAT GPU correlator/beamformer sandbox):
the F/X radio-telescope signal chain

    int8 antenna streams
      -> coarse delay
      -> 16-tap windowed polyphase filterbank (FIR + real FFT)
      -> fine delay / fringe rotation
      -> per-channel gain + 8-bit requantisation
      -> corner-turn (antenna-major -> channel-major all-to-all)
      -> X-engine cross-correlation (visibilities) and/or
         B-engine coherent/incoherent beamforming.

The capability contract is ``/root/repo/BASELINE.json`` (the reference mount was
empty; see SURVEY.md section 0).  Key contract lines:

* BASELINE.json:5  — the full chain, JAX/XLA/Pallas kernels, int8 stages,
  >50 dB SNR vs float64 golden models, sharded over a TPU pod slice with
  halo collectives for the FIR overlap and all-to-all for the corner-turn.
* BASELINE.json:7-11 — the five graded evaluation configs (see
  :mod:`dc_sand_tpu.config`).

Layout
------
``golden/``    NumPy float64 golden models (no JAX) — the accuracy oracle.
``ops/``       TPU kernels: Pallas + jnp (PFB-FIR, FFT, phase, requant,
               X-engine CMAC, beamforming).
``parallel/``  Mesh construction, corner-turn all-to-all, halo exchange.
``models/``    Engine compositions: FEngine, XEngine, BEngine, FX pipelines.
``runtime/``   Chunked streaming runner, delay/weight state, checkpointing.
``bench/``     Benchmark harness (throughput, roofline accounting).
``utils/``     SNR metric, misc helpers.
"""

__version__ = "0.1.0"
