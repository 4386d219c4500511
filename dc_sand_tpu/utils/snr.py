"""Signal-to-noise verification metric (C16 in SURVEY.md §2.3).

The contract's accuracy bound is ">50 dB SNR vs float64 golden model"
(BASELINE.json:5).  SNR here is energy of the golden signal over energy of
the (golden - test) residual, in dB — the standard correlator-verification
metric used by the reference's test philosophy (SURVEY.md §4.1).
"""

from __future__ import annotations

import numpy as np

__all__ = ["snr_db"]


def snr_db(golden, test) -> float:
    """10 log10( sum|golden|^2 / sum|golden - test|^2 ), in float64.

    Returns ``inf`` for an exact match and ``-inf`` for a zero golden
    signal with nonzero residual.
    """
    g = np.asarray(golden, dtype=np.complex128)
    t = np.asarray(test, dtype=np.complex128)
    if g.shape != t.shape:
        raise ValueError(f"shape mismatch: golden {g.shape} vs test {t.shape}")
    sig = float(np.sum(np.abs(g) ** 2))
    err = float(np.sum(np.abs(g - t) ** 2))
    if err == 0.0:
        return float("inf")
    if sig == 0.0:
        return float("-inf")
    return 10.0 * np.log10(sig / err)
