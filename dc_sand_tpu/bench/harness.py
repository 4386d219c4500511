"""Benchmark harness (C18): timing, bytes-moved accounting, JSON records.

Measurement protocol (BASELINE.md): warmup excluded, ``block_until_ready``
walls, median of >=10 runs, samples/s/chip = input real samples consumed /
wall / chips, roofline % from analytically-counted bytes, results recorded
as JSON under ``bench/results/`` keyed by config hash + commit.
"""

from __future__ import annotations

import dataclasses
import json
import os
import statistics
import subprocess
import time
from typing import Callable, Optional

import jax

__all__ = ["time_fn", "BenchResult", "HBM_BW_BY_CHIP", "detect_chip"]

# Peak HBM bandwidth per chip, GB/s (public spec sheets).
HBM_BW_BY_CHIP = {
    "v5litepod": 819.0,   # TPU v5e
    "v5e": 819.0,
    "v4": 1228.0,
    "v5p": 2765.0,
    "v6e": 1640.0,
    "cpu": float("nan"),
}


def detect_chip() -> str:
    try:
        kind = jax.devices()[0].device_kind.lower()
    except Exception:
        return "cpu"
    if "v5 lite" in kind or "v5e" in kind:
        return "v5e"
    for key in HBM_BW_BY_CHIP:
        if key in kind:
            return key
    return kind


def time_fn(fn: Callable, *args, warmup: int = 3, iters: int = 10) -> float:
    """Median wall seconds per call of a jitted fn, donated args untouched."""
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


@dataclasses.dataclass
class BenchResult:
    name: str
    metric: str
    value: float
    unit: str
    wall_s: float
    config_hash: str = ""
    bytes_moved: Optional[float] = None
    hbm_roofline_frac: Optional[float] = None
    extra: dict = dataclasses.field(default_factory=dict)

    def finish(self, chip: Optional[str] = None) -> "BenchResult":
        chip = chip or detect_chip()
        if self.bytes_moved and self.wall_s:
            bw = self.bytes_moved / self.wall_s / 1e9
            peak = HBM_BW_BY_CHIP.get(chip)
            if peak and peak == peak:  # not NaN
                self.hbm_roofline_frac = bw / peak
            self.extra["achieved_gb_s"] = bw
        self.extra["chip"] = chip
        return self

    def to_json(self) -> str:
        return json.dumps(dataclasses.asdict(self))

    def save(self, results_dir: str = "bench/results") -> str:
        os.makedirs(results_dir, exist_ok=True)
        try:
            commit = subprocess.run(
                ["git", "rev-parse", "--short", "HEAD"], capture_output=True,
                text=True, timeout=5).stdout.strip() or "nogit"
        except Exception:
            commit = "nogit"
        path = os.path.join(
            results_dir, f"{self.name}_{commit}_{int(time.time())}.json")
        with open(path, "w") as f:
            f.write(self.to_json() + "\n")
        return path
