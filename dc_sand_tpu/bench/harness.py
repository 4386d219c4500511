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

__all__ = ["time_fn", "time_throughput", "BenchResult", "HBM_BW_BY_CHIP",
           "detect_chip"]

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
    """Median wall seconds per call of a jitted fn, donated args untouched.

    WARNING: on the axon-tunnelled backend repeated identical dispatches
    are served from a result cache, so this measures only dispatch
    latency there.  Use :func:`time_throughput` for real kernel timing.
    """
    for _ in range(warmup):
        jax.block_until_ready(fn(*args))
    times = []
    for _ in range(iters):
        t0 = time.perf_counter()
        jax.block_until_ready(fn(*args))
        times.append(time.perf_counter() - t0)
    return statistics.median(times)


def time_throughput(fn: Callable, args: tuple, iters: int = 256,
                    perturb: int = 0) -> float:
    """Wall seconds **per iteration** of ``fn(*args)``, measured robustly.

    Verified pathologies of this dev box's axon-tunnelled backend:

    * dispatching the same executable on the same arguments returns a
      cached result (a 4096^3 bf16 matmul "ran" at 2900 TFLOPS);
    * the FIRST real execution of a new executable takes minutes
      (server-side warm), subsequent real dispatches cost ~30 ms fixed.

    Protocol: run ``iters`` iterations inside ONE compiled ``lax.scan``
    program.  The perturbed input rides the scan carry and gets a
    1-element data-dependent in-place bump each iteration (defeats
    loop-invariant hoisting and result caching, costs ~nothing); outputs
    pass through an optimization barrier and contribute one element to a
    checksum (keeps all compute live without re-reading whole outputs).
    Warm once on one buffer, then time a single dispatch on a different
    buffer with a host fetch to force completion; pick ``iters`` so the
    per-dispatch ~30 ms overhead is amortised.
    """
    import jax.numpy as jnp
    import numpy as np

    # every arg rides as a real program parameter — a closed-over device
    # array would be baked into the program as a constant (harmless for
    # a gains table, fatal for a 1 GB accumulator, and it bloats the
    # server-side compile either way)
    others = [a for i, a in enumerate(args) if i != perturb]

    def loop(x0, *rest):
        def body(carry, _):
            x, c = carry
            call_args = list(rest)
            call_args.insert(perturb, x)
            out = fn(*call_args)
            leaves = [jax.lax.optimization_barrier(leaf)
                      for leaf in jax.tree_util.tree_leaves(out)]
            s = sum(leaf.ravel()[0].astype(jnp.float32)
                    for leaf in leaves)
            bump = (c.astype(jnp.int32) % 2).astype(x.dtype)
            x = x.at[(0,) * x.ndim].add(bump)
            return (x, c + s), ()

        (_, total), _ = jax.lax.scan(body, (x0, jnp.float32(0.0)), None,
                                     length=iters)
        return total

    x0 = args[perturb]
    compiled = jax.jit(loop).lower(x0, *others).compile()
    np.asarray(compiled(x0, *others))              # server warm (slow)
    x1 = jax.block_until_ready(jax.jit(lambda v: v + 1)(x0))
    t0 = time.perf_counter()
    val = np.asarray(compiled(x1, *others))        # the timed dispatch
    wall = time.perf_counter() - t0
    assert val == val, "NaN checksum"
    return wall / iters


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
