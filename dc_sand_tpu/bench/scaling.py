"""Scaling-efficiency harness (C18, BASELINE.json:5's "measured at
1 chip, 1 host, N hosts").

Runs the sharded FX streaming step over meshes of 1..N devices with the
per-device workload held constant (weak scaling: each device always
channelizes the same number of antennas and correlates the same channel
block), and reports throughput and efficiency(N) = T(N) / (N * T(1)).

On a real pod slice this is the contract's >80% number; on this dev box
(one chip) it runs on the virtual CPU mesh — the collectives are real
XLA all-to-alls, the wall-clock is host-simulated, so treat CPU numbers
as harness validation, not hardware results (the JSON records the
platform).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from dc_sand_tpu.bench.harness import BenchResult
from dc_sand_tpu.config import get_config
from dc_sand_tpu.golden.chain import baseline_pairs
from dc_sand_tpu.models.pipeline import make_step, history_len
from dc_sand_tpu.parallel import build_mesh
from dc_sand_tpu.windows import pfb_window

__all__ = ["bench_scaling"]


def _step_wall(cfg, mesh, window, iters: int = 5) -> float:
    a, p, k, b = cfg.n_ants, cfg.n_pols, cfg.n_chans, cfg.spectra_per_chunk
    step = make_step(cfg, window, max_delay=0, mesh=mesh, impl="jnp",
                     donate=False, coarse_on_host=True)
    n_bl = len(baseline_pairs(a))
    rng = np.random.default_rng(0)
    dev = mesh.devices.flat[0]
    with jax.default_device(dev):
        args = (
            jnp.zeros((a, p, history_len(cfg, 0)), jnp.int8),
            jnp.zeros((n_bl, p, p, k, 2), jnp.int32),
            jnp.asarray(rng.integers(-100, 100, (a, p, cfg.chunk_samples),
                                     dtype=np.int8)),
            jnp.zeros((a, p), jnp.int32),
            jnp.zeros((a, p, b), jnp.float32),
            jnp.zeros((a, p, b), jnp.float32),
            jnp.asarray(np.stack([np.full((k,), 0.05, np.float32),
                                  np.zeros((k,), np.float32)], -1)),
            jnp.zeros((1, a, k, 2), jnp.float32),
            jnp.asarray(False),
        )
    jax.block_until_ready(step(*args))  # compile + warm
    t0 = time.perf_counter()
    for _ in range(iters):
        jax.block_until_ready(step(*args))
    return (time.perf_counter() - t0) / iters


def bench_scaling(max_devices: int = 8, ants_per_dev: int = 8,
                  chans_per_dev: int = 64, spectra: int = 16,
                  iters: int = 5) -> list:
    """Weak-scaling sweep over 1..max_devices (powers of two)."""
    results = []
    base_rate = None
    d = 1
    while d <= max_devices:
        try:
            mesh = build_mesh(n_devices=d)
        except Exception:
            break
        cfg = get_config("fx64").replace(
            n_ants=ants_per_dev * d, n_chans=chans_per_dev * d,
            spectra_per_chunk=spectra, n_spectra_per_acc=spectra)
        window = pfb_window(cfg.n_taps, cfg.fft_size)
        wall = _step_wall(cfg, mesh, window, iters)
        samples = cfg.n_ants * cfg.n_pols * cfg.chunk_samples
        rate = samples / wall
        per_dev = rate / d
        if base_rate is None:
            base_rate = per_dev
        eff = per_dev / base_rate
        results.append(BenchResult(
            name=f"scaling_fx_{d}dev",
            metric="weak-scaling samples/s", value=rate, unit="samp/s",
            wall_s=wall,
            extra={"devices": d, "per_device_rate": per_dev,
                   "efficiency_vs_1dev": eff,
                   "platform": mesh.devices.flat[0].platform},
        ).finish())
        d *= 2
    return results
