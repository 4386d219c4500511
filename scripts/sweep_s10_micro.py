#!/usr/bin/env /opt/venv/bin/python
"""Session-10 micro-probes: split the fused kernel's 1.7 ms
all-compute-ablated floor into its in-DMA and out-writeback sides with
two single-purpose kernels over the SAME grid/blocks as the 4k wire
contract shape (grid (16, 8), in blocks (64, 8192) int8 manual-DMA,
out blocks (1, 2m2, tb, k1n) int8 Mosaic-pipelined).
"""

import functools
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                ".."))

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

S, NB, TB, M = 16, 8, 64, 8192
M2, K1N = 64, 64
NF = NB * TB + 15


def _read_kernel(x_hbm, out_ref, new_buf, sems):
    s = pl.program_id(0)
    b = pl.program_id(1)

    def dma(i, slot):
        return pltpu.make_async_copy(
            x_hbm.at[s, pl.ds(i * TB, TB)], new_buf.at[slot],
            sems.at[slot])

    @pl.when(b == 0)
    def _():
        dma(0, 0).start()

    @pl.when(b + 1 < NB)
    def _():
        dma(b + 1, (b + 1) % 2).start()

    slot = b % 2
    dma(b, slot).wait()
    # touch one row so the DMA is live; out is a tiny (8, 128) block
    out_ref[...] = new_buf[slot][0:8, 0:128]


def _write_kernel(out_ref):
    v = jnp.full((TB, K1N), pl.program_id(1), jnp.int8)
    for k2 in range(2 * M2):
        out_ref[0, k2] = v


def main():
    from dc_sand_tpu.bench.harness import time_throughput

    x = jax.block_until_ready(jax.jit(
        lambda: (jax.random.normal(jax.random.key(0), (S, NF, M)) * 30)
        .astype(jnp.int8))())

    read = pl.pallas_call(
        _read_kernel,
        grid=(S, NB),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec((8, 128), lambda s_, b_: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int8),
        scratch_shapes=[pltpu.VMEM((2, TB, M), jnp.int8),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    wall = time_throughput(lambda xx: read(xx), (x,), iters=256)
    gb = S * NB * TB * M / 1e9
    print(f"read-only : {wall*1e3:7.3f} ms  {gb/wall:6.1f} GB/s in",
          flush=True)

    write = pl.pallas_call(
        _write_kernel,
        grid=(S, NB),
        out_specs=pl.BlockSpec((1, 2 * M2, TB, K1N),
                               lambda s_, b_: (s_, 0, b_, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S, 2 * M2, NB * TB, K1N),
                                       jnp.int8),
    )
    seed = jnp.zeros((), jnp.int8)
    wall = time_throughput(lambda _s: write(), (seed,), iters=256)
    gb = S * 2 * M2 * NB * TB * K1N / 1e9
    print(f"write-only: {wall*1e3:7.3f} ms  {gb/wall:6.1f} GB/s out",
          flush=True)


if __name__ == "__main__":
    main()
