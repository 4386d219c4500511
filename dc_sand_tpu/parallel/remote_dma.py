"""Pallas remote-DMA collectives (C14/C15/C7 upgrade path).

XLA's ``ppermute``/``all_to_all`` are the default transport for the halo
exchange and the corner-turn.  SURVEY.md (:127, :134, :161) names Pallas
``make_async_remote_copy`` rings as the latency upgrade path to compare
at pod bring-up — the TPU analog of the reference's hand-rolled
GPUDirect/SPEAD transport experiments, where the DMA engines are driven
directly instead of through the compiler's collective scheduler
(pattern: SNIPPETS.md [2], the right-permute kernel).

Both ops are drop-in equivalents of their XLA forms (bitwise-tested on
the CPU mesh in interpreter mode) and are benchmarked against them by
``bench/collectives.py`` per message size.

Usage (inside ``shard_map``)::

    halo = ring_permute_right(tail, TIME_AXIS, mesh.axis_names)
    out  = all_to_all_pallas(x, FX_AXIS, mesh.axis_names)
"""

from __future__ import annotations

import functools

import jax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

__all__ = ["ring_permute_right", "all_to_all_pallas"]


def _logical_id(axis_name: str, axis_names, target):
    """Flattened (row-major over ``axis_names``) device id of the shard
    whose ``axis_name`` coordinate is ``target`` and whose other
    coordinates match mine — the LOGICAL addressing mode, which the
    interpreter supports on multi-axis meshes (MESH ids do not)."""
    if axis_name not in axis_names:
        # fail loudly: the loop below would otherwise never substitute
        # ``target`` and every remote copy becomes a silent SELF-send
        # (each shard reads its own tail as the neighbour's halo)
        raise ValueError(f"axis_name {axis_name!r} missing from "
                         f"axis_names {tuple(axis_names)!r}")
    flat = None
    for a in axis_names:
        coord = target if a == axis_name else jax.lax.axis_index(a)
        size = jax.lax.axis_size(a)
        flat = coord if flat is None else flat * size + coord
    return flat


def _ring_kernel(x_ref, out_ref, send_sem, recv_sem, *, axis_name,
                 axis_names, n):
    my = jax.lax.axis_index(axis_name)
    right = jax.lax.rem(my + 1, n)
    op = pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=out_ref,
        send_sem=send_sem, recv_sem=recv_sem,
        device_id=_logical_id(axis_name, axis_names, right),
        device_id_type=pltpu.DeviceIdType.LOGICAL,
    )
    op.start()
    op.wait()


def ring_permute_right(x_local: jax.Array, axis_name: str,
                       axis_names, *, interpret: bool = False) -> jax.Array:
    """One ring step over ``axis_name``: every shard's block moves to its
    right neighbour (shard 0 receives shard n-1's — the wrap the SP
    streaming carry uses).  Equivalent to ``lax.ppermute`` with the full
    ring permutation, but issued straight to the DMA engines.
    """
    n = jax.lax.axis_size(axis_name)
    kernel = functools.partial(_ring_kernel, axis_name=axis_name,
                               axis_names=tuple(axis_names), n=n)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x_local.shape, x_local.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA] * 2,
        interpret=interpret,
    )(x_local)


def _a2a_kernel(x_ref, out_ref, local_sem, send_sems, recv_sems, *,
                axis_name, axis_names, n, rows):
    my = jax.lax.axis_index(axis_name)
    # my own block needs no wire: local async copy
    local = pltpu.make_async_copy(
        x_ref.at[pl.ds(my * rows, rows)],
        out_ref.at[pl.ds(my * rows, rows)], local_sem)
    local.start()
    ops = []
    for j in range(1, n):
        # symmetric schedule: at offset j I send my block-for-(my+j)
        # directly to device my+j, landing at ITS row-block `my`; the
        # device at my-j does the same towards me, signalling my
        # recv_sems[j-1] — every sem pairs up exactly once
        dst = jax.lax.rem(my + j, n)
        op = pltpu.make_async_remote_copy(
            src_ref=x_ref.at[pl.ds(dst * rows, rows)],
            dst_ref=out_ref.at[pl.ds(my * rows, rows)],
            send_sem=send_sems.at[j - 1], recv_sem=recv_sems.at[j - 1],
            device_id=_logical_id(axis_name, axis_names, dst),
            device_id_type=pltpu.DeviceIdType.LOGICAL,
        )
        op.start()
        ops.append(op)
    local.wait()
    for op in ops:
        op.wait()


def all_to_all_pallas(x_local: jax.Array, axis_name: str, axis_names, *,
                      interpret: bool = False) -> jax.Array:
    """Direct-send all-to-all on the leading axis, equivalent to
    ``lax.all_to_all(x, axis, split_axis=0, concat_axis=0, tiled=True)``:
    output row-block s holds what shard s sent me (= shard s's row-block
    ``my``).  n-1 point-to-point DMAs per shard, no ring rotation — the
    ICI fabric routes each message directly.
    """
    n = jax.lax.axis_size(axis_name)
    if x_local.shape[0] % n:
        raise ValueError(
            f"leading dim {x_local.shape[0]} not divisible by {n} shards")
    rows = x_local.shape[0] // n
    kernel = functools.partial(_a2a_kernel, axis_name=axis_name,
                               axis_names=tuple(axis_names), n=n,
                               rows=rows)
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct(x_local.shape, x_local.dtype),
        scratch_shapes=[
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(n - 1, 1),)),
        ],
        interpret=interpret,
    )(x_local)
