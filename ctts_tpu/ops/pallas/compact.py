"""Pallas TPU kernel: segment compaction (the data movement of
remove_silence_regions, ctts.c:1634-1690).

XLA's options for data-dependent compaction — elementwise gather, sort,
scatter — all run at a few M elements/s on TPU. The movement is really a
handful of contiguous block copies, which map directly onto DMA: grid
over regions, an in-kernel loop over (segment, chunk) issuing dynamic-
offset HBM→HBM copies over a FLAT 1-D view (2-D HBM refs would force
tile-aligned row slices). Chunk overshoot (static chunk size over a
dynamic segment length) is overwritten by the next segment's copy or
masked out downstream, so copies run in ascending destination order.

Falls back to interpret mode off-TPU (CPU tests).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

CHUNK = 2048


def _make_kernel(W: int, max_chunks: int):
    """HBM DMA offsets must be tile-aligned, so the row is staged in VMEM
    (aligned whole-row copies) and the unaligned segment moves happen as
    VMEM→VMEM dynamic slices."""

    def _kernel(starts_ref, dst_ref, len_ref, in_ref, out_ref, vin, vout,
                sem_in, sem_out):
        r = pl.program_id(0)
        nblk = starts_ref.shape[1]
        base = r * W

        load = pltpu.make_async_copy(in_ref.at[pl.ds(base, W)], vin, sem_in)
        load.start()
        load.wait()

        # Row copy preserves margin + untouched rows; segments overwrite.
        vout[:] = vin[:]

        def seg_body(s, _):
            start = starts_ref[r, s]
            d = dst_ref[r, s]
            ln = len_ref[r, s]

            def chunk_body(c, _):
                @pl.when(c * CHUNK < ln)
                def _():
                    vout[pl.ds(d + c * CHUNK, CHUNK)] = vin[
                        pl.ds(start + c * CHUNK, CHUNK)
                    ]

                return 0

            jax.lax.fori_loop(0, max_chunks, chunk_body, 0)
            return 0

        jax.lax.fori_loop(0, nblk, seg_body, 0)

        store = pltpu.make_async_copy(vout, out_ref.at[pl.ds(base, W)],
                                      sem_out)
        store.start()
        store.wait()

    return _kernel


def _compact_flat(bufs, starts, dst, seg_len, interpret):
    """Flat pallas invocation over [R', W] rows."""
    R, W = bufs.shape
    assert W % CHUNK == 0, "region width must be a CHUNK multiple"
    out = pl.pallas_call(
        _make_kernel(W, W // CHUNK),
        grid=(R,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        out_shape=jax.ShapeDtypeStruct((R * W,), bufs.dtype),
        scratch_shapes=[
            pltpu.VMEM((W,), bufs.dtype),
            pltpu.VMEM((W,), bufs.dtype),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(starts, dst, seg_len, bufs.reshape(R * W))
    return out.reshape(R, W)


@jax.custom_batching.custom_vmap
def compact_segments(bufs, starts, dst, seg_len):
    """Move segments bufs[r, starts[s]:+len] → out[r, dst[s]:+len].

    bufs [R, W] f32 (margin included); starts/dst/seg_len [R, NBLK] i32.
    Batch dims are folded into the kernel grid via the custom vmap rule
    (ANY-space pallas refs cannot be auto-batched).
    """
    interpret = jax.default_backend() != "tpu"
    return _compact_flat(bufs, starts, dst, seg_len, interpret)


@compact_segments.def_vmap
def _compact_vmap(axis_size, in_batched, bufs, starts, dst, seg_len):
    assert all(in_batched), "all compact_segments args must be batched"
    B, R, W = bufs.shape
    nblk = starts.shape[-1]
    interpret = jax.default_backend() != "tpu"
    out = _compact_flat(
        bufs.reshape(B * R, W),
        starts.reshape(B * R, nblk),
        dst.reshape(B * R, nblk),
        seg_len.reshape(B * R, nblk),
        interpret,
    ).reshape(B, R, W)
    return out, True
