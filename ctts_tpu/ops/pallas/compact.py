"""Pallas TPU kernel for silence-removal segment compaction.

The XLA lowering (ops/device_ops.py move_segments) walks the moving
segments with a while_loop of batch-varying dynamic slice/update ops —
~0.4 ms per op under vmap × the batch-max trip count (~0.04 s/batch).
This kernel compacts ALL regions of one sentence inside one program
(vmap → batch grid): each segment move is an aligned-slice + flat-roll
read, a masked merge, and a roll-back write — VMEM ops.

Sequencing argument (bit-parity with move_segments): destinations are
ascending and dst[s] ≤ starts[s], so everything a later segment reads
from the in-place buffer is still original content — prior writes only
touch positions below the next source (dst[s]+len[s] ≤ starts[s+1]).
move_segments reads from an immutable copy; the in-place reads see the
same bits. Window reads may spill past a region row into the next row;
the merge mask keeps only [0, len) from the source and the write-back
returns spilled positions unchanged (roll-right of the unmodified
roll-left restores every bit).

Reference behavior: ctts.c:1634-1690 (remove_silence_regions' memmove
loop); parity asserted by tests/test_pallas_compact.py (interpret mode)
and the full-pipeline pallas-vs-xla test.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ctts_tpu.ops.pallas import out_struct, vmem_params
from ctts_tpu.ops.pallas.compose import flat_roll_left, flat_roll_right

F32 = jnp.float32
LANES = 128


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _make_kernel(R, WREG, NBLK, TOT_ROWS, RWW):
    from jax.experimental import pallas as pl

    def kernel(starts_ref, dst_ref, len_ref, first_ref, last_ref,
               in_ref, out_ref):
        nin = TOT_ROWS - RWW
        out_ref[pl.ds(0, nin), :] = in_ref[:]
        out_ref[pl.ds(nin, RWW), :] = jnp.zeros((RWW, LANES), F32)

        idx = (lax.broadcasted_iota(jnp.int32, (RWW, LANES), 0) * LANES
               + lax.broadcasted_iota(jnp.int32, (RWW, LANES), 1))

        def seg_body(r):
            def body(s, _):
                t = r * NBLK + s
                src_off = r * WREG + starts_ref[0, t]
                dst_off = r * WREG + dst_ref[0, t]
                ln = len_ref[0, t]

                qs = (src_off // 1024) * 8
                sv = flat_roll_left(
                    out_ref[pl.ds(pl.multiple_of(qs, 8), RWW), :],
                    src_off - (src_off // 1024) * 1024)
                qd = (dst_off // 1024) * 8
                remd = dst_off - (dst_off // 1024) * 1024
                cur = flat_roll_left(
                    out_ref[pl.ds(pl.multiple_of(qd, 8), RWW), :], remd)
                merged = jnp.where(idx < ln, sv, cur)
                out_ref[pl.ds(pl.multiple_of(qd, 8), RWW), :] = \
                    flat_roll_right(merged, remd)
                return 0

            lax.fori_loop(first_ref[0, r], last_ref[0, r] + 1, body, 0)

        def region_body(r, _):
            seg_body(r)
            return 0

        lax.fori_loop(0, R, region_body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("R", "WREG", "NBLK", "MW", "interpret"))
def compact_units(bufs_flat, starts, dst, seg_len,
                  *, R, WREG, NBLK, MW, interpret=False):
    """Compact ONE sentence's regions in-place (vmap for a batch).

    bufs_flat [R*WREG] f32; starts/dst/seg_len [R, NBLK] int32 in
    region-local coordinates already offset by MARGIN (as produced by
    the seg_table pass). MW: the widest possible segment (CONTW).
    Returns the compacted [R*WREG] buffer; positions outside moved
    segments keep their original content.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    TOT = R * WREG
    assert TOT % 1024 == 0 and WREG % 1024 == 0
    RWW = _roundup(MW + 1024, 1024) // LANES + 8
    TOT_ROWS = TOT // LANES + RWW

    moving = (seg_len > 0) & (starts != dst)
    s_idx = jnp.arange(NBLK)[None, :]
    first = jnp.min(jnp.where(moving, s_idx, NBLK), axis=1)
    last = jnp.max(jnp.where(moving, s_idx, -1), axis=1)

    kern = _make_kernel(R, WREG, NBLK, TOT_ROWS, RWW)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=out_struct((TOT_ROWS, LANES), F32,
                             starts, dst, seg_len, bufs_flat),
        in_specs=[smem((1, R * NBLK)), smem((1, R * NBLK)),
                  smem((1, R * NBLK)), smem((1, R)), smem((1, R)),
                  vmem((TOT // LANES, LANES))],
        out_specs=vmem((TOT_ROWS, LANES)),
        interpret=interpret,
        compiler_params=vmem_params(interpret),
    )(starts.reshape(1, -1).astype(jnp.int32),
      dst.reshape(1, -1).astype(jnp.int32),
      seg_len.reshape(1, -1).astype(jnp.int32),
      first[None, :].astype(jnp.int32), last[None, :].astype(jnp.int32),
      bufs_flat.reshape(-1, LANES))
    return out.reshape(-1)[:TOT]
