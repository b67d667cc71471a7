"""Pallas TPU kernel for sentence assembly (region overlap-add).

The XLA lowering (synth/device.py core, assemble stage) adds each
region row into the sentence buffer at its cumsum offset with a
batch-varying dynamic slice/update pair per region — ~11 ms/batch-64.
This kernel assembles ONE sentence inside one program (vmap → batch
grid): each region add is an aligned-slice + flat-roll read of the
output window, a masked add of the (statically addressed) region row,
and a roll-back write — VMEM ops.

Bit-parity: regions are added in ascending order, each output position
receives the same f32 adds in the same order as the XLA loop (a
position is touched by at most two regions — the next region's left
margin overlap-adds into the previous pause), so sums are bit-equal.
Reference behavior: ctts.c:2951-3012 (append into the sentence buffer
at the running write position). Parity asserted by
tests/test_pallas_assemble.py (interpret mode) and the full-pipeline
device tests.
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


def _make_kernel(R, WREG, OUT_ROWS, RW):
    from jax.experimental import pallas as pl

    WROWS = WREG // LANES

    def kernel(off_ref, len_ref, in_ref, out_ref):
        out_ref[:] = jnp.zeros((OUT_ROWS, LANES), F32)
        idx = (lax.broadcasted_iota(jnp.int32, (RW, LANES), 0) * LANES
               + lax.broadcasted_iota(jnp.int32, (RW, LANES), 1))
        zpad = jnp.zeros((RW - WROWS, LANES), F32)

        def body(r, _):
            start = off_ref[0, r]          # output index of margin start
            ln = len_ref[0, r]             # live width (0 when inactive)
            qs = (start // 1024) * 8
            rem = start - (start // 1024) * 1024
            cur = flat_roll_left(
                out_ref[pl.ds(pl.multiple_of(qs, 8), RW), :], rem)
            row = in_ref[pl.ds(pl.multiple_of(r * WROWS, 8), WROWS), :]
            add = jnp.where(idx < ln, jnp.concatenate([row, zpad]),
                            F32(0.0))
            out_ref[pl.ds(pl.multiple_of(qs, 8), RW), :] = \
                flat_roll_right(cur + add, rem)
            return 0

        lax.fori_loop(0, R, body, 0)

    return kernel


@functools.partial(
    jax.jit, static_argnames=("R", "WREG", "SMAX", "MARGIN", "interpret"))
def assemble_regions(bufs_flat, offsets, live_len,
                     *, R, WREG, SMAX, MARGIN, interpret=False):
    """Overlap-add ONE sentence's region rows (vmap for a batch).

    bufs_flat [R*WREG] f32; offsets [R] output indices of each region's
    margin start (cumsum of active region len+pause); live_len [R] the
    number of live samples from the row start (MARGIN + new_len, 0 for
    inactive regions). Returns the assembled buffer [MARGIN + SMAX]
    (caller slices [MARGIN:] and applies the total-length mask)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert WREG % 1024 == 0
    RW = WREG // LANES + 8
    OUT = _roundup(MARGIN + SMAX + WREG + 1024, 1024)
    OUT_ROWS = OUT // LANES + RW

    kern = _make_kernel(R, WREG, OUT_ROWS, RW)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        kern,
        out_shape=out_struct((OUT_ROWS, LANES), F32,
                             offsets, live_len, bufs_flat),
        in_specs=[smem((1, R)), smem((1, R)),
                  vmem((R * WREG // LANES, LANES))],
        out_specs=vmem((OUT_ROWS, LANES)),
        interpret=interpret,
        compiler_params=vmem_params(interpret),
    )(offsets.reshape(1, -1).astype(jnp.int32),
      live_len.reshape(1, -1).astype(jnp.int32),
      bufs_flat.reshape(-1, LANES))
    return out.reshape(-1)[: MARGIN + SMAX]
