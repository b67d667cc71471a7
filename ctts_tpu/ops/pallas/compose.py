"""Pallas TPU kernel for the sequential unit-placement (compose) scan.

The XLA lowering (synth/device.py compose_scan) pays a measured
~0.4 ms per BATCH-VARYING dynamic slice/update inside a vmapped
lax.scan (tools/microbench_width.py: batch-invariant offsets and pure
elementwise bodies run at ~0.14 ms/step; each batch-varying memory op
adds ~0.3-0.4 ms, independent of buffer width) — ~0.1 s/batch for the
two compose passes, the single largest device cost after round 2.

This kernel runs the whole unit loop INSIDE one program per sentence
(vmap over the batch adds the grid dimension), so each unit's
read-merge-write touches only VMEM:

- The region buffers stay in the existing flat [R*WREG] layout (plus a
  window of tail padding); the whole buffer is this program's VMEM
  block (~2 MB at the bench bucket).
- Mosaic requires dynamic VMEM offsets provably 1024-aligned (f32), so
  a unit's window read decomposes off-PRE = q*1024 + rem: an aligned
  8-sublane-granular `pl.ds` slice of RW rows, then a flat roll by the
  in-window remainder `rem` (pltpu.roll supports traced shifts; the
  flat roll = sublane roll + lane roll + boundary select, the primitive
  proven ≤1 LSB-exact in round 1's compose kernel).
- In rolled coordinates the placement math is the XLA step body
  verbatim (same op order ⇒ bit-identical): mixed = q16(trunc16(
  cur[:CFMAX]*fo + x[:CFMAX])), head/body select by cf, length mask by
  n_eff (0 for inactive slots).
- The boundary-DSP analysis exports are emitted ALREADY ALIGNED: the
  pre-merge pitch segment [off+cf-ana, +512) and crossfade-energy tail
  [off+cf-CFMAX, off+cf) are two more in-VMEM rolls — the XLA path
  instead exported one [2*CFMAX+512] window per step and re-sliced the
  segment with a vmapped BATCH-VARYING dynamic_slice (a gather,
  ~16 ms/batch).

Reference behavior: ctts.c:3279-3358 (crossfade overlap placement);
parity asserted against the XLA scan by tests/test_pallas_compose.py
(interpret mode) and on-chip by tools/microbench_compose.py and the
device parity suite.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ctts_tpu.ops.pallas import out_struct, vmem_params

F32 = jnp.float32
LANES = 128
SEGW = 512          # exported pitch-segment width (_PITCH_SPAN=495 pad)


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def flat_roll_left(x2d, k):
    """out_flat[i] = x_flat[(i + k) mod S] for [rows, 128] arrays; k may
    be a traced non-negative scalar < S (round-1 primitive)."""
    from jax.experimental.pallas import tpu as pltpu

    rows = x2d.shape[0]
    a = (k // LANES) % rows
    b = k % LANES
    c0 = pltpu.roll(x2d, (rows - a) % rows, 0)      # c0[r] = x[(r+a)%rows]
    c1 = pltpu.roll(x2d, (rows - a - 1) % rows, 0)
    shift_l = (LANES - b) % LANES
    l0 = pltpu.roll(c0, shift_l, 1)                 # l0[r,c] = c0[r,(c+b)%L]
    l1 = pltpu.roll(c1, shift_l, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    return jnp.where(lane + b < LANES, l0, l1)


def flat_roll_right(x2d, k):
    """out_flat[i] = x_flat[(i - k) mod S]; k traced, 0 <= k < S."""
    S = x2d.shape[0] * LANES
    return flat_roll_left(x2d, (S - k) % S)


def _make_kernel(U, UBUF, CFMAX, TOTP_ROWS, RW, PRE, export):
    PRE_ROWS = PRE // LANES
    C_ROWS = UBUF // LANES
    F_ROWS = CFMAX // LANES
    SEG_ROWS = _roundup(SEGW, 1024) // LANES        # 8
    TAIL_ROWS = _roundup(CFMAX, 1024) // LANES

    def kernel(off_ref, cf_ref, n_ref, ana_ref, contrib_ref, fo_ref,
               out_ref, seg_ref, tail_ref):
        out_ref[:] = jnp.zeros((TOTP_ROWS, LANES), F32)

        idx = (jax.lax.broadcasted_iota(jnp.int32, (RW, LANES), 0) * LANES
               + jax.lax.broadcasted_iota(jnp.int32, (RW, LANES), 1))
        ft = idx - PRE                      # coordinate within the unit

        def body(k, _):
            import jax.experimental.pallas as pl

            off = off_ref[0, k]
            cf = cf_ref[0, k]
            n = n_ref[0, k]

            base = off - PRE
            q8 = (base // 1024) * 8         # aligned row base
            rem = base - (base // 1024) * 1024

            w = out_ref[pl.ds(pl.multiple_of(q8, 8), RW), :]
            v = flat_roll_left(w, rem)      # v[i] = buf[base + i]

            if export:
                # Pre-merge pitch segment starts at off+cf-ana =
                # base + PRE + cf - ana; energy tail at off+cf-CFMAX.
                ana = ana_ref[0, k]
                sv = flat_roll_left(v, PRE + cf - ana)[:SEG_ROWS]
                seg_ref[k, :, :] = sv
                tv = flat_roll_left(v, PRE + cf - CFMAX)[:TAIL_ROWS]
                tail_ref[k, :, :] = tv

            xc = contrib_ref[k]             # [C_ROWS, 128]
            foc = fo_ref[k]                 # [F_ROWS, 128]
            # Place contribution/fade at PRE in window coordinates.
            zpre = jnp.zeros((PRE_ROWS, LANES), F32)
            x = jnp.concatenate(
                [zpre, xc, jnp.zeros((RW - PRE_ROWS - C_ROWS, LANES), F32)])
            fo = jnp.concatenate(
                [zpre, foc, jnp.zeros((RW - PRE_ROWS - F_ROWS, LANES), F32)])

            mixed = jnp.trunc(
                jnp.clip(jnp.trunc(v * fo + x), -32768.0, 32767.0))
            x = jnp.where(ft < cf, mixed, x)
            neww = jnp.where((ft >= 0) & (ft < n), x, v)

            out_ref[pl.ds(pl.multiple_of(q8, 8), RW), :] = \
                flat_roll_right(neww, rem)
            return 0

        jax.lax.fori_loop(0, U, body, 0)

    return kernel


@functools.partial(
    jax.jit,
    static_argnames=("U", "UBUF", "CFMAX", "TOT", "export", "interpret"))
def compose_units(base_off, cf_in, n_eff, ana, contrib, fo,
                  *, U, UBUF, CFMAX, TOT, export, interpret=False):
    """Sequential unit placement for ONE sentence (vmap for a batch).

    base_off/cf_in/n_eff/ana [U] int32 (n_eff = 0 for inactive slots),
    contrib [U, UBUF] f32, fo [U, CFMAX] f32. Returns (buf [TOT] f32,
    seg [U, SEGW] f32, tail [U, CFMAX] f32) — seg[k] is the pre-merge
    window starting at off+cf-ana (pitch analysis), tail[k] the
    [off+cf-CFMAX, off+cf) crossfade tail; both zeros-filled garbage
    when export=False.

    Requires UBUF % 1024 == 0 and CFMAX % 1024 == 0 (derive_dims
    buckets guarantee both) and base_off >= 2*CFMAX (MARGIN).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert UBUF % 1024 == 0 and CFMAX % 1024 == 0 and TOT % 1024 == 0
    PRE = 2 * CFMAX
    # Inactive slots (n_eff == 0) carry unplaced offsets (0 in the plan
    # arrays) — their merge is an exact no-op (length mask empty, the
    # roll-right of the unmodified roll-left restores every bit), but the
    # window read itself must stay in-bounds: park them at PRE.
    base_off = jnp.where(n_eff > 0, base_off, jnp.int32(PRE))
    RW = _roundup(PRE + UBUF + 1024, 1024) // LANES
    SEG_ROWS = _roundup(SEGW, 1024) // LANES
    TAIL_ROWS = _roundup(CFMAX, 1024) // LANES
    TOTP_ROWS = TOT // LANES + RW

    kern = _make_kernel(U, UBUF, CFMAX, TOTP_ROWS, RW, PRE, export)
    out_shapes = (
        out_struct((TOTP_ROWS, LANES), F32, base_off, contrib, fo),
        out_struct((U, SEG_ROWS, LANES), F32, base_off, contrib, fo),
        out_struct((U, TAIL_ROWS, LANES), F32, base_off, contrib, fo),
    )
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    buf, seg, tail = pl.pallas_call(
        kern,
        out_shape=out_shapes,
        in_specs=[smem((1, U)), smem((1, U)), smem((1, U)), smem((1, U)),
                  vmem((U, UBUF // LANES, LANES)),
                  vmem((U, CFMAX // LANES, LANES))],
        out_specs=(vmem((TOTP_ROWS, LANES)),
                   vmem((U, SEG_ROWS, LANES)),
                   vmem((U, TAIL_ROWS, LANES))),
        interpret=interpret,
        compiler_params=vmem_params(interpret),
    )(base_off[None, :], cf_in[None, :], n_eff[None, :], ana[None, :],
      contrib.reshape(U, UBUF // LANES, LANES),
      fo.reshape(U, CFMAX // LANES, LANES))
    buf = buf.reshape(-1)[:TOT]
    seg = seg.reshape(U, SEG_ROWS * LANES)[:, :SEGW]
    tail = tail.reshape(U, TAIL_ROWS * LANES)[:, :CFMAX]
    return buf, seg, tail
