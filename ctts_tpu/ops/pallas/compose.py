"""Pallas TPU kernels: region composition (crossfade overlap placement).

STATUS: correct (≤1 LSB vs oracle on chip) but measured SLOWER than the
vmapped XLA scan (29× vs 37× realtime at batch 64): the TPU grid executes
sequentially, so the kernel serializes over batch×region programs, while
the XLA scan vectorizes the whole batch per step. Roll shifts are scalar
per program, so batch elements with different offsets cannot share one
vector op. Kept as an alternative path (dims.pallas_compose) and as the
reference for roll-based unaligned placement; a winning kernel needs a
batch-in-sublane layout with per-row shift emulation (round 2).

Mechanism: Mosaic cannot DMA at unaligned dynamic offsets, but *dynamic
rolls* are supported — placement runs in VMEM with flat rolls (sublane +
lane roll + lane-boundary select) and masked merges.

Split of responsibilities (see synth/device.py):
- XLA precomputes per-unit *contributions*: RMS-gained, (pass B:
  pitch/energy head-modified), DC-removed, fade-in applied, and the
  crossfade head pre-multiplied by its fade-in curve. It also provides
  the fade-out gain curves for the existing-buffer side of each mix.
- Kernel `compose_regions`: for each (batch, region), loop that region's
  units; merge each contribution at its offset:
      mix region  [off, off+cf):  vout = trunc(clip(vout*fo + contrib))
      rest region [off+cf, off+n): vout = contrib
  In pass A it first exports the WIN-wide analysis window ending at the
  current buffer end (off+cf) for the XLA boundary-DSP stage.

All rows (bank, contributions, fades, outputs) are shaped [..., S//128,
128] so whole-row DMAs are tile-aligned.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F32 = jnp.float32
LANES = 128


def flat_roll_left(x2d: jnp.ndarray, k) -> jnp.ndarray:
    """out_flat[i] = x_flat[(i + k) mod S] for [S//128, 128] arrays;
    k may be a traced non-negative scalar < S. Shifts are kept positive
    (dynamic negative rolls are not safe on all Mosaic versions)."""
    rows = x2d.shape[0]
    a = (k // LANES) % rows
    b = k % LANES
    c0 = pltpu.roll(x2d, (rows - a) % rows, 0)        # c0[r] = x[(r+a)%rows]
    c1 = pltpu.roll(x2d, (rows - a - 1) % rows, 0)
    shift_l = (LANES - b) % LANES
    l0 = pltpu.roll(c0, shift_l, 1)                   # l0[r,c] = c0[r,(c+b)%L]
    l1 = pltpu.roll(c1, shift_l, 1)
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    return jnp.where(lane + b < LANES, l0, l1)


def flat_roll_right(x2d: jnp.ndarray, k) -> jnp.ndarray:
    """out_flat[i] = x_flat[(i - k) mod S]; k traced, 0 ≤ k < S."""
    S = x2d.shape[0] * LANES
    return flat_roll_left(x2d, (S - k) % S)


def _flat_idx(shape) -> jnp.ndarray:
    row = jax.lax.broadcasted_iota(jnp.int32, shape, 0)
    lane = jax.lax.broadcasted_iota(jnp.int32, shape, 1)
    return row * LANES + lane


def _make_compose_kernel(U: int, WREG: int, UBUF: int, CFMAX: int, WIN: int,
                         export_windows: bool):
    wrows = WREG // LANES

    def kernel(ustart_ref, ucount_ref, off_ref, cf_ref, n_ref,
               contrib_ref, fo_ref, out_ref, win_ref,
               vout, vc, vfo, vwin, sem):
        b = pl.program_id(0)
        r = pl.program_id(1)

        vout[:] = jnp.zeros((wrows, LANES), F32)
        idx = _flat_idx((wrows, LANES))

        start = ustart_ref[b, r]
        count = ucount_ref[b, r]

        def unit_body(j, _):
            u = start + j
            off = off_ref[b, u]
            cf = cf_ref[b, u]
            n = n_ref[b, u]

            # Load this unit's contribution + fade-out curve.
            ld = pltpu.make_async_copy(contrib_ref.at[b, u], vc, sem)
            ld.start()
            ld.wait()
            ld2 = pltpu.make_async_copy(fo_ref.at[b, u], vfo, sem)
            ld2.start()
            ld2.wait()

            if export_windows:
                # Analysis window: WIN samples ending at off+cf (current
                # buffer end) — exported BEFORE this unit merges.
                wstart = off + cf - WIN  # ≥ 0: MARGIN = WIN + CFMAX
                vwin[:] = flat_roll_left(vout[:], wstart)[: WIN // LANES]
                wst = pltpu.make_async_copy(vwin, win_ref.at[b, u], sem)
                wst.start()
                wst.wait()

            # Place contribution (padded to WREG) at off.
            cpad = jnp.concatenate(
                [vc[:].reshape(UBUF // LANES, LANES),
                 jnp.zeros((wrows - UBUF // LANES, LANES), F32)], axis=0
            )
            cplaced = flat_roll_right(cpad, off)
            fpad = jnp.concatenate(
                [vfo[:].reshape(CFMAX // LANES, LANES),
                 jnp.zeros((wrows - CFMAX // LANES, LANES), F32)], axis=0
            )
            fplaced = flat_roll_right(fpad, off)

            in_mix = (idx >= off) & (idx < off + cf)
            in_rest = (idx >= off + cf) & (idx < off + n)

            mixed = jnp.trunc(
                jnp.clip(vout[:] * fplaced + cplaced, -32768.0, 32767.0)
            )
            new = jnp.where(in_mix, mixed, jnp.where(in_rest, cplaced, vout[:]))
            vout[:] = new
            return 0

        jax.lax.fori_loop(0, count, unit_body, 0)

        st = pltpu.make_async_copy(vout, out_ref.at[b, r], sem)
        st.start()
        st.wait()

    return kernel


@functools.lru_cache(maxsize=64)
def make_compose_single(U: int, WREG: int, UBUF: int, CFMAX: int, WIN: int,
                        export_windows: bool, interpret: bool):
    """Single-sentence compose with a custom vmap rule that folds the
    batch axis into the kernel grid (ANY-space refs can't auto-batch)."""

    def _call(ustart, ucount, off, cf, n, contrib, fo):
        return compose_regions(
            ustart, ucount, off, cf, n, contrib, fo,
            U=U, WREG=WREG, UBUF=UBUF, CFMAX=CFMAX, WIN=WIN,
            export_windows=export_windows, interpret=interpret,
        )

    @jax.custom_batching.custom_vmap
    def single(ustart, ucount, off, cf, n, contrib, fo):
        out, win = _call(ustart[None], ucount[None], off[None], cf[None],
                         n[None], contrib[None], fo[None])
        return out[0], win[0]

    @single.def_vmap
    def _rule(axis_size, in_batched, ustart, ucount, off, cf, n, contrib, fo):
        assert all(in_batched)
        out, win = _call(ustart, ucount, off, cf, n, contrib, fo)
        return (out, win), (True, True)

    return single


@functools.partial(
    jax.jit, static_argnames=("U", "WREG", "UBUF", "CFMAX", "WIN",
                              "export_windows", "interpret")
)
def compose_regions(
    ustart, ucount,          # [B, R] i32 unit-slot ranges per region
    off, cf, n,              # [B, U] i32 placement tables
    contrib,                 # [B, U, UBUF] f32 prepared contributions
    fo,                      # [B, U, CFMAX] f32 fade-out gain curves
    *, U: int, WREG: int, UBUF: int, CFMAX: int, WIN: int,
    export_windows: bool, interpret: bool,
):
    """Compose region buffers; returns (bufs [B,R,WREG], windows [B,U,WIN])
    (windows are zeros when export_windows=False)."""
    B, R = ustart.shape
    wrows = WREG // LANES

    kernel = _make_compose_kernel(U, WREG, UBUF, CFMAX, WIN, export_windows)

    out, win = pl.pallas_call(
        kernel,
        grid=(B, R),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=(
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((B, R, wrows, LANES), F32),
            jax.ShapeDtypeStruct((B, U, WIN // LANES, LANES), F32),
        ),
        scratch_shapes=[
            pltpu.VMEM((wrows, LANES), F32),
            pltpu.VMEM((UBUF // LANES, LANES), F32),
            pltpu.VMEM((CFMAX // LANES, LANES), F32),
            pltpu.VMEM((WIN // LANES, LANES), F32),
            pltpu.SemaphoreType.DMA,
        ],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=interpret,
    )(
        ustart, ucount, off, cf, n,
        contrib.reshape(B, U, UBUF // LANES, LANES),
        fo.reshape(B, U, CFMAX // LANES, LANES),
    )
    return (out.reshape(B, R, WREG), win.reshape(B, U, WIN))
