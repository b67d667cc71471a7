"""Pallas TPU kernel for the pitch-search correlations.

The reference's estimate_pitch (ctts.c:1899-1943) needs, per analysis
segment, the normalized cross-correlation at every lag 0..275 plus the
candidate energies. The XLA lowering used one grouped 10-channel 1-D
conv — which carries a ~28 ms dispatch-latency floor on this backend
regardless of batch width or channel count (measured:
tools/microbench_pitch.py), and the pipeline pays it once for the unit
heads and once per refine trip.

This kernel computes the same exact integers with VPU accumulation: the
sliding windows never materialize in HBM (the 64x Hankel blow-up of an
im2col/matmul formulation stays in VMEM as two rolled registers), and
because f32 accumulation of the hi/lo component products is exact at
any order (each partial sum is an integer ≤ 220·2^14 < 2^24), the six
split-squared conv channels collapse to three direct products.

Per grid program (NB=256 rows): load seg [NB, 640] once, split into
sh/sl halves, then 220 fused multiply-accumulate steps over [NB, 384]
lanes, advancing the windows with pltpu.roll(shift -1) — static shifts,
no dynamic VMEM offsets (Mosaic requires 1024-alignment for those).

Outputs are the six exact component sums; the caller combines them with
ops.exact.combine_exact into bit-identical corr_all / e2_all to the
grouped-conv path (asserted by tests/test_pallas_pitch.py and
tools/microbench_pitch.py on real TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ctts_tpu.ops.pallas import out_struct, vmem_params

F32 = jnp.float32

NLAG_PAD = 384   # lags 0..275, padded to 3*128 lanes
KW = 256         # analysis kernel width (220, padded to 2*128)
SEGW = 640       # segment width: 384 + 220 rounded to 5*128
NB = 256         # rows per grid program


def _pitch_kernel(seg_ref, bh_ref, bl_ref, m_ref,
                  chh_ref, cmid_ref, cll_ref,
                  ehh_ref, ehl_ref, ell_ref):
    from jax.experimental.pallas import tpu as pltpu

    seg = seg_ref[:]
    sh = jnp.round(seg * F32(1.0 / 256.0))
    sl = seg - F32(256.0) * sh

    def body(i, carry):
        (sh_r, sl_r, bh_r, bl_r, m_r,
         chh, cmid, cll, ehh, ehl, ell) = carry
        s_h = sh_r[:, :NLAG_PAD]
        s_l = sl_r[:, :NLAG_PAD]
        b_h = bh_r[:, 0:1]
        b_l = bl_r[:, 0:1]
        m0 = m_r[:, 0:1]
        chh = chh + b_h * s_h
        cmid = cmid + b_h * s_l + b_l * s_h
        cll = cll + b_l * s_l
        ehh = ehh + m0 * (s_h * s_h)
        ehl = ehl + m0 * (s_h * s_l)
        ell = ell + m0 * (s_l * s_l)
        # Left-rotate by one (pltpu.roll takes non-negative shifts only;
        # rotating by size-1 toward higher indices is the same thing).
        return (pltpu.roll(sh_r, SEGW - 1, 1),
                pltpu.roll(sl_r, SEGW - 1, 1),
                pltpu.roll(bh_r, KW - 1, 1),
                pltpu.roll(bl_r, KW - 1, 1),
                pltpu.roll(m_r, KW - 1, 1),
                chh, cmid, cll, ehh, ehl, ell)

    z = jnp.zeros((seg.shape[0], NLAG_PAD), F32)
    out = jax.lax.fori_loop(
        0, 220, body,
        (sh, sl, bh_ref[:], bl_ref[:], m_ref[:], z, z, z, z, z, z),
    )
    chh_ref[:], cmid_ref[:], cll_ref[:] = out[5], out[6], out[7]
    ehh_ref[:], ehl_ref[:], ell_ref[:] = out[8], out[9], out[10]


@functools.partial(jax.jit, static_argnames=("interpret",))
def pitch_corr_components(seg, bh, bl, mask, interpret=False):
    """Exact pitch-correlation component sums.

    seg [n, SEGW] f32 (int16-valued, zero-padded); bh/bl [n, KW] split
    halves of the masked analysis base; mask [n, KW] 0/1. Returns
    (chh, cmid, cll, ehh, ehl, ell), each [n, NLAG_PAD]:
      corr_all = 65536*chh + 256*cmid + cll   (exact integer)
      e2_all   = 65536*ehh + 512*ehl  + ell   (exact integer)
    combined via ops.exact.combine_exact by the caller.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n = seg.shape[0]
    # Adaptive row block: the in-core call sites have n = U (32-64)
    # rows per vmapped sentence — padding to a fixed 256 would waste 8x
    # kernel work. f32 min sublane tile is 8.
    nb = min(NB, -(-n // 8) * 8)
    n_pad = -(-n // nb) * nb
    if n_pad != n:
        seg = jnp.concatenate(
            [seg, jnp.zeros((n_pad - n, SEGW), F32)])
        bh = jnp.concatenate([bh, jnp.zeros((n_pad - n, KW), F32)])
        bl = jnp.concatenate([bl, jnp.zeros((n_pad - n, KW), F32)])
        mask = jnp.concatenate([mask, jnp.zeros((n_pad - n, KW), F32)])

    grid = (n_pad // nb,)
    bspec_in = [
        pl.BlockSpec((nb, SEGW), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, KW), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, KW), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((nb, KW), lambda i: (i, 0),
                     memory_space=pltpu.VMEM),
    ]
    ospec = pl.BlockSpec((nb, NLAG_PAD), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    oshape = out_struct((n_pad, NLAG_PAD), F32, seg, bh, bl, mask)
    outs = pl.pallas_call(
        _pitch_kernel,
        grid=grid,
        out_shape=(oshape,) * 6,
        in_specs=bspec_in,
        out_specs=(ospec,) * 6,
        interpret=interpret,
        compiler_params=vmem_params(interpret),
    )(seg, bh, bl, mask)
    return tuple(o[:n] for o in outs)
