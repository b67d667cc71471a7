"""Microbenchmark: pitch-search correlation, grouped-conv (current) vs
Hankel-tile MXU matmul (candidate). Checks bit-equality of the resulting
(corr_all, e2_all) exact integers, then times both at the bench batch
size (B*U = 2048 lanes).

Usage: python tools/microbench_pitch.py [--lanes 2048] [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32

PITCH_MIN_LAG = 55
PITCH_MAX_LAG = 275
PITCH_ANALYSIS = 220
SPAN = PITCH_MAX_LAG + PITCH_ANALYSIS  # 495
NLAG = PITCH_MAX_LAG + 1               # 276 (lags 0..275 computed)


def split_hi_lo(x):
    xh = jnp.round(x * F32(1.0 / 256.0))
    return xh, x - F32(256.0) * xh


def combine_exact(hh, mid, ll, mid_scale):
    a = F32(65536.0) * hh
    b = F32(mid_scale) * mid
    s = a + b
    bv = s - a
    av = s - bv
    e = (a - av) + (b - bv)
    return s + (e + ll)


def conv_version(seg, alen):
    """Current production formulation (ops/device_ops.py:_pitch_from_segment
    core): one grouped 10-channel conv. seg [n, SPAN], alen [n]."""
    i = jnp.arange(PITCH_ANALYSIS)
    mask_i = (i[None, :] < alen[:, None]).astype(F32)
    base_m = seg[:, :PITCH_ANALYSIS] * mask_i

    sh, sl = split_hi_lo(seg)
    bh, bl = split_hi_lo(base_m)
    hh_h, hh_l = split_hi_lo(sh * sh)
    hl_h, hl_l = split_hi_lo(sh * sl)
    ll_h, ll_l = split_hi_lo(sl * sl)
    inp = jnp.stack([sh, sh, sl, sl,
                     hh_h, hh_l, hl_h, hl_l, ll_h, ll_l], axis=1)  # [n,10,S]
    ker = jnp.stack([bh, bl, bh, bl] + [mask_i] * 6, axis=1)  # [n,10,220]

    def one(inp_n, ker_n):
        ch = lax.conv_general_dilated(
            inp_n[None], ker_n[:, None, :], window_strides=(1,),
            padding="VALID", feature_group_count=10,
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[0]
        return ch

    ch = jax.vmap(one)(inp, ker)                     # [n, 10, 276]
    corr_all = combine_exact(ch[:, 0], ch[:, 1] + ch[:, 2], ch[:, 3], 256.0)
    e_hh = F32(256.0) * ch[:, 4] + ch[:, 5]
    e_hl = F32(256.0) * ch[:, 6] + ch[:, 7]
    e_ll = F32(256.0) * ch[:, 8] + ch[:, 9]
    e2_all = combine_exact(e_hh, e_hl, e_ll, 512.0)
    return corr_all, e2_all


BLK = 128
M_T = 4          # tile rows: 128*3 + 127 + 127 covers SPAN+NLAG reads
LPAD = BLK * M_T + 2 * BLK  # padded signal width 768


def _tiles(sig):
    """[n, LPAD] -> Hankel tiles [n, M_T, BLK, BLK] with
    T[n,m,b,d] = sig[n, 128m + b + d], materialized in bf16 (values are
    bf16-exact by construction)."""
    n = sig.shape[0]
    sh = jnp.stack([sig[:, b:b + BLK * (M_T + 1)] for b in range(BLK)],
                   axis=1)                       # [n, 128, 640]
    sh = sh[:, :, :BLK * M_T].reshape(n, BLK, M_T, BLK)
    return jnp.transpose(sh, (0, 2, 1, 3)).astype(jnp.bfloat16)


def matmul_version(seg, alen):
    """Hankel-tile MXU formulation. Same exact integers."""
    n = seg.shape[0]
    i = jnp.arange(PITCH_ANALYSIS)
    mask_i = (i[None, :] < alen[:, None]).astype(F32)
    base_m = seg[:, :PITCH_ANALYSIS] * mask_i

    segp = jnp.concatenate(
        [seg, jnp.zeros((n, LPAD - SPAN), F32)], axis=1)
    sh, sl = split_hi_lo(segp)
    hh_h, hh_l = split_hi_lo(sh * sh)
    hl_h, hl_l = split_hi_lo(sh * sl)
    ll_h, ll_l = split_hi_lo(sl * sl)

    bh, bl = split_hi_lo(base_m)
    KW = 2 * BLK
    kpad = jnp.zeros((n, 3, KW), F32)
    kpad = kpad.at[:, 0, :PITCH_ANALYSIS].set(bh)
    kpad = kpad.at[:, 1, :PITCH_ANALYSIS].set(bl)
    kpad = kpad.at[:, 2, :PITCH_ANALYSIS].set(mask_i)
    kern = kpad.reshape(n, 3, 2, BLK).astype(jnp.bfloat16)  # [n,3,c,d]

    sigs = jnp.stack([sh, sl, hh_h, hh_l, hl_h, hl_l, ll_h, ll_l],
                     axis=1)                      # [n, 8, LPAD]
    T = _tiles(sigs.reshape(n * 8, LPAD)).reshape(
        n, 8, M_T, BLK, BLK)                      # [n,8,m,b,d]

    # P[n, s, k, m, c, b] = sum_d T[n,s,m,b,d] * kern[n,k,c,d]
    P = jnp.einsum("nsmbd,nkcd->nskmcb", T, kern,
                   preferred_element_type=F32)

    def corr_at(s, k):
        # out[n, 128a + b] = sum_c P[n,s,k,a+c,c,b], a in {0,1,2}
        out = jnp.stack([
            P[:, s, k, a, 0] + P[:, s, k, a + 1, 1] for a in range(3)
        ], axis=1).reshape(n, 3 * BLK)
        return out[:, :NLAG]

    hh = corr_at(0, 0)                      # sh ⊛ bh
    mid = corr_at(0, 1) + corr_at(1, 0)     # sh⊛bl + sl⊛bh
    ll = corr_at(1, 1)                      # sl ⊛ bl
    corr_all = combine_exact(hh, mid, ll, 256.0)

    e_hh = F32(256.0) * corr_at(2, 2) + corr_at(3, 2)
    e_hl = F32(256.0) * corr_at(4, 2) + corr_at(5, 2)
    e_ll = F32(256.0) * corr_at(6, 2) + corr_at(7, 2)
    e2_all = combine_exact(e_hh, e_hl, e_ll, 512.0)
    return corr_all, e2_all


def matmul_v2(seg, alen):
    """Hankel-tile MXU formulation, v2: bf16 before stacking, natural
    [n, b, m, d] stack layout (no transpose), squared-half tiles derived
    POINTWISE from the sh/sl tiles (tiles of a pointwise function are the
    pointwise function of the tiles), trimmed widths."""
    n = seg.shape[0]
    i = jnp.arange(PITCH_ANALYSIS)
    mask_i = (i[None, :] < alen[:, None]).astype(F32)
    base_m = seg[:, :PITCH_ANALYSIS] * mask_i

    W = BLK * M_T + BLK - 1  # widest read: 128m+b+d ≤ 383+127+127
    segp = jnp.concatenate([seg, jnp.zeros((n, W - SPAN), F32)], axis=1)
    sh, sl = split_hi_lo(segp)
    sh16, sl16 = sh.astype(jnp.bfloat16), sl.astype(jnp.bfloat16)

    # [n, b, m*d] stacks of the two base signals only.
    def tiles(sig16):
        st = jnp.stack([
            lax.slice(sig16, (0, b), (n, b + BLK * M_T))
            for b in range(BLK)
        ], axis=1)                                   # [n, 128b, 512]
        return st.reshape(n, BLK, M_T, BLK)          # [n, b, m, d]

    Th = tiles(sh16)
    Tl = tiles(sl16)
    # Squared-half tiles, pointwise from Th/Tl (fused, no extra stacks).
    prod_hh = (Th.astype(F32) * Th.astype(F32))
    prod_hl = (Th.astype(F32) * Tl.astype(F32))
    prod_ll = (Tl.astype(F32) * Tl.astype(F32))

    def sp(x):
        xh = jnp.round(x * F32(1.0 / 256.0))
        return xh.astype(jnp.bfloat16), (x - F32(256.0) * xh).astype(
            jnp.bfloat16)

    hh_h, hh_l = sp(prod_hh)
    hl_h, hl_l = sp(prod_hl)
    ll_h, ll_l = sp(prod_ll)

    bh, bl = split_hi_lo(base_m)
    KW = 2 * BLK
    kpad = jnp.zeros((n, 3, KW), F32)
    kpad = kpad.at[:, 0, :PITCH_ANALYSIS].set(bh)
    kpad = kpad.at[:, 1, :PITCH_ANALYSIS].set(bl)
    kpad = kpad.at[:, 2, :PITCH_ANALYSIS].set(mask_i)
    kern = kpad.reshape(n, 3, 2, BLK).astype(jnp.bfloat16)  # [n,k,c,d]

    T = jnp.stack([Th, Tl, hh_h, hh_l, hl_h, hl_l, ll_h, ll_l],
                  axis=1)                            # [n, s, b, m, d]
    P = jnp.einsum("nsbmd,nkcd->nskmcb", T, kern,
                   preferred_element_type=F32)

    def corr_at(s, k):
        out = jnp.stack([
            P[:, s, k, a, 0] + P[:, s, k, a + 1, 1] for a in range(3)
        ], axis=1).reshape(n, 3 * BLK)
        return out[:, :NLAG]

    hh = corr_at(0, 0)
    mid = corr_at(0, 1) + corr_at(1, 0)
    ll = corr_at(1, 1)
    corr_all = combine_exact(hh, mid, ll, 256.0)

    e_hh = F32(256.0) * corr_at(2, 2) + corr_at(3, 2)
    e_hl = F32(256.0) * corr_at(4, 2) + corr_at(5, 2)
    e_ll = F32(256.0) * corr_at(6, 2) + corr_at(7, 2)
    e2_all = combine_exact(e_hh, e_hl, e_ll, 512.0)
    return corr_all, e2_all


def conv4_gather(seg, alen):
    """corr via a 4-channel grouped conv; e2 via int32 cumsums + a
    per-lane dynamic-slice window diff (the mask-kernel channels were 6
    of the 10 conv channels)."""
    n = seg.shape[0]
    i = jnp.arange(PITCH_ANALYSIS)
    mask_i = (i[None, :] < alen[:, None]).astype(F32)
    base_m = seg[:, :PITCH_ANALYSIS] * mask_i

    sh, sl = split_hi_lo(seg)
    bh, bl = split_hi_lo(base_m)
    inp = jnp.stack([sh, sh, sl, sl], axis=1)
    ker = jnp.stack([bh, bl, bh, bl], axis=1)

    def one(inp_n, ker_n):
        return lax.conv_general_dilated(
            inp_n[None], ker_n[:, None, :], window_strides=(1,),
            padding="VALID", feature_group_count=4,
            dimension_numbers=("NCH", "OIH", "NCH"),
        )[0]

    ch = jax.vmap(one)(inp, ker)
    corr_all = combine_exact(ch[:, 0], ch[:, 1] + ch[:, 2], ch[:, 3], 256.0)

    # e2[k] = cs[k+alen] - cs[k] per split-product signal; cumsums stay
    # < 2^23 (495 * 128^2) so f32 window diffs are exact.
    def csum(prod):
        cs = jnp.cumsum(prod.astype(jnp.int32), axis=1)
        return jnp.concatenate(
            [jnp.zeros((n, 1), jnp.int32), cs], axis=1).astype(F32)

    cs_hh = csum(sh * sh)
    cs_hl = csum(sh * sl)
    cs_ll = csum(sl * sl)

    def windiff(cs):
        hi = jax.vmap(
            lambda c, a: lax.dynamic_slice(c, (a,), (NLAG,))
        )(cs, alen)
        return hi - cs[:, :NLAG]

    e2_all = combine_exact(windiff(cs_hh), windiff(cs_hl),
                           windiff(cs_ll), 512.0)
    return corr_all, e2_all


def pallas_version(seg, alen):
    """ops/pallas/pitch.py kernel + exact combine."""
    from ctts_tpu.ops.pallas.pitch import (
        KW, NLAG_PAD, SEGW, pitch_corr_components,
    )

    n = seg.shape[0]
    i = jnp.arange(PITCH_ANALYSIS)
    mask_i = (i[None, :] < alen[:, None]).astype(F32)
    base_m = seg[:, :PITCH_ANALYSIS] * mask_i

    segp = jnp.concatenate([seg, jnp.zeros((n, SEGW - SPAN), F32)], axis=1)
    bh, bl = split_hi_lo(base_m)
    pad = jnp.zeros((n, KW - PITCH_ANALYSIS), F32)
    bh = jnp.concatenate([bh, pad], axis=1)
    bl = jnp.concatenate([bl, pad], axis=1)
    maskp = jnp.concatenate([mask_i, pad], axis=1)

    chh, cmid, cll, ehh, ehl, ell = pitch_corr_components(
        segp, bh, bl, maskp)
    corr_all = combine_exact(chh, cmid, cll, 256.0)[:, :NLAG]
    e2_all = combine_exact(ehh, ehl, ell, 512.0)[:, :NLAG]
    return corr_all, e2_all


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--lanes", type=int, default=2048)
    ap.add_argument("--iters", type=int, default=5)
    args = ap.parse_args()

    rng = np.random.default_rng(0)
    seg = rng.integers(-3000, 3000, (args.lanes, SPAN)).astype(np.float32)
    alen = rng.integers(50, PITCH_ANALYSIS + 1, args.lanes).astype(np.int32)

    seg_d = jnp.asarray(seg)
    alen_d = jnp.asarray(alen)

    # Timing via scalar checksums (full outputs are ~4.5 MB — transfer-
    # dominated on the tunnel); correctness via one full transfer.
    def ck(fn):
        def g(s, a):
            c, e = fn(s, a)
            return jnp.sum(c) + jnp.sum(e)
        return g

    fns = {"conv": conv_version, "pallas": pallas_version}
    res = {}
    for name, fn in fns.items():
        jfn = jax.jit(fn)
        jck = jax.jit(ck(fn))
        t0 = time.perf_counter()
        c, e = jfn(seg_d, alen_d)
        c, e = np.asarray(c), np.asarray(e)
        np.asarray(jck(seg_d, alen_d))
        compile_s = time.perf_counter() - t0
        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            np.asarray(jck(seg_d, alen_d))
            ts.append(time.perf_counter() - t0)
        res[name] = (c, e, min(ts), compile_s)
        print(f"{name}: best {min(ts)*1e3:.2f} ms (compile {compile_s:.1f}s)")

    cc, ce = res["conv"][0], res["conv"][1]
    for name in fns:
        if name == "conv":
            continue
        mc, me = res[name][0], res[name][1]
        print(f"{name} corr bit-equal:", bool(np.array_equal(cc, mc)),
              "max|d|:", float(np.abs(cc - mc).max()))
        print(f"{name} e2   bit-equal:", bool(np.array_equal(ce, me)),
              "max|d|:", float(np.abs(ce - me).max()))


if __name__ == "__main__":
    main()
