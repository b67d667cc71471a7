"""JAX/XLA device implementations of the synthesis DSP stages.

Everything here is jit-compatible: static shapes, masked dynamic lengths,
`lax.scan`/`lax.cond` control flow. Numerics follow the reference's int16
lattice via ops.quant (truncating stores, wrapping OLA accumulators);
reductions use XLA's f32 sums, which reorders accumulation relative to the
C loops — divergence shows up only when a discrete decision (pitch argmax,
WSOLA offset) sits on a float near-tie. The NumPy oracle
(ctts_tpu.synth.dsp_np) is the semantic ground truth; tests bound the
device-vs-oracle deviation.

Parity sources cited per function (file:line into /root/reference).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from ctts_tpu.constants import SAMPLE_RATE
from ctts_tpu.ops.luts import hann, sine_fade_gain
from ctts_tpu.ops.exact import div_rn, sqrt_rn
from ctts_tpu.ops.quant import q16, trunc16, wrap16

F32 = jnp.float32

# Static bounds (validated by the plan builder).
PITCH_MIN_LAG = SAMPLE_RATE // 400  # 55
PITCH_MAX_LAG = SAMPLE_RATE // 80   # 275
PITCH_ANALYSIS = SAMPLE_RATE // 100  # 220


_PITCH_SPAN = PITCH_MAX_LAG + PITCH_ANALYSIS  # 495


def resample_select_grain() -> int:
    """Column granularity of the shifted-select pruning below: 128
    everywhere. 64 prunes ~17% more select columns but runs 28% SLOWER
    on v5e (46.5 vs 36.3 ms/batch-64, tools/microbench_resample.py —
    sub-lane-width blocks waste half of every f32 (8, 128) vreg), and
    the 64-aligned pattern inside the large vmapped synthesis program
    segfaults the XLA:CPU compiler anyway. CTTS_CONTOUR_GRAIN overrides
    (tests pin 64↔128 bit-equality on small programs)."""
    import os

    env = os.environ.get("CTTS_CONTOUR_GRAIN")
    if env:
        return int(env)
    return 128


def shifted_select_resample(wpad, drift, D: int, FR: int):
    """Batched integer-drift window pick without gathers: returns
    (a, b) with a[k, i] = wpad[k, D + i + drift[k, i]] and b the same
    one column further — the (idx, idx+1) lerp operands of the contour
    resample (ctts.c:2206-2273). Requires |drift| ≤ D and, for the
    triangular pruning to be exact, |drift[k, i]| ≤ i·(D-2)/256 + 1
    (guaranteed by contour_drift's construction, device.derive_dims).

    TPU gathers run at a few tens of M elements/s; 2D+1 shifted selects
    are ~100× faster. Each element is hit by EXACTLY ONE delta (its own
    drift), so the pick is computed as a SUM of masked shifted windows
    instead of a chain of at[].set read-modify-write passes — the 2D+1
    sequential full-array passes could not fuse (measured 55 ms/batch
    on v5e; the sum tree fuses into one pass per column block). Per
    column block, only the deltas whose triangular drift bound can
    reach that block contribute, rounded to the lane grain (~40% fewer
    terms, exact same result). Summing ±0.0 from the non-hit terms can
    flip a -0.0 pick to +0.0; the int16 quantizer downstream erases the
    distinction (and the grains test compares with ==, where -0.0 == 0.0).
    """
    K = wpad.shape[0]
    mcb = max((D - 2) / 256.0, 1e-6)
    grain = resample_select_grain()
    a_blocks, b_blocks = [], []
    for c in range(0, FR, grain):
        w = min(grain, FR - c)
        d_blk = drift[:, c:c + w]
        ta = tb = None
        for delta in range(-D, D + 1):
            i0 = 0 if delta == 0 else int((abs(delta) - 1) / mcb)
            i0 = (i0 // grain) * grain
            if i0 > c:
                continue
            hit = d_blk == delta
            w_d = lax.slice(wpad, (0, D + delta + c),
                            (K, D + delta + c + w))
            w_d1 = lax.slice(wpad, (0, D + delta + 1 + c),
                             (K, D + delta + 1 + c + w))
            pa = jnp.where(hit, w_d, F32(0.0))
            pb = jnp.where(hit, w_d1, F32(0.0))
            ta = pa if ta is None else ta + pa
            tb = pb if tb is None else tb + pb
        a_blocks.append(ta)
        b_blocks.append(tb)
    return (jnp.concatenate(a_blocks, axis=1),
            jnp.concatenate(b_blocks, axis=1))


def _vary(x):
    """Mark a constant-built array as device-varying when tracing inside
    a manual (shard_map) mesh region; identity otherwise and at runtime.

    Scan/while carries seeded from in-body constants (jnp.zeros etc.)
    type as replicated, while the carry outputs — mixed with per-shard
    row data — type as varying; the varying-manual-axes checker then
    rejects the loop. Casting the seed keeps the checker ON for the
    sharded serving path (parallel/batch.py) instead of disabling it
    with check_vma=False."""
    from jax._src.mesh import get_abstract_mesh

    axes = get_abstract_mesh().manual_axes
    if not axes:
        return x
    return lax.pcast(x, axes, to="varying")


def _pitch_backend() -> str:
    """Pitch-correlation backend: the Pallas kernel (ops/pallas/pitch.py)
    beats the 1-D conv's ~28 ms dispatch-latency floor ~20x on TPU; the
    grouped conv remains the portable/oracle-matching fallback (CPU
    tests, and any backend without Mosaic). Both produce bit-identical
    exact integers (tests/test_pallas_pitch.py)."""
    import os

    choice = os.environ.get("CTTS_PITCH_BACKEND", "auto")
    if choice != "auto":
        return choice
    import jax

    return "pallas" if jax.default_backend() != "cpu" else "conv"


def estimate_pitch_batch(segs: jnp.ndarray, counts: jnp.ndarray,
                         backend: str | None = None) -> jnp.ndarray:
    """Batched estimate_pitch (ctts.c:1899-1943) over segs[n, _PITCH_SPAN]
    analysis segments with per-row live counts. One dispatch for the
    whole batch (the conv op's latency floor made per-row vmapping the
    dominant compose cost)."""
    from ctts_tpu.ops.exact import combine_exact, split_hi_lo

    n = segs.shape[0]
    max_lag = jnp.minimum(PITCH_MAX_LAG, counts // 2)            # [n]
    analysis_len = jnp.minimum(PITCH_ANALYSIS, counts - max_lag)

    i = jnp.arange(PITCH_ANALYSIS)
    mask_i = (i[None, :] < analysis_len[:, None]).astype(F32)
    base_m = segs[:, :PITCH_ANALYSIS] * mask_i

    backend = backend or _pitch_backend()
    if backend.startswith("pallas"):
        from ctts_tpu.ops.pallas.pitch import (
            KW, SEGW, pitch_corr_components,
        )

        segp = jnp.concatenate(
            [segs, jnp.zeros((n, SEGW - _PITCH_SPAN), F32)], axis=1)
        bh, bl = split_hi_lo(base_m)
        pad = jnp.zeros((n, KW - PITCH_ANALYSIS), F32)
        chh, cmid, cll, ehh, ehl, ell = pitch_corr_components(
            segp,
            jnp.concatenate([bh, pad], axis=1),
            jnp.concatenate([bl, pad], axis=1),
            jnp.concatenate([mask_i, pad], axis=1),
            interpret=(backend == "pallas_interpret"),
        )
        corr_all = combine_exact(chh, cmid, cll, 256.0)[:, :PITCH_MAX_LAG + 1]
        e2_all = combine_exact(ehh, ehl, ell, 512.0)[:, :PITCH_MAX_LAG + 1]
    else:
        sh, sl = split_hi_lo(segs)
        bh, bl = split_hi_lo(base_m)
        hh_h, hh_l = split_hi_lo(sh * sh)
        hl_h, hl_l = split_hi_lo(sh * sl)
        ll_h, ll_l = split_hi_lo(sl * sl)
        inp = jnp.stack([sh, sh, sl, sl,
                         hh_h, hh_l, hl_h, hl_l, ll_h, ll_l], axis=1)
        ker = jnp.stack([bh, bl, bh, bl] + [mask_i] * 6, axis=1)

        def one(inp_n, ker_n):
            return lax.conv_general_dilated(
                inp_n[None], ker_n[:, None, :], window_strides=(1,),
                padding="VALID", feature_group_count=10,
                dimension_numbers=("NCH", "OIH", "NCH"),
            )[0]

        ch = jax.vmap(one)(inp, ker)                     # [n, 10, 276]
        corr_all = combine_exact(ch[:, 0], ch[:, 1] + ch[:, 2],
                                 ch[:, 3], 256.0)
        e_hh = F32(256.0) * ch[:, 4] + ch[:, 5]
        e_hl = F32(256.0) * ch[:, 6] + ch[:, 7]
        e_ll = F32(256.0) * ch[:, 8] + ch[:, 9]
        e2_all = combine_exact(e_hh, e_hl, e_ll, 512.0)

    b_h, b_l = split_hi_lo(base_m)
    e1 = combine_exact(
        jnp.sum(b_h * b_h, axis=1), jnp.sum(b_h * b_l, axis=1),
        jnp.sum(b_l * b_l, axis=1), 512.0,
    )

    lags = jnp.arange(PITCH_MIN_LAG, PITCH_MAX_LAG + 1)
    corr = corr_all[:, PITCH_MIN_LAG:]
    e2 = e2_all[:, PITCH_MIN_LAG:]

    # Correctly rounded norm/divisions (exact.div_rn docstring): the
    # normalized-corr argmax and the 0.3 voiced threshold are C-parity
    # decisions, and the fractional pitch feeds the jump-ratio test.
    norm = sqrt_rn(e1[:, None] * e2)
    corr = jnp.where(norm > 0, div_rn(corr, jnp.where(norm > 0, norm,
                                                      F32(1.0))), corr)
    corr = jnp.where(lags[None, :] <= max_lag[:, None], corr,
                     F32(-jnp.inf))

    best = jnp.argmax(corr, axis=1)
    best_corr = jnp.take_along_axis(corr, best[:, None], axis=1)[:, 0]
    best_lag = lags[best].astype(F32)
    pitch = jnp.where(best_corr > F32(0.3),
                      div_rn(F32(SAMPLE_RATE), best_lag), F32(0.0))
    usable = ((counts >= 200) & (analysis_len > 0)
              & (max_lag >= PITCH_MIN_LAG))
    return jnp.where(usable, pitch, F32(0.0))


def _pitch_from_segment(seg: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """Shared pitch search: `seg` is [_PITCH_SPAN] holding the analysis
    region's first 495 samples (zero-padded past `count` is fine — masks
    below exclude them). Correlations are computed with `jnp.correlate`
    (→ XLA conv → MXU) instead of large gathers."""
    max_lag = jnp.minimum(PITCH_MAX_LAG, count // 2)
    analysis_len = jnp.minimum(PITCH_ANALYSIS, count - max_lag)

    i = jnp.arange(PITCH_ANALYSIS)
    mask_i = (i < analysis_len).astype(F32)
    base_m = seg[:PITCH_ANALYSIS] * mask_i

    # corr_all[k] = Σ_i base_m[i] * seg[k + i]   (k = 0..PITCH_MAX_LAG)
    # e2_all[k]   = Σ_i mask[i]  * seg[k + i]^2
    # DECISION-EXACT (ops.exact): inputs are int16-valued, so both are
    # computed as exact integers via hi/lo component correlations — all
    # component channels ride ONE grouped conv (single dispatch; the
    # conv op carries a per-dispatch latency floor on this backend).
    # Every channel input is bf16-exact (|v| ≤ 128 split halves, 0/1
    # mask, and the squared products re-split into ≤ 2^7-magnitude
    # halves), so DEFAULT precision computes the exact integers — no
    # HIGHEST (≈6-pass) emulation needed. The oracle computes the
    # identical integers in f64 (dsp_np.estimate_pitch), making the lag
    # argmax and the 0.3 voiced threshold bit-stable device-vs-oracle.
    from ctts_tpu.ops.exact import combine_exact, split_hi_lo

    sh, sl = split_hi_lo(seg)
    bh, bl = split_hi_lo(base_m)
    hh_h, hh_l = split_hi_lo(sh * sh)
    hl_h, hl_l = split_hi_lo(sh * sl)
    ll_h, ll_l = split_hi_lo(sl * sl)
    inp = jnp.stack([sh, sh, sl, sl,
                     hh_h, hh_l, hl_h, hl_l, ll_h, ll_l])[None]
    ker = jnp.stack([bh, bl, bh, bl] + [mask_i] * 6)[:, None, :]
    ch = lax.conv_general_dilated(
        inp, ker, window_strides=(1,), padding="VALID",
        feature_group_count=10,
        dimension_numbers=("NCH", "OIH", "NCH"),
    )[0]                                             # [10, 276]
    corr_all = combine_exact(ch[0], ch[1] + ch[2], ch[3], 256.0)
    # Reassemble the exact energy component sums (each ≤ 2^23 — exact
    # in f32) from their split-half conv sums.
    e_hh = F32(256.0) * ch[4] + ch[5]
    e_hl = F32(256.0) * ch[6] + ch[7]
    e_ll = F32(256.0) * ch[8] + ch[9]
    e2_all = combine_exact(e_hh, e_hl, e_ll, 512.0)
    e1 = combine_exact(
        jnp.sum(bh * bh), jnp.sum(bh * bl), jnp.sum(bl * bl), 512.0
    )

    lags = jnp.arange(PITCH_MIN_LAG, PITCH_MAX_LAG + 1)
    corr = corr_all[PITCH_MIN_LAG:]
    e2 = e2_all[PITCH_MIN_LAG:]

    norm = sqrt_rn(e1 * e2)
    corr = jnp.where(norm > 0, div_rn(corr, jnp.where(norm > 0, norm,
                                                      F32(1.0))), corr)
    corr = jnp.where(lags <= max_lag, corr, F32(-jnp.inf))

    best = jnp.argmax(corr)
    pitch = jnp.where(corr[best] > F32(0.3),
                      div_rn(F32(SAMPLE_RATE), lags[best].astype(F32)),
                      F32(0.0))
    usable = (count >= 200) & (analysis_len > 0) & (max_lag >= PITCH_MIN_LAG)
    return jnp.where(usable, pitch, F32(0.0))


def estimate_pitch_win(window: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """estimate_pitch (ctts.c:1899-1943) over the LAST `count` samples of
    `window` (a fixed-size right-aligned buffer). Returns f32 Hz (0 =
    unvoiced)."""
    win_len = window.shape[0]
    # Region = window[win_len-count:]; the search only touches its first
    # max_lag+analysis_len ≤ count samples, but the static 495-slice may
    # run past the window end when count < 495 — pad with zeros (masked).
    padded = jnp.concatenate([window, jnp.zeros(_PITCH_SPAN, F32)])
    start = jnp.clip(win_len - count, 0, win_len)
    seg = jax.lax.dynamic_slice(padded, (start,), (_PITCH_SPAN,))
    return _pitch_from_segment(seg, count)


def estimate_pitch_head(x: jnp.ndarray, count: jnp.ndarray) -> jnp.ndarray:
    """estimate_pitch over the FIRST `count` samples of x."""
    seg = x[:_PITCH_SPAN]
    return _pitch_from_segment(seg, count)


def pitch_shift_blend(
    head: jnp.ndarray, shift_region: jnp.ndarray, factor: jnp.ndarray
) -> jnp.ndarray:
    """apply_pitch_shift + ramp blend on a unit head
    (ctts.c:1946-1976, 2006-2021). `head` is a fixed-size [H] buffer whose
    first `shift_region` samples are live. Returns the blended head."""
    H = head.shape[0]
    i = jnp.arange(H)

    # apply_pitch_shift is a no-op unless 0.9 ≤ factor ≤ 1.1 and ≥100
    # samples.
    do_shift = (factor >= F32(0.9)) & (factor <= F32(1.1)) & (shift_region >= 100)

    # div_rn: new_count truncates the quotient — a 1-ULP TPU division
    # error at an integer boundary changes the copied length.
    new_count = div_rn(shift_region.astype(F32),
                       jnp.where(do_shift, factor, F32(1.0))
                       ).astype(jnp.int32)
    src_pos = i.astype(F32) * factor
    idx = src_pos.astype(jnp.int32)
    frac = src_pos - idx.astype(F32)

    # Resample reads head[idx] / head[idx+1]. An elementwise gather here
    # was the compose path's single largest cost (0.054 s/trip at batch
    # 64); per 128-column block, fetch ONE 160-wide window at the
    # block's base source position (windowed dynamic slices lower to
    # DMA-like copies) and pick within it by drift-shifted selects:
    # for i = 128c + j, the block-local offset is li = idx - base_c =
    # j + d with d = trunc(128c·f + j·f) - trunc(128c·f) - j ∈ [-13, 15]
    # whenever do_shift holds (|f-1| ≤ 0.1, j ≤ 127) — so a/b are exact
    # picks out of 29 statically-shifted window views, ~18x less
    # traffic than the earlier [nblk, 128, 256] one-hot matvec
    # (19.5 ms/batch-64, tools/microbench_parts.py).
    # Out-of-range rows (do_shift false → arbitrary factor) match no
    # shift: a/b stay 0 and those lanes are discarded below; reads past
    # H land in the zero padding — only positions masked out by
    # have1/have2 ever index there, matching the old clip semantics.
    assert H % 128 == 0
    nblk = H // 128
    # Drift bound: d = li - j with li ∈ [floor(j·f) - 1, floor(j·f) + 2]
    # (±1 f32-trunc slop on each product), so d ∈ [-14, 14] for
    # |f-1| ≤ 0.1, j ≤ 127; b reads d+1. One extra delta each side for
    # margin — a delta outside the loop range would silently zero a
    # live lane (the fuzz test vs the oracle guards this).
    DLO, DHI = -15, 16
    WF = 160                          # window: j + d + 1 ≤ 145
    hpad = jnp.concatenate([head, jnp.zeros(WF + 128, F32)])
    base = (jnp.arange(nblk) * 128).astype(F32) * factor
    base = jnp.minimum(base.astype(jnp.int32), H)
    win = jnp.stack([
        lax.dynamic_slice(hpad, (base[c],), (WF,))
        for c in range(nblk)
    ])                                                 # [nblk, 160]
    li = idx.reshape(nblk, 128) - base[:, None]        # block-local idx
    d = li - jnp.arange(128)[None, :]
    winp = jnp.concatenate([jnp.zeros((nblk, -DLO), F32), win], axis=1)
    # Each element is hit by EXACTLY ONE delta (d is a function of the
    # indices), so the pick is a fusable SUM of masked shifted views —
    # a chain of dependent where-RMW passes cannot fuse (the same
    # anti-pattern cost shifted_select_resample 55 ms). No-hit lanes
    # (do_shift false) stay 0 either way.
    a = b = None
    for delta in range(DLO, DHI + 1):
        s = delta - DLO
        hit = d == delta
        pa = jnp.where(hit, lax.slice(winp, (0, s), (nblk, s + 128)),
                       F32(0.0))
        pb = jnp.where(hit, lax.slice(winp, (0, s + 1), (nblk, s + 129)),
                       F32(0.0))
        a = pa if a is None else a + pa
        b = pb if b is None else b + pb
    a = a.reshape(H)
    b = b.reshape(H)
    lerp = a * (F32(1.0) - frac) + b * frac
    have2 = idx + 1 < shift_region
    have1 = (~have2) & (idx < shift_region)
    resampled = jnp.where(have2, trunc16(lerp), jnp.where(have1, a, F32(0.0)))

    # copy back up to min(new_count, count); zero-pad the remainder
    copy_count = jnp.minimum(new_count, shift_region)
    shifted = jnp.where(i < copy_count, resampled, F32(0.0))
    shifted = jnp.where(do_shift, shifted, head)

    # blend: region*(1-t) + original*t over shift_region (ctts.c:2016-2019)
    t = div_rn(i.astype(F32),
               jnp.where(shift_region > 0, shift_region, 1).astype(F32))
    blended = trunc16(shifted * (F32(1.0) - t) + head * t)
    return jnp.where(i < shift_region, blended, head)


def masked_rms(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """calculate_rms over the first n samples (ctts.c:1697-1706); f32
    accumulation on device (C uses double — near-exact for our scale)."""
    i = jnp.arange(x.shape[0])
    m = (i < n).astype(F32)
    ss = jnp.sum(x * x * m)
    return sqrt_rn(div_rn(ss, jnp.maximum(n, 1).astype(F32)))


# Max kept segments per region for silence compaction. Segments appear at
# long sub-threshold runs (unit tails, embedded pauses): one per removed
# gap. Excess segments are kept uncompacted (graceful divergence) — raise
# if pathological audio needs it.
NBLK = 32


def _cumsum_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive int32 cumsum over the last axis via a 128-lane
    hierarchy: XLA lowers a flat cumsum over a W-wide row to ~log2(W)
    full-width shifted-add passes (15 at CONTW), while cumsum-within-
    128-lane-tiles + a W/128-wide block cumsum + one broadcast add is
    ~3 full passes. Bit-exact (integer adds are associative)."""
    W = x.shape[-1]
    if W % 128 != 0 or W <= 1024 or jax.default_backend() == "cpu":
        # Flat cumsum on CPU: the hierarchy is a TPU-bandwidth
        # optimization, and its reshape/cumsum pattern inside the large
        # vmapped synthesis program triggers an XLA:CPU compiler
        # segfault (reproducible in-suite at test_stream/golden-device;
        # the isolated pattern compiles fine).
        return jnp.cumsum(x, axis=-1)
    t = x.reshape(x.shape[:-1] + (W // 128, 128))
    within = jnp.cumsum(t, axis=-1)
    blocks = jnp.cumsum(within[..., -1], axis=-1)
    excl = jnp.concatenate(
        [jnp.zeros(blocks.shape[:-1] + (1,), x.dtype), blocks[..., :-1]],
        axis=-1)
    return (within + excl[..., None]).reshape(x.shape)


def _seg_extract_backend() -> str:
    choice = os.environ.get("CTTS_SEG_EXTRACT", "auto")
    if choice != "auto":
        return choice
    return "hier" if jax.default_backend() != "cpu" else "topk"


def _first_nblk_flagged(flags: jnp.ndarray, i: jnp.ndarray,
                        W: int) -> jnp.ndarray:
    """Indices of the first NBLK True positions of `flags` [W], ascending,
    padded with W. See the call site in silence_segments for the two
    lowerings' rationale."""
    if _seg_extract_backend() == "hier" and W >= 128:
        Wp = _roundup128(W)
        f2 = flags
        if Wp != W:
            f2 = jnp.concatenate([f2, jnp.zeros(Wp - W, bool)])
        f2 = f2.reshape(-1, 128).astype(jnp.int32)       # [NB2, 128]
        nb2 = f2.shape[0]
        wc = jnp.cumsum(f2, axis=1)                      # in-block rank
        cnt_b = wc[:, -1]                                # flags per block
        cx = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(cnt_b)[:-1]])
        s_vals = jnp.arange(1, NBLK + 1, dtype=jnp.int32)
        hitb = ((cx[None, :] < s_vals[:, None])
                & (s_vals[:, None] <= (cx + cnt_b)[None, :]))
        jb = jnp.sum(jnp.where(
            hitb, jnp.arange(nb2, dtype=jnp.int32)[None, :], 0), axis=1)
        cb = jnp.sum(jnp.where(hitb, cx[None, :], 0), axis=1)
        found = jnp.any(hitb, axis=1)
        # Exact one-hot row picks (values ≤ 128 are bf16-exact; exactly
        # one nonzero product per output).
        sel = hitb.astype(F32)
        wrow = sel @ wc.astype(F32)                      # [NBLK, 128]
        frow = sel @ f2.astype(F32)
        r_s = (s_vals - cb).astype(F32)
        lane = jnp.arange(128, dtype=jnp.int32)
        hitl = (wrow == r_s[:, None]) & (frow > F32(0.5))
        lpos = jnp.min(jnp.where(hitl, lane[None, :], 128), axis=1)
        return jnp.where(found, jb * 128 + lpos, W).astype(jnp.int32)
    neg = jnp.where(flags, -i, -W - 1)
    nv, _ = lax.top_k(neg, NBLK)
    return jnp.minimum(-nv, W).astype(jnp.int32)


def _roundup128(x: int) -> int:
    return -(-x // 128) * 128


def silence_segments(
    buf: jnp.ndarray,
    length: jnp.ndarray,
    threshold,
    min_silence: int,
):
    """Mask half of remove_silence_regions (ctts.c:1634-1690): computes the
    kept-segment table without moving data. Returns (starts [NBLK],
    seg_len [NBLK], new_len, overflow) — all zeros/unchanged when the
    region is all-zero or empty (the C's early-outs). `overflow` is True
    when the region had more than NBLK kept segments and the remainder was
    left uncompacted (graceful divergence — counted and surfaced by the
    executors, per the no-silent-caps rule). Data movement is done by
    move_segments."""
    W = buf.shape[0]
    i = jnp.arange(W)
    live = i < length

    absv = jnp.abs(buf)
    max_amp = jnp.max(jnp.where(live, absv, F32(0.0)))
    abs_threshold = jnp.trunc(max_amp * F32(threshold))

    silent = (absv <= abs_threshold) & live

    # Run predicates via cumsum windows (no associative max/min scans —
    # they were ~half the segtables stage):
    # - prefix_ok[i]: i sits ≥ keep_n into its silent run ⟺ the
    #   keep_n+1 positions ending at i are all silent.
    # - long[i]: i's run is ≥ min_silence long ⟺ some fully-silent
    #   min_silence-window starts within [i-min_silence+1, i] (a silent
    #   window cannot cross a run boundary, and a ≥M-long run always has
    #   one overlapping each of its positions).
    keep_n = max(min_silence // 4, 10)
    kn1 = keep_n + 1
    M = max(min_silence, 1)
    cs = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), _cumsum_i32(silent.astype(jnp.int32))]
    )                                                   # [W+1]
    cs_l = jnp.concatenate([jnp.zeros(kn1, jnp.int32), cs])[1: W + 1]
    prefix_ok = (cs[1:] - cs_l) == kn1
    cs_r = jnp.concatenate([cs, jnp.full(M, cs[-1], jnp.int32)])
    w_all = (cs_r[M: M + W] - cs[:W]) == M              # [W]
    cw = jnp.concatenate(
        [jnp.zeros(1, jnp.int32), _cumsum_i32(w_all.astype(jnp.int32))]
    )
    cw_l = jnp.concatenate([jnp.zeros(M, jnp.int32), cw])[1: W + 1]
    long_run = (cw[1:] - cw_l) > 0

    keep = jnp.where(silent, ~(long_run & prefix_ok), live)

    seg_start_flag = keep & jnp.concatenate([jnp.array([True]), ~keep[:-1]])
    next_keep = jnp.concatenate([keep[1:], jnp.array([False])])
    seg_end_flag = keep & (~next_keep)

    # Extract the first NBLK segment bounds in order (replaces the flag
    # cumsums + vmapped binary searches — searchsorted lowers to
    # ~log2(W) serialized gather probes per segment, the bulk of the
    # segtables stage on TPU). Two lowerings, bit-identical (pinned by
    # tests/test_device_executor.py::test_first_nblk_extract_equal):
    # - "hier": per-128-block flag counts -> the s-th flag's block via a
    #   [NBLK, W/128] interval compare, its in-block rank via an exact
    #   one-hot row pick of the within-block cumsum. TPU default; the
    #   reshape+cumsum pattern segfaults XLA:CPU inside the large
    #   vmapped core (same gate as _cumsum_i32).
    # - "topk": one lax.top_k of the negated masked indices per flag
    #   array. Portable fallback / CPU default.
    # Missing segments yield W, matching searchsorted's not-found value.
    starts = _first_nblk_flagged(seg_start_flag, i, W)
    ends = _first_nblk_flagged(seg_end_flag, i, W)
    valid_seg = starts < W
    seg_len = jnp.where(valid_seg, ends - starts + 1, 0)
    # Overflow: >NBLK segments → last slot becomes a catch-all that keeps
    # the remainder uncompacted (no audio loss; mild parity divergence).
    n_segs = jnp.sum(seg_start_flag.astype(jnp.int32))
    overflow = n_segs > NBLK
    last_len = jnp.maximum(length - starts[NBLK - 1], 0)
    seg_len = seg_len.at[NBLK - 1].set(
        jnp.where(overflow & valid_seg[NBLK - 1], last_len,
                  seg_len[NBLK - 1])
    )
    new_len = jnp.sum(seg_len)

    # All-zero or empty region: C returns unchanged — identity (no moves).
    unchanged = (max_amp == F32(0.0)) | (length == 0)
    starts = jnp.where(unchanged, 0, starts)
    seg_len = jnp.where(unchanged, 0, seg_len)
    new_len = jnp.where(unchanged, length, new_len)
    return starts, seg_len, new_len, overflow & ~unchanged


def move_segments(buf: jnp.ndarray, starts: jnp.ndarray, dst: jnp.ndarray,
                  seg_len: jnp.ndarray, win_w: int = 0) -> jnp.ndarray:
    """Move contiguous segments buf[starts[s]:+len] → out[dst[s]:+len].

    XLA implementation: dynamic-slice window moves (slice-granular dynamic
    ops lower to DMA-like copies on TPU, unlike elementwise gather/scatter/
    sort which run at a few M elements/s). Destinations must be
    non-overlapping ascending; untouched positions keep their original
    content (needed for the region margin).

    Because compaction shifts (starts-dst = samples removed so far) are
    non-decreasing, zero-shift segments form a prefix that is already in
    place and zero-length segments form a suffix: only the middle
    [first_moving, last_valid] range does work. A while_loop walks just
    that range, so a region with no removed silence costs zero trips and
    a typical region costs one or two — under vmap the batch pays the
    max trip count, not the static NBLK=32 (was: 0.93 s/batch of the
    round-1 profile, the single largest device cost).
    """
    W = buf.shape[0]
    # Slice-window width: must cover the longest segment (callers pass
    # the region-content width CONTW; default = whole buffer).
    MW = win_w if win_w else W
    nblk = starts.shape[0]
    i = jnp.arange(MW)
    bufpad = jnp.concatenate([buf, jnp.zeros(MW, F32)])

    moving = (seg_len > 0) & (starts != dst)
    s_idx = jnp.arange(nblk)
    first = jnp.min(jnp.where(moving, s_idx, nblk))
    last = jnp.max(jnp.where(moving, s_idx, -1))

    def cond(carry):
        out, s = carry
        return s <= last

    def body(carry):
        out, s = carry
        sc = jnp.minimum(s, nblk - 1)
        src = lax.dynamic_slice(bufpad, (starts[sc],), (MW,))
        cur = lax.dynamic_slice(out, (dst[sc],), (MW,))
        merged = jnp.where(i < seg_len[sc], src, cur)
        return lax.dynamic_update_slice(out, merged, (dst[sc],)), s + 1

    out0 = jnp.concatenate([buf, jnp.zeros(MW, F32)])
    out, _ = lax.while_loop(cond, body, (out0, first))
    return out[:W]


def _contour0(content: jnp.ndarray, count: jnp.ndarray,
              f_start: jnp.ndarray, f_end: jnp.ndarray,
              max_frames: int, max_drift: int = 32) -> jnp.ndarray:
    """apply_smooth_pitch_contour (ctts.c:2206-2273) on content[:count],
    segment anchored at offset 0. Gather/scatter-free: frames are built
    with strided reshapes, the resample (whose index trunc(i*pf) drifts at
    most ±max_drift from i, since |pf-1| ≤ max_pitch_change) is a sum of
    shifted selects, and the 50%-overlap OLA is two interleaved
    non-overlapping tilings.

    `max_drift` must be ≥ ceil(FR * max|pf-1|) + 1; the default covers
    max_pitch_change ≤ 0.12 (reference default 0.10)."""
    W = content.shape[0]
    FR = 256
    HOP = 128
    K = max_frames
    hann256 = hann(FR)

    active = (count >= 100) & (jnp.abs(f_start - f_end) >= F32(0.01))

    denom = (count - FR).astype(F32)
    # count == 256 → division by zero (C quirk): inf.
    inv_count = jnp.where(denom != 0, F32(1.0) / denom, F32(jnp.inf))

    k = jnp.arange(K)
    pos = k * HOP
    frame_ok = (pos + FR <= count) & active

    t = pos.astype(F32) * inv_count
    smooth_t = t * t * (F32(3.0) - F32(2.0) * t)
    pf = f_start + (f_end - f_start) * smooth_t      # [K]

    # 512-wide windows at stride 128 via four shifted reshapes (the
    # resample can read up to ~281 past the frame start — reference OOB
    # quirk, ctts.c:2251).
    need = K * HOP + 4 * HOP
    cpad = jnp.concatenate([content, jnp.zeros(max(need - W, 1), F32)])
    tiles = [cpad[j * HOP:(K + j) * HOP].reshape(K, HOP) for j in range(4)]
    win = jnp.concatenate(tiles, axis=1)             # [K, 512]

    i = jnp.arange(FR)
    src_idx = i[None, :].astype(F32) * pf[:, None]   # [K, FR]
    idx = src_idx.astype(jnp.int32)
    frac = src_idx - idx.astype(F32)
    in_range = idx + 1 < FR

    # Resample via shifted selects: a[k,i] = win[k, idx[k,i]] where
    # idx[k,i] - i ∈ [-max_drift, +max_drift]. TPU gathers run at a few
    # tens of M elements/s; 2·max_drift shifted wheres are ~100× faster.
    #
    # Triangular pruning: |drift[k,i]| = |trunc(i·pf) - i| ≤ i·mc + 1
    # where mc = max|pf-1| ≤ (max_drift-2)/256 by construction of
    # contour_drift (device.derive_dims), so shift delta can only hit
    # columns i ≥ (|delta|-1)/mc. Each delta's select runs on the static
    # column suffix [i0(delta), FR) rounded down to the 128-lane tile —
    # ~30% less select work, exact same result. The delta+1 slice is
    # reused as the next iteration's delta slice (b reads win[idx+1]).
    D = max_drift
    wpad = jnp.concatenate([jnp.zeros((K, D), F32), win], axis=1)  # [K,512+D]
    drift = idx - i[None, :]
    a, b = shifted_select_resample(wpad, drift, D, FR)
    # Reads past the segment end substitute 0 (matching the oracle's
    # handling of the reference's heap overread).
    a = jnp.where(pos[:, None] + idx < count, a, F32(0.0))
    sample = jnp.where(in_range, a * (F32(1.0) - frac) + b * frac, a)

    contrib = trunc16(sample * hann256[None, :])
    contrib = jnp.where(frame_ok[:, None], contrib, F32(0.0))
    normc = jnp.where(frame_ok[:, None], hann256[None, :], F32(0.0))

    # Even frames tile [0, Ke*256); odd frames tile [128, 128 + Ko*256).
    L = K * HOP + FR + HOP
    even = contrib[0::2].reshape(-1)
    odd = contrib[1::2].reshape(-1)
    acc = (
        jnp.concatenate([even, jnp.zeros(L - even.shape[0], F32)])
        + jnp.concatenate(
            [jnp.zeros(HOP, F32), odd, jnp.zeros(L - HOP - odd.shape[0], F32)]
        )
    )[:W]
    n_even = normc[0::2].reshape(-1)
    n_odd = normc[1::2].reshape(-1)
    norm = (
        jnp.concatenate([n_even, jnp.zeros(L - n_even.shape[0], F32)])
        + jnp.concatenate(
            [jnp.zeros(HOP, F32), n_odd,
             jnp.zeros(L - HOP - n_odd.shape[0], F32)]
        )
    )[:W]
    if acc.shape[0] < W:
        acc = jnp.concatenate([acc, jnp.zeros(W - acc.shape[0], F32)])
        norm = jnp.concatenate([norm, jnp.zeros(W - norm.shape[0], F32)])

    acc = wrap16(acc)  # int16 accumulator wraps in C

    good = norm > F32(0.01)
    val = q16(div_rn(acc, jnp.where(good, norm, F32(1.0))))
    ii = jnp.arange(W)
    in_seg = (ii < count) & active
    return jnp.where(in_seg & good, val, content)


def contour_segment(
    buf: jnp.ndarray,
    seg_off: jnp.ndarray,
    seg_len: jnp.ndarray,
    f_start: jnp.ndarray,
    f_end: jnp.ndarray,
    max_frames: int,
    max_drift: int = 32,
):
    """Contour on buf[seg_off, seg_off+seg_len). For the common seg_off=0
    case call _contour0 directly; this wrapper handles a traced offset
    (the interrogative rise/fall split) by shifting the buffer, applying,
    and shifting back."""
    if isinstance(seg_off, int):
        assert seg_off == 0
        return _contour0(buf, seg_len, f_start, f_end, max_frames, max_drift)
    W = buf.shape[0]
    padded = jnp.concatenate([buf, jnp.zeros(W, F32)])
    shifted = lax.dynamic_slice(padded, (seg_off,), (W,))
    res = _contour0(shifted, seg_len, f_start, f_end, max_frames, max_drift)
    merged = lax.dynamic_update_slice(padded, res, (seg_off,))
    return merged[:W]


def tail_fade_window(buf: jnp.ndarray, end: jnp.ndarray,
                     fade_len: jnp.ndarray, W2: int) -> jnp.ndarray:
    """apply_fade_out on buf[..end) like tail_fade, but with the LUT
    lookup confined to a static W2-wide window ending at `end` (the
    full-width lookup gathered B*R*CONTW elements per batch). Requires
    W2 ≥ the clamped fade length (callers size W2 from the batch's max
    fade — device.PlanDims.FADE2W)."""
    i2 = jnp.arange(W2)
    fade = jnp.minimum(jnp.minimum(fade_len, end), W2)
    start = end - fade
    woff = jnp.maximum(end - W2, 0)
    win = lax.dynamic_slice(buf, (woff,), (W2,))
    ia = woff + i2                      # absolute positions
    rel = (ia - start).astype(F32)
    t = (fade.astype(F32) - rel) * (
        F32(1.0) / jnp.maximum(fade, 1).astype(F32)
    )
    gain = sine_fade_gain(t)
    faded = trunc16(win * gain)
    in_fade = (ia >= start) & (ia < end) & (fade > 0)
    win = jnp.where(in_fade, faded, win)
    return lax.dynamic_update_slice(buf, win, (woff,))


def tail_fade(buf: jnp.ndarray, end: jnp.ndarray, fade_len: jnp.ndarray) -> jnp.ndarray:
    """apply_fade_out on buf[..end) (ctts.c:3028-3039), clamping the fade
    to the available content like the C (fade_samples > count → count)."""
    W = buf.shape[0]
    i = jnp.arange(W)
    fade = jnp.minimum(fade_len, end)
    start = end - fade
    # t = (fade - (i - start)) * (1.0f / fade), like the C (ctts.c:3033-3035)
    rel = (i - start).astype(F32)
    t = (fade.astype(F32) - rel) * (F32(1.0) / jnp.maximum(fade, 1).astype(F32))
    gain = sine_fade_gain(t)
    faded = trunc16(buf * gain)
    in_fade = (i >= start) & (i < end) & (fade > 0)
    return jnp.where(in_fade, faded, buf)


def head_fade_in(x: jnp.ndarray, fade_len, n: jnp.ndarray) -> jnp.ndarray:
    """apply_fade_in over x[:min(fade_len, n)] (ctts.c:3015-3025).

    With a static (python int) `fade_len`, the LUT lookup — a gather —
    runs only on a 128-aligned head window instead of the full unit
    width (the full-width lookup was ~15M gathered elements per compose
    trip at batch 64)."""
    W = x.shape[0]
    if isinstance(fade_len, int) and fade_len * 2 <= W:
        FW = min(-(-fade_len // 128) * 128, W)
        head = x[:FW]
        i = jnp.arange(FW)
        fade = jnp.minimum(fade_len, n)
        t = i.astype(F32) * (F32(1.0) / jnp.maximum(fade, 1).astype(F32))
        faded = trunc16(head * sine_fade_gain(t))
        head = jnp.where((i < fade) & (fade > 0), faded, head)
        return jnp.concatenate([head, x[FW:]])
    i = jnp.arange(W)
    fade = jnp.minimum(fade_len, n)
    t = i.astype(F32) * (F32(1.0) / jnp.maximum(fade, 1).astype(F32))
    gain = sine_fade_gain(t)
    faded = trunc16(x * gain)
    return jnp.where((i < fade) & (fade > 0), faded, x)


def remove_dc(x: jnp.ndarray, n: jnp.ndarray) -> jnp.ndarray:
    """remove_dc_offset over x[:n] (ctts.c:1568-1583); exact int math."""
    i = jnp.arange(x.shape[0])
    live = i < n
    total = jnp.sum(jnp.where(live, x, F32(0.0)).astype(jnp.int32))
    nn = jnp.maximum(n, 1)
    dc = jnp.sign(total) * (jnp.abs(total) // nn)  # trunc toward zero
    out = jnp.clip(x - dc.astype(F32), F32(-32768.0), F32(32767.0))
    return jnp.where(live, out, x)
