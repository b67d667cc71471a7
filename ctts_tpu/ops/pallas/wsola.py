"""Pallas TPU kernel for the sequential WSOLA frame chain.

The XLA lowering (ops/wsola_jax.py) runs the offset-selection chain as a
lax.scan whose per-step cost is backend dispatch overhead (~0.14 ms even
for batch-invariant memory ops), × a step count padded to the bucket's
SMAX — ~0.3 s/batch at the bench bucket. This kernel runs the WHOLE
frame chain inside one program per sentence (vmap → batch grid) with a
DYNAMIC trip count (only the frames that actually run — the run
predicate is a prefix, see below), so per-frame cost is VPU/MXU work:

- The 2048-sample window at each nominal position is fetched as a
  1024-aligned 16-row slice + a flat roll by the remainder.
- The 65-lag coarse correlation search is a pair of masked matmuls
  against a stride-4 circulant built from the previous frame's tail:
  num[c] = Σ_j dup[4c+j]·th[j] decomposes over 128-lane rows into
  Σ_r (R·Cᵀ_up)[a+r, 32r+b] + (R↓·Cᵀ_lo)[a+r, 32r+b] with
  Cᵀ[32r+b, w] = th_r[(w-4b) mod 128] — the circulant's mod-128 lane
  wrap IS pltpu.roll's semantics, so Cᵀ builds in 5 roll-doubling
  steps. The ±3 fine search is the same construction at unit stride.
- All decision arithmetic stays EXACT (ops/exact.py scheme): the
  windows are split into bf16-exact hi/lo halves IN-KERNEL (the split
  commutes with the rolls, so one unsplit f32 input plane replaces two
  pre-split planes — one load+roll per window instead of two, and the
  frame fetch needs no reconstruction), every partial sum is a subset
  of ≤768 products of bf16-exact halves (|Σ| < 2^24 ⇒ exact in f32 in
  any order), and the TwoSum combine yields the correctly rounded f32
  of the exact integer — bit-identical to the XLA path and the oracle.
- Candidate energies come from the same precomputed sliding tables the
  XLA path uses (sq shifted by +128 so k=0 loads stay in-bounds, plus
  a stride-4 view for the coarse lags); the previous-tail energy sq2
  is the table entry at the tail's own position — the same correctly
  rounded exact integer exact_sumsq_components produces.
- The chosen frame is fetched by one roll and windowed/truncated
  in-kernel; OLA accumulation stays OUTSIDE (wsola_jax.py), shared
  with the XLA lowering.

The run predicate run[k] = (k·AHOP+FRAME ≤ input_count) ∧ (k·hop+FRAME
≤ alloc) ∧ (k·hop+FRAME ≤ out_size) is non-increasing in k, so the run
set is a prefix [0, nrun) and `have_prev` ≡ (k > 0) inside the loop.

Reference behavior: ctts.c:3436-3488 (coarse/fine search, strict-'>'
earliest-offset tie-breaks), 3506-3566 (frame loop); parity asserted
against the XLA scan by tests/test_pallas_wsola.py (interpret mode) and
on-chip by tools/microbench_wsola.py.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax

from ctts_tpu.ops.pallas import out_struct, vmem_params
from ctts_tpu.ops.exact import split_hi_lo
from ctts_tpu.ops.pallas.compose import flat_roll_left, flat_roll_right

F32 = jnp.float32
LANES = 128

FRAME = 512
AHOP = 128
OVERLAP = FRAME - AHOP      # 384
MAX_SHIFT = 128
NCOARSE = 65                # offsets -128..128 step 4

_LOADW = 2048               # samples fetched per window load (16 rows)


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


def _consts():
    """Trip-invariant iota masks shared by the per-frame step."""
    rowi = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 0)
    lanei = lax.broadcasted_iota(jnp.int32, (LANES, LANES), 1)
    # Cᵀ is indexed [col, w]: the w-lane contraction splits into the
    # same-row ("upper", w ≥ stride·b) and next-row parts. bf16: every
    # dot operand (0/1 masks, window/tail halves ≤ 255) is bf16-exact,
    # and every contraction sum is an exact integer < 2^24 — exact in
    # any accumulation order — so single-pass bf16 MXU dots produce
    # the identical bits at ~6x fewer MXU passes than f32.
    b_of_row = rowi % 32
    up4 = (lanei >= 4 * b_of_row).astype(jnp.bfloat16)
    up1 = (lanei >= b_of_row).astype(jnp.bfloat16)

    # Block-3 layout: entry [a, b] (a<3 rows, b<32 lanes) is
    # candidate 32a + b.
    ai = lax.broadcasted_iota(jnp.int32, (8, LANES), 0)
    bi = lax.broadcasted_iota(jnp.int32, (8, LANES), 1)
    cc = 32 * ai + bi
    c_ok = (ai < 3) & (bi < 32) & (cc < NCOARSE)
    return up4, up1, ai, bi, cc, c_ok


def _circulant(th3, stride, steps):
    """[128, 128] Cᵀ with row 32r+b = th_r lane-rotated right by
    stride·b, for b < 2^steps (other rows zero). The lane rotation
    is mod 128 — exactly the circulant index (w - stride·b).

    Each 32-row block is built NARROW ([2^steps, 128] roll-doubling,
    then zero-padded): the doubling never wraps (occupied rows b < 2^i
    move to b + 2^i < 2^(i+1) ≤ block height), so the result is
    bit-identical to doubling inside the full [128, 128] — at ~13x
    less roll traffic, which dominated the ~2.5 µs/frame cost."""
    from jax.experimental.pallas import tpu as pltpu

    # GROW-BY-CONCAT build: start from the single tail row and, at each
    # doubling step, lane-roll ONLY the occupied rows and stack the
    # result below — the concat itself performs the old sublane roll's
    # row placement, so step i touches 2^i rows instead of the full
    # block. Same bits (a pure re-layout of the identical rotations);
    # ~4x less roll traffic, which the ablation showed was the single
    # largest per-frame term (tools/microbench_wsola_ablate.py).
    # Build stays f32: Mosaic has no sublane/lane rotate for bf16
    # (tpu.dynamic_rotate on vector<...xbf16> fails to legalize); the
    # consumer (_corr_at) casts the finished circulant to bf16.
    nb = 1 << steps
    blocks = []
    for r in range(3):
        t = th3[r:r + 1]
        for i in range(steps):
            m = 1 << i
            t = jnp.concatenate([t, pltpu.roll(t, stride * m, 1)])
        if nb < 32:
            t = jnp.concatenate([t, jnp.zeros((32 - nb, LANES), F32)])
        blocks.append(t)
    return jnp.concatenate(blocks + [jnp.zeros((32, LANES), F32)])


_BIG = 1 << 30
_DN = (((1,), (1,)), ((), ()))                   # contract both dim-1


def _gsum(f):
    """Σ_r f[a+r, 32r+b] → valid at rows a<3, lanes b<32."""
    from jax.experimental.pallas import tpu as pltpu

    return (f + pltpu.roll(pltpu.roll(f, 7, 0), 96, 1)
            + pltpu.roll(pltpu.roll(f, 6, 0), 64, 1))


def _corr_at(Rah, Ral, Rbh, Rbl, cth, ctl, up, sq1, sq2):
    """Exact correlation at the lags encoded by (cth, ctl, up);
    same op order as the XLA step ⇒ bit-identical corr.

    The hi and lo window planes are STACKED along the row dim so each
    masked circulant needs ONE dot instead of two (4 MXU issues per
    search instead of 8). Every component sum is the same exact
    integer (≤ 2^24, exact in f32 in any grouping), so the regrouped
    adds are bit-identical. All dot operands are bf16 (exact: masks
    are 0/1, halves ≤ 255) — one MXU pass per dot instead of f32's
    six, with the f32 accumulator requested explicitly."""
    BF = jnp.bfloat16
    lo = jnp.bfloat16(1.0) - up
    cth, ctl = cth.astype(BF), ctl.astype(BF)
    cu_h, cl_h = cth * up, cth * lo
    cu_l, cl_l = ctl * up, ctl * lo
    Ra = jnp.concatenate([Rah, Ral]).astype(BF)  # [16, 128]
    Rb = jnp.concatenate([Rbh, Rbl]).astype(BF)

    def dotT(r, c):
        return lax.dot_general(r, c, _DN, preferred_element_type=F32)

    # The hi- and lo-plane circulants stack along the output dim so
    # each window slab needs ONE dot (2 per search instead of 4; MXU
    # issue overhead, not MACs, is what these cost at this size).
    d_cu = dotT(Ra, jnp.concatenate([cu_h, cu_l]))   # [16, 256]
    d_cl = dotT(Rb, jnp.concatenate([cl_h, cl_l]))
    d_cu_h, d_cu_l = d_cu[:, :LANES], d_cu[:, LANES:]
    d_cl_h, d_cl_l = d_cl[:, :LANES], d_cl[:, LANES:]
    hh = _gsum(d_cu_h[:8] + d_cl_h[:8])
    mid = _gsum(d_cu_l[:8] + d_cl_l[:8]
                + d_cu_h[8:] + d_cl_h[8:])
    ll = _gsum(d_cu_l[8:] + d_cl_l[8:])
    # combine_exact inline (ops/exact.py).
    a = F32(65536.0) * hh
    b = F32(256.0) * mid
    s = a + b
    bv = s - a
    e = (a - (s - bv)) + (b - bv)
    num = s + (e + ll)

    denom = jnp.sqrt(sq1 * sq2)
    return jnp.where(denom < F32(1.0), F32(0.0), num / denom)


def _first_argmax_v(corr, idx):
    """Max value + EARLIEST index among ties (= jnp.argmax semantics).
    The value stays a [1, 1] vector — it only ever feeds compares and
    selects, so keeping it out of the scalar core skips one
    vector→scalar transfer per search. The index is extracted (it
    becomes a roll amount)."""
    m = jnp.max(corr, keepdims=True)[:1, :1]
    i = jnp.min(jnp.where(corr == m, idx, jnp.int32(_BIG)))
    return m, i


def _first_argmax_vv(corr, idx):
    """_first_argmax_v with BOTH value and index as [1, 1] vectors
    (the fine search's index feeds only vector-domain arithmetic)."""
    m = jnp.max(corr, keepdims=True)[:1, :1]
    i = jnp.min(jnp.where(corr == m, idx, jnp.int32(_BIG)),
                keepdims=True)[:1, :1]
    return m, i


def _frame_coarse(k, qo_prev, input_count, v, sqv, sv4, consts):
    """Tail prep + coarse search for one frame: everything up to (and
    including) the coarse argmax scalar extraction. Split from
    _frame_fine so the S-interleaved kernel can issue ALL sentences'
    coarse argmax extractions before any fine phase consumes one — the
    argmax→scalar→fine-roll dependency measured ~0.5 µs/frame of pure
    stall when coarse and fine of the same sentence are adjacent
    (tools/microbench_wsola_ablate.py fine_fixedoff/fine_oldscalar)."""
    up4, up1, ai, bi, cc, c_ok = consts
    big = jnp.int32(_BIG)
    nominal = k * AHOP

    vh, vl = split_hi_lo(v)                  # in-register exact split
    th = flat_roll_left(v, qo_prev)[:3]      # [3,128] prev tail
    th_h, th_l = split_hi_lo(th)
    # sq2 = exact tail energy = table entry at the tail's padded
    # position nominal + qo_prev (sqs is shifted by +128). The
    # [1,1]→scalar reduction makes the later sq1*sq2 a scalar
    # broadcast (Mosaic lacks a 2-axis vector broadcast).
    sq2 = jnp.max(flat_roll_left(sqv, qo_prev + MAX_SHIFT
                                 )[0:1, 0:1])

    # --- coarse: 65 lags, stride 4 ----------------------------
    ct4h = _circulant(th_h, 4, 5)
    ct4l = _circulant(th_l, 4, 5)
    sq1c = jnp.concatenate([
        sv4[0:1],
        flat_roll_left(sv4, 32)[0:1],
        flat_roll_left(sv4, 64)[0:1],
        jnp.zeros((5, LANES), F32),
    ])                                       # [a, b] block-3
    corr_c = _corr_at(vh[:8], vl[:8], vh[1:9], vl[1:9],
                      ct4h, ct4l, up4, sq1c, sq2)
    pos_c = nominal + 4 * cc - MAX_SHIFT     # input coords
    valid_c = c_ok & (pos_c >= 0) & \
        (pos_c + FRAME <= input_count)
    corr_c = jnp.where(valid_c, corr_c, -jnp.inf)
    best_corr, bc = _first_argmax_v(corr_c, jnp.where(c_ok, cc, big))
    # none_valid in SCALAR arithmetic (exactly ⇔ every corr_c masked:
    # _corr_at never produces -inf itself — num finite, denom ≥ 1 or
    # forced 0): the valid-c range [lo, hi] over c ∈ [0, 64] is empty.
    lo_c = jnp.maximum(0, (MAX_SHIFT - nominal + 3) // 4)
    hi_c = jnp.minimum(NCOARSE - 1,
                       (input_count - FRAME - nominal + MAX_SHIFT) // 4)
    none_valid = hi_c < lo_c
    best_off = jnp.where(none_valid, 0, 4 * bc - MAX_SHIFT)
    # best_corr stays a [1,1] vector (only ever compared/selected —
    # the -inf⇔none_valid equivalence holds in vector domain too).
    best_corr = jnp.where(best_corr == -jnp.inf, F32(-2.0), best_corr)
    return th_h, th_l, sq2, best_corr, best_off


def _frame_fine(k, input_count, v, sqv, th_h, th_l, sq2,
                best_corr, best_off, win4, consts):
    """Fine search + final offset decision + windowed contribution."""
    qo = _frame_decide(k, input_count, v, sqv, th_h, th_l, sq2,
                       best_corr, best_off, consts)
    return _frame_emit(qo, v, win4)


def _frame_decide(k, input_count, v, sqv, th_h, th_l, sq2,
                  best_corr, best_off, consts):
    """Fine search + final offset decision → qo (win768 index)."""
    up4, up1, ai, bi, cc, c_ok = consts
    big = jnp.int32(_BIG)
    nominal = k * AHOP
    fidx0 = best_off + MAX_SHIFT - 3         # win768 idx, ≥ -3
    f = flat_roll_left(v, (fidx0 + _LOADW) % _LOADW)
    fh, fl = split_hi_lo(f)
    ct1h = _circulant(th_h, 1, 3)
    ct1l = _circulant(th_l, 1, 3)
    sq1f = jnp.concatenate([
        flat_roll_left(sqv, fidx0 + MAX_SHIFT)[0:1],  # ≥ 125
        jnp.zeros((7, LANES), F32),
    ])
    corr_f = _corr_at(fh[:8], fl[:8], fh[1:9], fl[1:9],
                      ct1h, ct1l, up1, sq1f, sq2)
    fpos = fidx0 + bi                        # win768 index
    f_ok = (ai == 0) & (bi < 7) & (bi != 3) & (fpos >= 0) & \
        (fpos <= 2 * MAX_SHIFT) & \
        (nominal + fpos - MAX_SHIFT >= 0) & \
        (nominal + fpos - MAX_SHIFT + FRAME <= input_count)
    corr_f = jnp.where(f_ok, corr_f, -jnp.inf)
    # The whole final decision runs in the VECTOR domain on [1,1]
    # values (fine_corr/bf/improved never become scalars); only the
    # resulting qo is extracted — one vector→scalar transfer per frame
    # instead of three.
    fine_corr, bfi = _first_argmax_vv(corr_f,
                                      jnp.where(ai == 0, bi, big))
    improved = fine_corr > best_corr
    offset = jnp.where(improved, best_off + (bfi - 3), best_off)

    offset = jnp.where(k > 0, offset, 0)
    actual = nominal + offset
    actual = jnp.where(actual + FRAME > input_count,
                       input_count - FRAME, actual)
    actual = jnp.maximum(actual, 0)
    qo = actual - nominal + MAX_SHIFT        # [1,1], ∈ [0, 256]
    return jnp.max(qo)


def _frame_emit(qo, v, win4):
    """Frame fetch + window, given the decided offset. The unsplit
    window IS the frame — no hi/lo reconstruction."""
    frame = flat_roll_left(v, qo)[:4]
    contrib = jnp.trunc(frame * win4)
    c16 = jnp.concatenate([contrib, jnp.zeros((12, LANES), F32)])
    return qo, c16


def _frame_step(k, qo_prev, input_count, v, sqv, sv4, win4, consts):
    """One WSOLA frame decision + windowed contribution, given the
    already-loaded 2048-sample window planes at nominal = k·AHOP.
    Returns (qo, c16): the chosen offset's win768 index (next frame's
    carry) and the [16, 128] windowed frame contribution. Composition
    of _frame_coarse + _frame_fine — the batch kernel issues the same
    two halves phase-split across its S sentences, so both kernels run
    identical per-sentence value code (bit-parity by construction)."""
    th_h, th_l, sq2, best_corr, best_off = _frame_coarse(
        k, qo_prev, input_count, v, sqv, sv4, consts)
    return _frame_fine(k, input_count, v, sqv, th_h, th_l, sq2,
                       best_corr, best_off, win4, consts)


def _load_rolled(ref, pos):
    """2048 samples starting at `pos` (any traced offset ≥ 0):
    aligned 16-row slice + flat roll by the ≤1023 remainder."""
    from jax.experimental import pallas as pl

    q8 = (pos // 1024) * 8
    rem = pos - (pos // 1024) * 1024
    w = ref[pl.ds(pl.multiple_of(q8, 8), 16), :]
    return flat_roll_left(w, rem)


def _load_rolled_rows(ref, pos):
    """_load_rolled for pos ≡ 0 (mod 128) — every nominal-position
    load, since nominal = k·AHOP and AHOP = 128. The flat roll's lane
    component is provably zero, so it reduces to ONE dynamic sublane
    rotate instead of flat_roll_left's four rotates + select (the
    compiler cannot fold those itself: the amounts are traced)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    q8 = (pos // 1024) * 8
    j = (pos - (pos // 1024) * 1024) // 128   # row remainder, 0..7
    w = ref[pl.ds(pl.multiple_of(q8, 8), 16), :]
    return pltpu.roll(w, (16 - j) % 16, 0)


def _make_kernel(hop, OR):
    from jax.experimental import pallas as pl

    def kernel(scal_ref, iv_ref, sqs_ref, sq4_ref, win_ref,
               acc_ref, norm_ref):
        acc_ref[:] = jnp.zeros((OR, LANES), F32)
        norm_ref[:] = jnp.zeros((OR, LANES), F32)
        input_count = scal_ref[0, 0]
        nrun = scal_ref[0, 1]
        win4 = win_ref[:]                            # [4,128] hann(512)
        win16 = jnp.concatenate([win4, jnp.zeros((12, LANES), F32)])
        consts = _consts()

        def body(k, qo_prev):
            nominal = k * AHOP
            v = _load_rolled_rows(iv_ref, nominal)   # [16,128]
            sqv = _load_rolled_rows(sqs_ref, nominal)
            sv4 = _load_rolled(sq4_ref, 32 * k)
            qo, c16 = _frame_step(k, qo_prev, input_count,
                                  v, sqv, sv4, win4, consts)

            # Accumulate at synth position k·hop. Sequential-k adds ARE
            # the C's accumulation order (ascending frames at every
            # output position); the out sums stay exact integers < 2^19
            # (≤8 overlapping int16 contributions), so the caller's
            # single wrap16 equals the C's per-add int16 wrap.
            pos = k * hop
            qo8 = (pos // 1024) * 8
            remo = pos - (pos // 1024) * 1024
            a = acc_ref[pl.ds(pl.multiple_of(qo8, 8), 16), :]
            a = flat_roll_left(a, remo) + c16
            acc_ref[pl.ds(pl.multiple_of(qo8, 8), 16), :] = \
                flat_roll_right(a, remo)
            n = norm_ref[pl.ds(pl.multiple_of(qo8, 8), 16), :]
            n = flat_roll_left(n, remo) + win16
            norm_ref[pl.ds(pl.multiple_of(qo8, 8), 16), :] = \
                flat_roll_right(n, remo)
            return qo

        lax.fori_loop(0, nrun, body, jnp.int32(0))

    return kernel


def _make_batch_kernel(hop, OR, S):
    """S-interleaved kernel: one program advances S sentences' frame
    chains in lockstep (inner s-loop unrolled), so the compiler can
    overlap S independent dependency chains — the per-sentence kernel
    is latency-bound at ~2.5 µs/frame and grid programs serialize, so
    B sequential chains waste the whole machine between dependent ops.
    Frames past a sentence's own nrun are masked: their contribution
    and norm adds are zeroed and the qo carry is frozen, so the OLA
    state and every carried value equal the per-sentence kernel's
    (asserted by tests/test_pallas_wsola.py::test_batch_kernel_parity).
    """
    from jax.experimental import pallas as pl

    def kernel(scal_ref, iv_ref, sqs_ref, sq4_ref, win_ref,
               acc_ref, norm_ref):
        for s in range(S):
            acc_ref[s] = jnp.zeros((OR, LANES), F32)
            norm_ref[s] = jnp.zeros((OR, LANES), F32)
        win4 = win_ref[:]                            # [4,128] hann(512)
        win16 = jnp.concatenate([win4, jnp.zeros((12, LANES), F32)])
        consts = _consts()

        nrun_max = scal_ref[0, 0, 1]
        for s in range(1, S):
            nrun_max = jnp.maximum(nrun_max, scal_ref[0, s, 1])

        def load_rolled_s(ref, s, pos):
            q8 = (pos // 1024) * 8
            rem = pos - (pos // 1024) * 1024
            w = ref[s, pl.ds(pl.multiple_of(q8, 8), 16), :]
            return flat_roll_left(w, rem)

        def load_rows_s(ref, s, pos):
            # pos ≡ 0 (mod 128): pure sublane rotate (_load_rolled_rows).
            from jax.experimental.pallas import tpu as pltpu

            q8 = (pos // 1024) * 8
            j = (pos - (pos // 1024) * 1024) // 128
            w = ref[s, pl.ds(pl.multiple_of(q8, 8), 16), :]
            return pltpu.roll(w, (16 - j) % 16, 0)

        def body(k, qos):
            nominal = k * AHOP
            # Phase 1 — every sentence's loads + coarse search. All S
            # coarse argmax scalar extractions are in flight before any
            # fine phase needs one, so the ~0.5 µs extraction latency
            # amortizes S-fold instead of stalling each chain.
            st = []
            for s in range(S):
                input_count = scal_ref[0, s, 0]
                v = load_rows_s(iv_ref, s, nominal)
                sqv = load_rows_s(sqs_ref, s, nominal)
                sv4 = load_rolled_s(sq4_ref, s, 32 * k)
                st.append((v, sqv) + _frame_coarse(
                    k, qos[s], input_count, v, sqv, sv4, consts))
            # Phase 2 — fine search + final decision for every
            # sentence; the fine argmax scalar extractions all issue
            # before phase 3's fetch rolls consume them (same
            # amortization as phase 1→2).
            qo_all = []
            for s in range(S):
                input_count = scal_ref[0, s, 0]
                v, sqv, th_h, th_l, sq2, best_corr, best_off = st[s]
                qo_all.append(_frame_decide(
                    k, input_count, v, sqv, th_h, th_l, sq2,
                    best_corr, best_off, consts))
            # Phase 3 — frame fetch + OLA accumulate.
            new_qos = []
            for s in range(S):
                run_s = k < scal_ref[0, s, 1]
                qo, c16 = _frame_emit(qo_all[s], st[s][0], win4)
                # Masked lanes must not move the OLA state; qo stays in
                # [0, 2*MAX_SHIFT] for the carried (live) values, and
                # the clip only sanitizes dead-lane garbage so the next
                # step's rolls see a bounded amount.
                c16 = jnp.where(run_s, c16, F32(0.0))
                n_add = jnp.where(run_s, win16, F32(0.0))
                new_qos.append(jnp.where(
                    run_s, jnp.clip(qo, 0, 2 * MAX_SHIFT), qos[s]))

                pos = k * hop
                qo8 = (pos // 1024) * 8
                remo = pos - (pos // 1024) * 1024
                a = acc_ref[s, pl.ds(pl.multiple_of(qo8, 8), 16), :]
                a = flat_roll_left(a, remo) + c16
                acc_ref[s, pl.ds(pl.multiple_of(qo8, 8), 16), :] = \
                    flat_roll_right(a, remo)
                n = norm_ref[s, pl.ds(pl.multiple_of(qo8, 8), 16), :]
                n = flat_roll_left(n, remo) + n_add
                norm_ref[s, pl.ds(pl.multiple_of(qo8, 8), 16), :] = \
                    flat_roll_right(n, remo)
            return tuple(new_qos)

        lax.fori_loop(0, nrun_max, body, (jnp.int32(0),) * S)

    return kernel


def batch_group_size(SP: int, S4P: int, out_size: int) -> int:
    """Sentences per program: bounded by VMEM (pallas double-buffers
    every block across grid programs, so the working set is ~2x the
    block bytes), capped at 8."""
    OR = _roundup(out_size + 2048, 1024) // LANES
    per = (2 * SP + S4P + 2 * OR * LANES) * 4   # bytes, f32
    budget = 48 << 20    # of the 100 MB scoped VMEM (vmem_params);
    #                      S beyond 8 measured slower (S=16: +7%)
    return max(1, min(8, budget // (2 * per)))


@functools.partial(
    jax.jit, static_argnames=("hop", "out_size", "S", "interpret"))
def wsola_frames_batch(inp, sqs, sq4, input_count, nrun,
                       *, hop, out_size, S, interpret=False):
    """wsola_frames for a [B, ...] batch: grid of ceil(B/S) programs,
    each interleaving S sentences (see _make_batch_kernel). Same input
    planes as wsola_frames with a leading batch axis; B is padded to a
    multiple of S with zero rows (nrun=0 ⇒ fully masked). Returns
    (acc, norm) [B, out_size], bit-identical to a per-sentence map of
    wsola_frames."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ctts_tpu.ops.luts import hann

    B, SP = inp.shape
    S4P = sq4.shape[1]
    assert SP % 1024 == 0 and S4P % 1024 == 0 and sqs.shape[1] == SP
    OR = _roundup(out_size + 2048, 1024) // LANES

    Bp = -(-B // S) * S
    if Bp != B:
        padn = Bp - B
        inp = jnp.concatenate([inp, jnp.zeros((padn, SP), F32)])
        sqs = jnp.concatenate([sqs, jnp.zeros((padn, SP), F32)])
        sq4 = jnp.concatenate([sq4, jnp.zeros((padn, S4P), F32)])
        input_count = jnp.concatenate(
            [input_count, jnp.zeros(padn, input_count.dtype)])
        nrun = jnp.concatenate([nrun, jnp.zeros(padn, nrun.dtype)])

    kern = _make_batch_kernel(hop, OR, S)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    scal = jnp.stack(
        [input_count.astype(jnp.int32), nrun.astype(jnp.int32)], axis=1,
    ).reshape(Bp // S, S, 2)
    win4 = hann(FRAME).reshape(4, LANES)
    grid = (Bp // S,)
    acc, norm = pl.pallas_call(
        kern,
        grid=grid,
        out_shape=(out_struct((Bp, OR, LANES), F32, inp, sqs),
                   out_struct((Bp, OR, LANES), F32, inp, sqs)),
        in_specs=[smem((1, S, 2), lambda i: (i, 0, 0)),
                  vmem((S, SP // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((S, SP // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((S, S4P // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((4, LANES), lambda i: (0, 0))],
        out_specs=(vmem((S, OR, LANES), lambda i: (i, 0, 0)),
                   vmem((S, OR, LANES), lambda i: (i, 0, 0))),
        interpret=interpret,
        compiler_params=vmem_params(interpret),
    )(scal, inp.reshape(Bp, -1, LANES),
      sqs.reshape(Bp, -1, LANES), sq4.reshape(Bp, -1, LANES), win4)
    return (acc.reshape(Bp, -1)[:B, :out_size],
            norm.reshape(Bp, -1)[:B, :out_size])


@functools.partial(
    jax.jit, static_argnames=("hop", "out_size", "interpret"))
def wsola_frames(inp, sqs, sq4, input_count, nrun,
                 *, hop, out_size, interpret=False):
    """Run the WSOLA frame chain for ONE sentence (vmap for a batch).

    inp: the padded f32 input plane (zeros(128) ++ inp ++ zeros),
    length a multiple of 1024 and ≥ len(inp) + 2048 (the final
    nominal's window load reads 2048 samples); the kernel splits
    windows into exact bf16 halves in-register. sqs[p] = sliding
    OVERLAP-energy at padded position p-128 (the +128 shift keeps the
    k=0 tail-energy load in-bounds); sq4[q] = energy at padded position
    4q. input_count/nrun: dynamic scalars (audio samples, prefix run
    count). Returns (acc, norm) [out_size] — the OLA accumulators in
    the C's frame order: acc holds exact-integer sums awaiting one
    wrap16, norm the f32 window sums.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ctts_tpu.ops.luts import hann

    SP = inp.shape[0]
    S4P = sq4.shape[0]
    assert SP % 1024 == 0 and S4P % 1024 == 0 and sqs.shape[0] == SP
    OR = _roundup(out_size + 2048, 1024) // LANES

    kern = _make_kernel(hop, OR)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    scal = jnp.stack([input_count.astype(jnp.int32),
                      nrun.astype(jnp.int32)])[None, :]
    win4 = hann(FRAME).reshape(4, LANES)
    acc, norm = pl.pallas_call(
        kern,
        out_shape=(out_struct((OR, LANES), F32, inp, sqs),
                   out_struct((OR, LANES), F32, inp, sqs)),
        in_specs=[smem((1, 2)),
                  vmem((SP // LANES, LANES)),
                  vmem((SP // LANES, LANES)), vmem((S4P // LANES, LANES)),
                  vmem((4, LANES))],
        out_specs=(vmem((OR, LANES)), vmem((OR, LANES))),
        interpret=interpret,
        compiler_params=vmem_params(interpret),
    )(scal, inp.reshape(-1, LANES),
      sqs.reshape(-1, LANES), sq4.reshape(-1, LANES), win4)
    return acc.reshape(-1)[:out_size], norm.reshape(-1)[:out_size]
