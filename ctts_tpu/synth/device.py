"""JAX device executor: lowers a SynthesisPlan to dense arrays and runs
the whole waveform pipeline as one jitted XLA program.

Execution model (SURVEY.md §7, TPU-first):

- The voice bank lives on device as a padded [N_units, UBUF] f32 tensor
  with per-unit lengths and host-precomputed exact RMS gains.
- A sentence is a sequence of *regions* (the spans between the reference's
  word_start marks). Region composition — RMS gain, boundary pitch
  smoothing, energy matching, DC removal, fades, raised-cosine crossfade
  overlap — runs as a `lax.scan` over unit slots (the boundary DSP is
  sequential by construction: each unit is smoothed against the already-
  composed tail). Batch parallelism comes from vmap over sentences.
- Region DSP (silence compaction, phrase-intonation contour OLA, energy
  ramp, tail fades) is vmapped over regions.
- Sentence assembly overlap-adds regions at cumsum offsets (lengths are
  dynamic after silence removal); WSOLA runs as a frame scan when
  speed ≠ 1.

Region buffers carry a left margin of WIN + CFMAX samples so crossfades
that reach back into the preceding pause (possible when a unit is shorter
than the next crossfade) and pitch-analysis windows never index out of
bounds; the margin content overlap-adds into the previous pause at
assembly, exactly like the C's flat buffer.

Known approximations vs the oracle (each bounded by tests):
- XLA reduction order differs from the C's sequential f32 loops; discrete
  decisions (pitch lag argmax, WSOLA offsets) can flip on float near-ties.
- Pitch/energy analysis windows that extend past the current region's
  content see zeros (the preceding pause) instead of the previous
  region's tail; with default configs the window fits inside the region.
- analysis/boundary lengths use the pre-silence-removal running length
  (the true length is dynamic); the cap only binds in the first ~0.3 s.
"""

from __future__ import annotations

import dataclasses
import functools
import os
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax

from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.ops import device_ops as dops
from ctts_tpu.ops.luts import fade_in_gain, fade_out_gain
from ctts_tpu.ops.quant import q16, trunc16, wrap16
from ctts_tpu.ops.wsola_jax import time_stretch_device
from ctts_tpu.plan.compiler import OpKind, SynthesisPlan
from ctts_tpu.text.prosody import PhraseType

F32 = jnp.float32


@dataclasses.dataclass(frozen=True)
class PlanDims:
    """Static bucket dimensions; one XLA specialization per value."""

    U: int        # unit slots
    R: int        # region slots
    FD: int       # in-region fade slots
    WREG: int     # region buffer width (margin + content + right pad)
    MARGIN: int   # left margin (= WIN + CFMAX)
    UBUF: int     # unit bank width
    WIN: int      # pitch-analysis window width
    CFMAX: int    # max crossfade samples
    SMAX: int     # sentence buffer width
    OMAX: int     # WSOLA output width
    CONTW: int    # region-content DSP width (contour/energy/tail work)
    FADEW: int    # in-region fade patch width (≥ max fade_out length)
    fade_in_samples: int
    min_silence_samples: int
    remove_dc: bool
    stretch: bool    # speed != 1.0: compile the WSOLA branch, OMAX > SMAX
    synth_hop: int   # static WSOLA synthesis hop (0 when not stretching)
    contour_drift: int  # ceil(256 * max_pitch_change) + 2 (resample bound)
    FADE2W: int = 128  # region tail-fade window width (≥ max fade_after)
    # Boundary-shift candidate slots: units whose host-known gates
    # (smooth & boundary>0 & prev_ok & n≥200 & shift_region>0) allow a
    # pitch shift. The tail-pitch search and shift/blend resample run on
    # these rows only (~16% of slots at the bench corpus) instead of all
    # U — the device-side gates (voiced & jump) are a subset.
    NSHIFT: int = 16
    # compose_refine (default): fixed-point two-pass compose — light
    # placement scans with ALL boundary DSP batched (one U-wide grouped
    # pitch conv per trip instead of one conv per scan step), iterated
    # until the modified unit heads are bit-stable. Head dependencies are
    # strictly causal (unit k's analysis window sees only units j<k), so
    # the iteration converges to exactly the sequential scan's result in
    # chain-depth+1 trips (typically 2). False falls back to the in-step
    # scan (exact_compose) below.
    compose_refine: bool = True
    # exact_compose: single scan with in-step boundary DSP — each
    # boundary's analysis window includes prior units' head mods,
    # matching the C exactly but serializing one pitch conv per unit
    # slot. The reference semantics ground truth for the refine path.
    exact_compose: bool = True


def _compose_backend() -> str:
    """Placement backend: the Pallas kernel (ops/pallas/compose.py) runs
    the unit loop in-kernel and beats the vmapped XLA scan 3.5x on TPU;
    the scan remains the portable lowering (CPU tests, any backend
    without Mosaic). Both produce identical bits."""
    choice = os.environ.get("CTTS_COMPOSE_BACKEND", "auto")
    if choice != "auto":
        return choice
    return "pallas" if jax.default_backend() != "cpu" else "xla"


def _roundup(x: int, m: int = 128) -> int:
    return -(-x // m) * m


# The whole-sentence Pallas kernels (compose/compact/assemble) keep the
# full [R*WREG] buffer resident in VMEM (~2x the buffer: input + output
# + apron, double-buffered). They request a 100 MB scoped-VMEM budget
# (ops/pallas/__init__.py vmem_params — v5e cores have 128 MB); buckets
# past the cap below (~30 MB resident, leaving Mosaic scratch headroom)
# take the bit-identical XLA lowerings instead. This covers both the
# acceptance floor (R=16*WREG=65536 + U*ubuf ~ 2.8M f32) and the
# paragraph bucket (R*WREG = 2M f32), which the old 16 MB default
# rejected.
_PALLAS_SENT_F32_CAP = 3 << 20  # 12 MB buffer -> <=~30 MB resident


def _pallas_sent_fits(tot_f32: int) -> bool:
    return tot_f32 <= _PALLAS_SENT_F32_CAP


def _next_pow2(x: int, lo: int) -> int:
    n = lo
    while n < x:
        n *= 2
    return n


def _omax_for(smax: int, stretch: bool, synth_hop: int) -> int:
    """WSOLA output-buffer width for a bucket. Hop-aware: the output can
    hold at most num_frames·synth_hop + FRAME samples where num_frames ≤
    smax/128, so speed>1 buckets (hop<128) get buffers *smaller* than
    SMAX instead of the old worst-case 2·SMAX — shrinking the OLA scan
    carries and the device→host transfer ~3× at speed 1.5."""
    if not stretch:
        return smax
    omax = _roundup((smax // 128 + 2) * max(synth_hop, 1) + 512 + 2048)
    # Speeds in (0.99, 1.01) (hop 126-129) pass the input through
    # unstretched (ctts.c:3497-3503) — the buffer must hold SMAX.
    if synth_hop >= 126:
        omax = max(omax, _roundup(smax + 2048))
    return omax


def bucket_dims(d: PlanDims, floor: Optional[dict] = None) -> PlanDims:
    """Round dimensions up to coarse buckets so XLA specializations are
    shared across sentences (compile once per bucket, not per sentence).
    `floor` raises minimums (e.g. {"U": 32, "SMAX": 131072}) so a whole
    corpus lands in one bucket."""
    floor = floor or {}
    if "SMAX" in floor:
        # An explicit floor means the serving operator already chose
        # the bucket coarseness; honor it at 16384 granularity instead
        # of pow2-doubling past it (a 109k-sample corpus under a 131072
        # pow2 bucket paid ~12% dead padding in every SMAX-proportional
        # stage: pack, contour workspace, assembly, OMAX).
        smax = _roundup(max(d.SMAX, floor["SMAX"]), 16384)
    else:
        smax = _next_pow2(d.SMAX, 16384)
    # WIN/CFMAX derive from the plan's max crossfade, so short sentences
    # would otherwise land in their own buckets (MARGIN differs) and
    # fragment a batch into serial dispatches. Widening them is safe:
    # every analysis window / crossfade op masks by the actual lengths.
    win_b = _next_pow2(max(d.WIN, floor.get("WIN", 1024)), 1024)
    cfmax_b = _next_pow2(max(d.CFMAX, floor.get("CFMAX", 1024)), 1024)
    margin_b = win_b + cfmax_b
    # The row must still hold the (possibly larger) margin + content.
    wreg = _next_pow2(
        max(d.WREG, floor.get("WREG", 0), margin_b + d.CONTW), 16384
    )
    return dataclasses.replace(
        d,
        U=_next_pow2(max(d.U, floor.get("U", 0)), 8),
        R=_next_pow2(max(d.R, floor.get("R", 0)), 4),
        WIN=win_b,
        CFMAX=cfmax_b,
        MARGIN=margin_b,
        FD=_next_pow2(max(d.FD, floor.get("FD", 0)), 4),
        WREG=wreg,
        CONTW=min((_roundup(max(d.CONTW, floor["CONTW"]), 4096)
                   if "CONTW" in floor else
                   _next_pow2(max(d.CONTW, 0), 4096)),
                  wreg - margin_b),
        SMAX=smax,
        OMAX=_omax_for(smax, d.stretch, d.synth_hop),
        FADE2W=_next_pow2(max(d.FADE2W, floor.get("FADE2W", 0)), 128),
        # Floored at 16 so typical sentences (bench max: 11 candidates)
        # share one bucket; capped at the (bucketed) unit-slot count.
        NSHIFT=min(_next_pow2(max(d.NSHIFT, floor.get("NSHIFT", 16)), 8),
                   _next_pow2(max(d.U, floor.get("U", 0)), 8)),
    )


@dataclasses.dataclass
class DevicePlan:
    dims: PlanDims
    arrays: dict
    speed: float


def intonation_scalars(inton, word_index: int, total_words: int,
                       max_pitch_change: float):
    """Host scalar half of apply_phrase_intonation (ctts.c:2736-2840):
    returns (ws, we, peak, es, ee, qfinal, energy_active)."""
    f = np.float32

    def clamp(p):
        lo, hi = f(1.0) - f(max_pitch_change), f(1.0) + f(max_pitch_change)
        return f(min(max(f(p), lo), hi))

    denom = total_words - 1 if total_words > 1 else 1
    phrase_pos = f(word_index) / f(denom)
    is_final = word_index == total_words - 1
    is_penult = (word_index == total_words - 2) and total_words > 1

    peak_pos = f(inton.peak_position)
    p_start = f(inton.pitch_start)
    p_end = f(inton.pitch_end)
    p_peak = f(inton.pitch_peak)

    if phrase_pos <= peak_pos:
        t = phrase_pos / peak_pos
        t = t * t * (f(3.0) - f(2.0) * t)
        pf = p_start + (p_peak - p_start) * t
    else:
        t = (phrase_pos - peak_pos) / (f(1.0) - peak_pos)
        t = t * t * (f(3.0) - f(2.0) * t)
        pf = p_peak + (p_end - p_peak) * t
    pf = clamp(pf)

    ws = clamp(pf * f(0.98))
    we = clamp(pf * f(1.02))
    qfinal = False

    if inton.type == PhraseType.INTERROGATIVE and (is_final or is_penult):
        if is_final:
            ws = clamp(pf * f(0.95))
            we = clamp(p_end)
            qfinal = True
        else:
            ws = clamp(pf * f(0.98))
            we = clamp(pf * f(1.05))
    elif inton.type == PhraseType.EXCLAMATORY:
        if word_index == 0:
            ws = clamp(p_peak)
            we = clamp(pf)
        elif is_final:
            ws = clamp(pf)
            we = clamp(p_end)
        else:
            ws = clamp(pf * f(1.02))
            we = clamp(pf * f(0.98))
    elif inton.type == PhraseType.CONTINUATION and is_final:
        ws = clamp(pf * f(0.96))
        we = clamp(p_end)
    else:
        ws = clamp(pf * f(0.98))
        we = clamp(pf * f(1.02))
        if is_final:
            we = clamp(p_end)

    peak = clamp(p_peak)

    ef = f(inton.energy_factor)
    energy_active = abs(ef - f(1.0)) > f(0.01)
    es, ee = ef, ef
    if inton.type == PhraseType.EXCLAMATORY and word_index == 0:
        es, ee = ef * f(1.1), ef * f(0.95)

    return (float(ws), float(we), float(peak), float(es), float(ee),
            qfinal, bool(energy_active))


@dataclasses.dataclass
class WalkedPlan:
    """Host lowering intermediate: the plan walked into region/unit/fade
    records, before padding into dims-shaped arrays. Built once per plan
    (walk_plan) and reusable across dims (fill_device_plan) so the batch
    path does not lower every plan twice."""

    plan: SynthesisPlan
    units: list
    regions: list
    fades: list
    cf_max: int
    margin: int
    win: int
    cfmax: int
    max_region_len: int
    total_len: int
    stretch: bool
    synth_hop: int
    refine_trips: int = 0  # head-mod chain depth (fixed-point bodies)


def walk_plan(plan: SynthesisPlan, db: VoiceDatabase) -> WalkedPlan:
    """Walk a compiled plan's ops into region-relative unit/fade records
    (the dims-independent half of lowering)."""
    unit_ids = {op.unit_idx for op in plan.ops if op.kind == OpKind.UNIT}
    unit_lens = {i: int(db.index[i]["sample_count"]) for i in unit_ids}

    cf_max = max([op.crossfade_samples for op in plan.ops
                  if op.kind == OpKind.UNIT] + [1])
    # 1024-sample (8x128 tile) alignment: Pallas DMA shapes must be
    # sublane-tile aligned.
    win = _roundup(max(2 * cf_max, 1024), 1024)
    cfmax = _roundup(cf_max, 1024)
    margin = win + cfmax

    # --- walk ops into regions -------------------------------------------
    units, regions, fades = [], [], []
    cur = {"len": 0, "do_dsp": False, "word_index": 0, "pause_after": 0,
           "fade_after": 0}
    cursor = 0
    # static running sentence length (pre-removal proxy); starts at the
    # plan's offset so sentence-split rows bake the same caps as unsplit
    buf_total = plan.buf_total0
    post_dsp = False

    def close_region():
        nonlocal cur, cursor, post_dsp
        cur["len"] = cursor
        regions.append(cur)
        cur = {"len": 0, "do_dsp": False, "word_index": 0, "pause_after": 0,
               "fade_after": 0}
        cursor = 0
        post_dsp = False

    for oi, op in enumerate(plan.ops):
        r = len(regions)
        if op.kind == OpKind.UNIT:
            n = unit_lens[op.unit_idx]
            if op.after_word_boundary or buf_total == 0:
                cf_in, fade_in = 0, True
            elif op.crossfade_samples == 0:
                cf_in, fade_in = 0, False
            else:
                cf_in = min(op.crossfade_samples, buf_total, n)
                fade_in = False
            off = cursor - cf_in
            boundary = op.crossfade_samples
            units.append({
                "id": op.unit_idx, "region": r, "off": off,
                "boundary": boundary, "cf_in": cf_in, "fade_in": fade_in,
                "smooth": op.smooth_boundary and buf_total > 0,
                "analysis": min(2 * boundary, buf_total // 2, n // 2),
                "boundary_len": min(boundary, buf_total, n),
                "shift_region": min(boundary, n // 4),
                "prev_ok": buf_total >= 200,
            })
            cursor = off + n
            buf_total += n - cf_in
        elif op.kind == OpKind.SILENCE:
            nxt = plan.ops[oi + 1] if oi + 1 < len(plan.ops) else None
            closes = nxt is not None and nxt.kind == OpKind.MARK_WORD
            if post_dsp or closes:
                # Trailing pause (word pause, or a sentence-end pause
                # right before the region closes): emit as an assembly
                # gap instead of in-region zeros — keeps sentence-final
                # regions (punctuation pauses are ~3x word pause) out of
                # the region-content width that sizes CONTW/WREG.
                cur["pause_after"] += op.n_samples
            else:
                cursor += op.n_samples
            buf_total += op.n_samples
        elif op.kind == OpKind.FADE_TAIL:
            if post_dsp:
                cur["fade_after"] = op.fade_samples
            else:
                fades.append((r, cursor, op.fade_samples))
        elif op.kind == OpKind.WORD_DSP:
            cur["do_dsp"] = True
            cur["word_index"] = op.word_index
            post_dsp = True
        elif op.kind == OpKind.MARK_WORD:
            close_region()
    close_region()

    max_region_len = max([r["len"] for r in regions] + [1])

    # Head-mod chain depth (static): the fixed-point compose needs
    # depth_k bodies before unit k's head is final. Only boundary-DSP
    # units (smooth & boundary>0) ever change their head across trips;
    # crossfade mixing is in-scan sequential and therefore exact within
    # each trip given correct heads. A modifying unit j perturbs
    # [off_j, off_j + m_j) (its mix + energy + pitch-shift reach); unit
    # k's analysis window is [off_k + cf_k - win, off_k + cf_k) in the
    # same region, so depth_k = 1 + max depth of modifying units visible
    # there. Conservative: runtime gates (`voiced`, RMS floors) can only
    # skip mods, never extend reach, so the trip count always suffices.
    depth_by_region: dict = {}
    refine_trips = 0
    for u in units:
        modifies = u["smooth"] and u["boundary"] > 0
        m = max(u["cf_in"], u["boundary_len"], u["shift_region"])
        lo = u["off"] + u["cf_in"] - win
        hi = u["off"] + u["cf_in"]
        d = 0
        if modifies:
            d = 1
            for off_j, m_j, d_j in depth_by_region.get(u["region"], []):
                if d_j > 0 and off_j + m_j > lo and off_j < hi:
                    d = max(d, 1 + d_j)
        depth_by_region.setdefault(u["region"], []).append(
            (u["off"], m, d)
        )
        refine_trips = max(refine_trips, d)

    from ctts_tpu.ops.wsola_jax import synthesis_hop_for_speed

    stretch = bool(np.float32(plan.speed) != np.float32(1.0))
    synth_hop = synthesis_hop_for_speed(plan.speed) if stretch else 0
    total_len = sum(r["len"] + r["pause_after"] for r in regions)
    return WalkedPlan(
        plan=plan, units=units, regions=regions, fades=fades,
        cf_max=cf_max, margin=margin, win=win, cfmax=cfmax,
        max_region_len=max_region_len, total_len=total_len,
        stretch=stretch, synth_hop=synth_hop, refine_trips=refine_trips,
    )


def _shift_candidates(units, db) -> list:
    """Unit slots whose host-known gates allow a boundary pitch shift
    (the do_smooth gates of ctts.c:1990-2001 minus the device-side
    voiced/jump pitch tests)."""
    lens = db.index["sample_count"]
    return [
        k for k, u in enumerate(units)
        if u["smooth"] and u["boundary"] > 0 and u["prev_ok"]
        and u["shift_region"] > 0 and int(lens[u["id"]]) >= 200
    ]


def derive_dims(w: WalkedPlan, db: VoiceDatabase) -> PlanDims:
    """Minimal per-sentence static dimensions for a walked plan."""
    cfg = w.plan.config
    bank_w = _roundup(int(db.index["sample_count"].max()), 1024)
    smax = _roundup(max(w.total_len, 1024))
    return PlanDims(
        NSHIFT=max(_roundup(len(_shift_candidates(w.units, db)), 8), 8),
        U=max(len(w.units), 1),
        R=max(len(w.regions), 1),
        FD=max(len(w.fades), 1),
        WREG=_roundup(w.margin + w.max_region_len + bank_w + w.cfmax, 1024),
        MARGIN=w.margin,
        UBUF=bank_w,
        WIN=w.win,
        CFMAX=w.cfmax,
        SMAX=smax,
        OMAX=_omax_for(smax, w.stretch, w.synth_hop),
        CONTW=min(_next_pow2(max(w.max_region_len, 1024), 1024),
                  _roundup(w.margin + w.max_region_len + bank_w + w.cfmax,
                           1024) - w.margin),
        FADEW=min(_roundup(max([f[2] for f in w.fades] + [1]), 128),
                  w.margin),
        FADE2W=_next_pow2(
            max([r["fade_after"] for r in w.regions] + [1]), 128
        ),
        fade_in_samples=w.plan.fade_in_samples,
        min_silence_samples=w.plan.min_silence_samples,
        remove_dc=bool(cfg.remove_dc_offset),
        stretch=w.stretch,
        synth_hop=w.synth_hop,
        contour_drift=min(
            int(np.ceil(256 * abs(cfg.max_pitch_change))) + 2, 256
        ),
    )


def fill_device_plan(w: WalkedPlan, db: VoiceDatabase,
                     dims: PlanDims) -> DevicePlan:
    """Pad a walked plan into dims-shaped arrays (dims-dependent half)."""
    plan, units, regions, fades = w.plan, w.units, w.regions, w.fades
    cfg = plan.config
    bank_w = _roundup(int(db.index["sample_count"].max()), 1024)
    assert dims.stretch == w.stretch, "speed class must match the bucket"
    assert dims.synth_hop == w.synth_hop, \
        "synthesis hop must match the bucket"
    assert len(units) <= dims.U and len(regions) <= dims.R
    assert len(fades) <= dims.FD
    assert dims.MARGIN >= 2 * w.cf_max, "crossfade exceeds margin"
    assert dims.UBUF >= bank_w
    assert dims.CONTW >= w.max_region_len, "region exceeds CONTW"
    assert dims.CONTW <= dims.WREG - dims.MARGIN
    assert all(f[2] <= dims.FADEW for f in fades), "fade exceeds FADEW"
    assert dims.FADEW <= dims.MARGIN

    a = {}
    a["unit_id"] = np.full(dims.U, -1, np.int32)
    for name, dt in [("unit_region", np.int32), ("unit_off", np.int32),
                     ("unit_boundary", np.int32), ("unit_cf_in", np.int32),
                     ("unit_fade_in", np.bool_), ("unit_smooth", np.bool_),
                     ("unit_analysis", np.int32),
                     ("unit_boundary_len", np.int32),
                     ("unit_shift_region", np.int32),
                     ("unit_prev_ok", np.bool_)]:
        a[name] = np.zeros(dims.U, dt)

    for k, u in enumerate(units):
        a["unit_id"][k] = u["id"]
        a["unit_region"][k] = u["region"]
        a["unit_off"][k] = u["off"] + dims.MARGIN
        a["unit_boundary"][k] = u["boundary"]
        a["unit_cf_in"][k] = u["cf_in"]
        a["unit_fade_in"][k] = u["fade_in"]
        a["unit_smooth"][k] = u["smooth"]
        a["unit_analysis"][k] = u["analysis"]
        a["unit_boundary_len"][k] = u["boundary_len"]
        a["unit_shift_region"][k] = u["shift_region"]
        a["unit_prev_ok"][k] = u["prev_ok"]

    a["region_len"] = np.zeros(dims.R, np.int32)
    a["region_do_dsp"] = np.zeros(dims.R, np.bool_)
    a["region_remove"] = np.zeros(dims.R, np.bool_)
    a["region_pause"] = np.zeros(dims.R, np.int32)
    a["region_fade_after"] = np.zeros(dims.R, np.int32)
    a["region_contour"] = np.tile(
        np.array([1, 1, 1, 1, 1], np.float32), (dims.R, 1)
    )
    a["region_qfinal"] = np.zeros(dims.R, np.bool_)
    a["region_energy"] = np.zeros(dims.R, np.bool_)
    a["region_active"] = np.zeros(dims.R, np.bool_)

    wc = plan.prosody.word_count
    for r, reg in enumerate(regions):
        a["region_len"][r] = reg["len"]
        a["region_active"][r] = True
        a["region_do_dsp"][r] = reg["do_dsp"]
        a["region_remove"][r] = (
            reg["do_dsp"] and cfg.remove_word_silence
            and reg["len"] > plan.min_silence_samples
        )
        a["region_pause"][r] = reg["pause_after"]
        a["region_fade_after"][r] = reg["fade_after"]
        if reg["do_dsp"] and wc > 0:
            ws, we, peak, es, ee, qfinal, eactive = intonation_scalars(
                plan.prosody.intonation, reg["word_index"], wc,
                cfg.max_pitch_change,
            )
            a["region_contour"][r] = [ws, we, peak, es, ee]
            a["region_qfinal"][r] = qfinal
            a["region_energy"][r] = eactive

    a["fade_region"] = np.zeros(dims.FD, np.int32)
    a["fade_pos"] = np.full(dims.FD, -1, np.int32)
    a["fade_len"] = np.zeros(dims.FD, np.int32)
    for k, (r, pos, flen) in enumerate(fades):
        a["fade_region"][k] = r
        a["fade_pos"][k] = pos
        a["fade_len"][k] = flen

    cands = _shift_candidates(units, db)
    assert len(cands) <= dims.NSHIFT, "shift candidates exceed NSHIFT"
    a["shift_slots"] = np.full(dims.NSHIFT, -1, np.int32)
    a["shift_slots"][: len(cands)] = cands

    a["threshold"] = np.float32(cfg.silence_threshold)
    a["speed"] = np.float32(plan.speed)
    a["refine_trips"] = np.int32(w.refine_trips)

    return DevicePlan(dims=dims, arrays=a, speed=plan.speed)


def build_device_plan(plan: SynthesisPlan, db: VoiceDatabase,
                      dims: Optional[PlanDims] = None) -> DevicePlan:
    """Lower a compiled plan to padded arrays. With `dims=None`, minimal
    per-sentence dimensions are derived; pass bucketed dims for batching.
    (Batch callers should walk_plan once and fill_device_plan per bucket.)"""
    w = walk_plan(plan, db)
    if dims is None:
        dims = derive_dims(w, db)
    return fill_device_plan(w, db, dims)


class DeviceVoice:
    """Device-resident voice bank: padded units, lengths, exact RMS gains.

    The normalize_rms gain (ctts.c:1709-1727) depends only on the unit
    audio and the fixed target, so it is precomputed exactly (f64
    accumulation, like the C's double) on host, once per database.
    """

    def __init__(self, db: VoiceDatabase, target_rms: float = 3000.0):
        units, lengths = db.to_device_arrays()
        n = units.shape[0]
        gains = np.ones(n, np.float32)
        for i in range(n):
            s = db.unit_samples(i).astype(np.float64)
            if s.shape[0] == 0:
                continue
            rms = np.float32(np.sqrt(np.sum(s * s) / s.shape[0]))
            if rms < np.float32(1.0):
                continue
            g = np.float32(target_rms) / rms
            gains[i] = min(max(g, np.float32(0.1)), np.float32(3.0))
        self.bank = jnp.asarray(units.astype(np.float32))
        self.lengths = jnp.asarray(lengths.astype(np.int32))
        self.gains = jnp.asarray(gains)
        self.ubuf = units.shape[1]




def shared_plan_values(arrays, bank_lens, dims: PlanDims) -> dict:
    """Batch-global distinct-value tables for the fade-curve selects in
    build_core (host-side; pass unbatched — in_axes=None — under vmap).

    The crossfade/fade-in gain curves depend only on one scalar each
    (crossfade length; min(fade_in_samples, unit length)), and a batch
    holds few distinct values of either — so the core evaluates the LUT
    curves once per distinct value and row-selects, instead of paying a
    full-width per-unit LUT gather (53 ms/batch-64). Values are stored
    max(·,1)-normalized and 0-padded to a multiple of 8 (0 never matches
    a normalized value, so padding rows select nothing).

    `arrays` may be a single plan's arrays or a stacked batch of them."""
    cf = np.maximum(np.asarray(arrays["unit_cf_in"]).reshape(-1), 1)
    cfv = np.unique(cf).astype(np.int32)
    uid = np.asarray(arrays["unit_id"]).reshape(-1)
    lens = np.asarray(bank_lens)
    n = np.where(uid >= 0, lens[np.maximum(uid, 0)], 0)
    fades = np.maximum(np.minimum(dims.fade_in_samples, n), 1)
    fv = np.unique(fades).astype(np.int32)

    def pad8(v):
        m = max(8, -(-len(v) // 8) * 8)
        out = np.zeros(m, np.int32)
        out[: len(v)] = v
        return out

    return {"cf_values": pad8(cfv), "fade_values": pad8(fv)}


@functools.lru_cache(maxsize=64)
def build_core(dims: PlanDims, ubuf: int, stage: str = "full"):
    """Build the (unjitted) synthesis core for one dims specialization.
    Signature: core(bank, bank_lens, gains, arrays) -> (out, out_len).

    `stage` truncates the pipeline for profiling (tools/profile_stages.py):
    the core returns a checksum of the stage output instead of audio, so
    stage-to-stage wall-clock deltas attribute device time. "full" is the
    production pipeline."""

    def _ck(x):
        if os.environ.get("CTTS_STAGE_RAW") == "1":
            # Debug lowering: return the stage's full intermediate so a
            # harness can diff backends (tools/stage_diff.py). The
            # default is a checksum — cross-backend UNSTABLE (f32 sum
            # order), only meaningful as a same-backend timing anchor.
            return x.astype(F32), jnp.int32(0)
        return jnp.sum(x.astype(F32)).astype(F32), jnp.int32(0)

    MARGIN, WIN, CFMAX = dims.MARGIN, dims.WIN, dims.CFMAX
    # Region DSP (contour/energy/tail-fade) only ever touches the first
    # CONTW ≤ WREG-MARGIN content samples (CONTW covers the longest
    # region); working on the slice shrinks the contour intermediates.
    content_w = dims.CONTW
    max_frames = max((content_w - 256) // 128 + 2, 1)

    def unit_step_fn(bank, bank_lens, gains, ar):
        def unit_step(bufs, k):
            uid = ar["unit_id"][k]
            active = uid >= 0
            uid_c = jnp.maximum(uid, 0)
            r = ar["unit_region"][k]
            off = ar["unit_off"][k]
            n = bank_lens[uid_c]
            x = q16(bank[uid_c] * gains[uid_c])   # [UBUF]; pads stay 0
            iu = jnp.arange(ubuf)

            # --- boundary pitch smoothing (smooth_pitch_boundary,
            #     ctts.c:1979-2024) ------------------------------------
            # The C analyzes the buffer tail at buf.count, which is the
            # unit's start PLUS the crossfade overlap (off + cf_in).
            cf_in = ar["unit_cf_in"][k]
            win = lax.dynamic_slice(bufs[r], (off + cf_in - WIN,), (WIN,))
            analysis = ar["unit_analysis"][k]
            do_boundary = ar["unit_smooth"][k] & (ar["unit_boundary"][k] > 0)
            do_smooth = do_boundary & ar["unit_prev_ok"][k] & (n >= 200)

            prev_pitch = dops.estimate_pitch_win(win, analysis)
            next_pitch = ar["_next_pitch"][k]
            voiced = (prev_pitch > 0) & (next_pitch > 0)
            ratio = dops.div_rn(
                next_pitch, jnp.where(prev_pitch > 0, prev_pitch,
                                      F32(1.0)))
            jump = (ratio > F32(1.15)) | (ratio < F32(0.85))
            target = jnp.where(
                ratio > F32(1.0),
                F32(1.0) + (ratio - F32(1.0)) * F32(0.5),
                F32(1.0) - (F32(1.0) - ratio) * F32(0.5),
            )
            shift_factor = dops.div_rn(
                target, jnp.where(ratio != 0, ratio, F32(1.0)))
            shift_region = ar["unit_shift_region"][k]
            shifted = dops.pitch_shift_blend(x[:CFMAX], shift_region,
                                             shift_factor)
            use_shift = do_smooth & voiced & jump & (shift_region > 0)
            x = jnp.where((iu < shift_region) & use_shift,
                          jnp.pad(shifted, (0, ubuf - CFMAX)), x)

            # --- match_boundary_energy (ctts.c:1730-1759) --------------
            blen = ar["unit_boundary_len"][k]
            prev_tail = win[WIN - CFMAX:]
            it = jnp.arange(CFMAX)
            tail_live = it >= (CFMAX - blen)
            prev_rms = dops.sqrt_rn(dops.div_rn(
                jnp.sum(jnp.where(tail_live, prev_tail * prev_tail, 0.0)),
                jnp.maximum(blen, 1).astype(F32)))
            next_rms = dops.sqrt_rn(dops.div_rn(
                jnp.sum(jnp.where(iu < blen, x * x, 0.0)),
                jnp.maximum(blen, 1).astype(F32)))
            eratio = jnp.clip(
                dops.div_rn(prev_rms,
                            jnp.where(next_rms > 0, next_rms, F32(1.0))),
                F32(0.5), F32(2.0),
            )
            tgain = dops.div_rn(iu.astype(F32),
                                jnp.maximum(blen, 1).astype(F32))
            egain = eratio * (F32(1.0) - tgain) + tgain
            do_energy = do_boundary & (blen > 0) & \
                (prev_rms >= F32(1.0)) & (next_rms >= F32(1.0))
            x = jnp.where((iu < blen) & do_energy, q16(x * egain), x)

            # --- DC removal + fade-in / crossfade ----------------------
            if dims.remove_dc:
                x = dops.remove_dc(x, n)
            fade_in = ar["unit_fade_in"][k]
            x = jnp.where(fade_in,
                          dops.head_fade_in(x, dims.fade_in_samples, n), x)

            tail = lax.dynamic_slice(bufs[r], (off,), (CFMAX,))
            # C computes t = i * (1.0f / crossfade) (ctts.c:3326-3329).
            tmix = it.astype(F32) * (F32(1.0) / jnp.maximum(cf_in, 1).astype(F32))
            mixed = q16(trunc16(tail * fade_out_gain(tmix)
                                + x[:CFMAX] * fade_in_gain(tmix)))
            x = jnp.where((iu < cf_in) & (~fade_in),
                          jnp.pad(mixed, (0, ubuf - CFMAX)), x)

            # --- write ------------------------------------------------
            curw = lax.dynamic_slice(bufs[r], (off,), (ubuf,))
            neww = jnp.where((iu < n) & active, x, curw)
            bufs = lax.dynamic_update_slice(bufs, neww[None, :], (r, off))
            return bufs, None

        return unit_step

    def prepare_base(bank, bank_lens, gains, ar):
        """One-time materialization of every unit slot's raw gained audio
        base[k] = q16(bank[uid_k] * gains[uid_k]) [U, UBUF], plus the
        trip-invariant crossfade fade-out curves fo [U, CFMAX].

        The row pick is a one-hot matmul on the MXU instead of a
        batch-varying row gather (the round-2 profile's single largest
        cost: 0.25 s/trip at batch 64, re-paid every fixed-point trip).
        Exactness: hi/lo split halves are bf16-exact and each output
        element has exactly one nonzero product, so any precision/order
        reproduces q16(bank*gain) bit-for-bit."""
        from ctts_tpu.ops.exact import split_hi_lo

        uid = jnp.maximum(ar["unit_id"], 0)                    # [U]
        onehot = (uid[:, None] ==
                  jnp.arange(bank.shape[0])[None, :]).astype(F32)
        bh, bl = split_hi_lo(bank)
        x = (F32(256.0) * (onehot @ bh) + onehot @ bl)         # [U, UBUF]
        # gains are arbitrary f32 (0.1..3.0) — a one-hot matmul would
        # ride bf16 and round them; a [U]-scalar gather is trivial.
        g = gains[uid]
        base = q16(x * g[:, None])

        it = jnp.arange(CFMAX)
        if "cf_values" in ar:
            # The gain curves depend only on the scalar crossfade length,
            # and a batch has few distinct lengths — so evaluate the LUT
            # curves once per distinct value on the (unbatched, batch-
            # global) value set and select each unit's row with an exact
            # one-nonzero where-sum. The full-width per-unit LUT eval was
            # 2 M gather elements per batch — 53 ms, the single largest
            # device cost after round 2 (tools/microbench_parts.py).
            cfv = ar["cf_values"].astype(jnp.int32)          # [NCF]
            tmixv = it[None, :].astype(F32) * (
                F32(1.0) / jnp.maximum(cfv, 1).astype(F32)[:, None]
            )
            fo_c = fade_out_gain(tmixv)                      # [NCF, CFMAX]
            fi_c = fade_in_gain(tmixv)
            cfu = jnp.maximum(ar["unit_cf_in"], 1)           # [U]
            # cfv holds the deduped max(cf,1) values padded with 0 (which
            # never matches) — exactly one hit per unit, so the sum IS
            # the matched row, bit-for-bit.
            match = (cfu[:, None] == cfv[None, :])[:, :, None]
            fo = jnp.sum(jnp.where(match, fo_c[None], F32(0.0)), axis=1)
            fi = jnp.sum(jnp.where(match, fi_c[None], F32(0.0)), axis=1)
            return base, fo, fi
        tmix = it[None, :].astype(F32) * (
            F32(1.0) / jnp.maximum(ar["unit_cf_in"], 1).astype(F32)[:, None]
        )
        # Both crossfade gain curves are trip-invariant; hoisting them
        # keeps the LUT gathers out of the fixed-point loop.
        return base, fade_out_gain(tmix), fade_in_gain(tmix)

    def prepare_contrib(base, fo, fi, ar, heads):
        """Per-unit contribution [U, UBUF]: base with (optionally) the
        boundary-modified head substituted, DC-removed, head-faded /
        crossfade-weighted, and length-masked. Elementwise only — safe to
        re-run every fixed-point trip."""

        def one(k):
            n = ar["_unit_n"][k]
            x = base[k]
            if heads is not None:
                x = jnp.concatenate([heads[k], x[CFMAX:]])
            if dims.remove_dc:
                x = dops.remove_dc(x, n)
            fade_in = ar["unit_fade_in"][k]
            x = jnp.where(
                fade_in, dops.head_fade_in(x, dims.fade_in_samples, n), x
            )
            cf_in = ar["unit_cf_in"][k]
            iu = jnp.arange(ubuf)
            head_fi = x[:CFMAX] * fi[k]
            x = jnp.where((iu < cf_in) & (~fade_in),
                          jnp.pad(head_fi, (0, ubuf - CFMAX)), x)
            x = jnp.where((iu < n) & (ar["unit_id"][k] >= 0), x, F32(0.0))
            return x

        return jax.vmap(one)(jnp.arange(dims.U))

    def make_contrib_fn(base, fo, fi, ar):
        """Split prepare_contrib: everything outside the first CFMAX
        columns is trip-invariant except a scalar DC shift, so the
        fixed-point loop only recomputes (a) the per-unit DC offset
        (head int-sum + precomputed tail int-sum), (b) the CFMAX-wide
        head chain, and (c) ONE fused masked pass over [U, UBUF] —
        instead of the full remove_dc/fade chain every trip.

        Bit-exact vs prepare_contrib: the DC total is the same int32
        sum split at CFMAX; positions ≥ n are zeroed by the final mask
        in both versions, and every head op (windowed sine fade-in,
        crossfade fade-in weighting) is applied in the original order
        on the same dc-removed values."""
        from ctts_tpu.ops.luts import sine_fade_gain

        n = ar["_unit_n"]                                    # [U]
        active = ar["unit_id"] >= 0
        cf_in = ar["unit_cf_in"]
        fade_in = ar["unit_fade_in"]
        iu = jnp.arange(ubuf)[None, :]
        ih = jnp.arange(CFMAX)[None, :]
        tail_total = jnp.sum(
            jnp.where((iu >= CFMAX) & (iu < n[:, None]), base,
                      F32(0.0)).astype(jnp.int32), axis=1)   # [U]

        FW = min(-(-dims.fade_in_samples // 128) * 128, CFMAX)
        ifw = jnp.arange(FW)[None, :]
        fade = jnp.minimum(dims.fade_in_samples, n)          # [U]
        if "fade_values" in ar:
            # Same distinct-value curve trick as prepare_base: fade is
            # min(fade_in_samples, unit length) — a handful of distinct
            # values per batch, host-collected.
            fv = ar["fade_values"].astype(jnp.int32)         # [NFV]
            tfv = ifw.astype(F32) * (
                F32(1.0) / jnp.maximum(fv, 1).astype(F32)[:, None])
            gain_v = sine_fade_gain(tfv)                     # [NFV, FW]
            # fv holds deduped max(fade,1) values, padded with 0 (never
            # matches a maxed value) — exactly one hit per unit.
            fm = (jnp.maximum(fade, 1)[:, None] == fv[None, :])[:, :, None]
            fade_gain = jnp.sum(
                jnp.where(fm, gain_v[None], F32(0.0)), axis=1)
        else:
            tfw = ifw.astype(F32) * (
                F32(1.0) / jnp.maximum(fade, 1).astype(F32)[:, None])
            fade_gain = sine_fade_gain(tfw)                  # [U, FW]

        def contrib_fn(heads):
            live_h = ih < n[:, None]
            head_total = jnp.sum(
                jnp.where(live_h, heads, F32(0.0)).astype(jnp.int32),
                axis=1)
            total = head_total + tail_total
            nn = jnp.maximum(n, 1)
            dc = jnp.sign(total) * (jnp.abs(total) // nn)
            dcf = dc.astype(F32)[:, None]

            xh = jnp.where(
                live_h,
                jnp.clip(heads - dcf, F32(-32768.0), F32(32767.0)),
                heads)
            hf = xh[:, :FW]
            faded = trunc16(hf * fade_gain)
            hf = jnp.where((ifw < fade[:, None]) & (fade[:, None] > 0),
                           faded, hf)
            xh_fi = jnp.concatenate([hf, xh[:, FW:]], axis=1)
            xh = jnp.where(fade_in[:, None], xh_fi, xh)
            head_fi = xh * fi
            xh = jnp.where((ih < cf_in[:, None]) & (~fade_in[:, None]),
                           head_fi, xh)
            xh = jnp.where(live_h & active[:, None], xh, F32(0.0))

            tail = jnp.where(
                (iu >= CFMAX) & (iu < n[:, None]) & active[:, None],
                jnp.clip(base - dcf, F32(-32768.0), F32(32767.0)),
                F32(0.0))
            return tail.at[:, :CFMAX].set(xh)

        return contrib_fn

    def boundary_heads(base, ar, windows, debug=False):
        """Batched boundary DSP (smooth_pitch_boundary +
        match_boundary_energy) from the scan-exported (pitch segment,
        tail) window pairs. Operates on the precomputed base heads — no
        bank access. `windows` is either the already-carved
        (segs [U, _PITCH_SPAN], tails [U, CFMAX]) pair (the Pallas
        kernel emits both aligned in-VMEM) or the stacked
        [U, 2*CFMAX+512] raw export from the XLA scan (one slice per
        step; the pitch segment sits `analysis` back from index 2*CFMAX
        and the energy tail is the static [CFMAX, 2*CFMAX) span). The
        tail-pitch search runs as ONE batched dispatch over all slots
        (single Pallas kernel / conv call)."""
        ana = ar["unit_analysis"]
        if isinstance(windows, tuple):
            segs, tails = windows
        else:
            segs = jax.vmap(
                lambda w, a: lax.dynamic_slice(
                    w, (2 * CFMAX - a,), (dops._PITCH_SPAN,))
            )(windows, ana)
            tails = windows[:, CFMAX:2 * CFMAX]

        # Candidate compaction (see the core's shift_slots block): the
        # tail-pitch search and the shift/blend resample run on NSHIFT
        # rows; the host gates (smooth & boundary>0 & prev_ok & n≥200 &
        # shift_region>0) already hold on every live candidate, so only
        # the device-side voiced/jump tests remain.
        ss = ar["shift_slots"]
        s_live = ss >= 0
        si = jnp.maximum(ss, 0)
        pickm = (si[:, None] == jnp.arange(dims.U)[None, :]) \
            & s_live[:, None]
        scat = jnp.arange(dims.U)[:, None] == ss[None, :]   # [U, NSHIFT]

        def pick_rows(m):
            return jnp.sum(
                jnp.where(pickm[:, :, None], m[None], F32(0.0)), axis=1)

        def pick_scal(v):
            return jnp.sum(
                jnp.where(pickm, v[None, :], jnp.zeros((), v.dtype)),
                axis=1)

        prev_p = dops.estimate_pitch_batch(pick_rows(segs), pick_scal(ana))
        next_p = pick_scal(ar["_next_pitch"])
        sr_c = pick_scal(ar["unit_shift_region"])
        voiced_c = (prev_p > 0) & (next_p > 0)
        ratio_c = dops.div_rn(next_p,
                              jnp.where(prev_p > 0, prev_p, F32(1.0)))
        jump_c = (ratio_c > F32(1.15)) | (ratio_c < F32(0.85))
        target_c = jnp.where(
            ratio_c > F32(1.0),
            F32(1.0) + (ratio_c - F32(1.0)) * F32(0.5),
            F32(1.0) - (F32(1.0) - ratio_c) * F32(0.5),
        )
        factor_c = dops.div_rn(
            target_c, jnp.where(ratio_c != 0, ratio_c, F32(1.0)))
        shifted_c = jax.vmap(dops.pitch_shift_blend)(
            pick_rows(base[:, :CFMAX]), sr_c, factor_c)     # [NSHIFT, CF]
        use_c = s_live & voiced_c & jump_c & (sr_c > 0)
        hit = scat & use_c[None, :]                         # [U, NSHIFT]
        shifted_u = jnp.sum(
            jnp.where(hit[:, :, None], shifted_c[None], F32(0.0)), axis=1)
        use_u = jnp.any(hit, axis=1)                        # [U]

        def one(k, seg, prev_tail):
            head = base[k][:CFMAX]
            it = jnp.arange(CFMAX)

            do_boundary = ar["unit_smooth"][k] & (ar["unit_boundary"][k] > 0)

            shift_region = ar["unit_shift_region"][k]
            head = jnp.where((it < shift_region) & use_u[k],
                             shifted_u[k], head)

            blen = ar["unit_boundary_len"][k]
            tail_live = it >= (CFMAX - blen)
            prev_rms = dops.sqrt_rn(dops.div_rn(
                jnp.sum(jnp.where(tail_live, prev_tail * prev_tail, 0.0)),
                jnp.maximum(blen, 1).astype(F32)))
            next_rms = dops.sqrt_rn(dops.div_rn(
                jnp.sum(jnp.where(it < blen, head * head, 0.0)),
                jnp.maximum(blen, 1).astype(F32)))
            eratio = jnp.clip(
                dops.div_rn(prev_rms,
                            jnp.where(next_rms > 0, next_rms, F32(1.0))),
                F32(0.5), F32(2.0),
            )
            tgain = dops.div_rn(it.astype(F32),
                                jnp.maximum(blen, 1).astype(F32))
            egain = eratio * (F32(1.0) - tgain) + tgain
            do_energy = do_boundary & (blen > 0) & \
                (prev_rms >= F32(1.0)) & (next_rms >= F32(1.0))
            head = jnp.where((it < blen) & do_energy, q16(head * egain), head)
            dbg = jnp.stack([prev_rms, next_rms, eratio,
                             do_energy.astype(F32), blen.astype(F32),
                             use_u[k].astype(F32)])
            return head, dbg

        heads_v, dbg_v = jax.vmap(one)(jnp.arange(dims.U), segs, tails)
        if debug:
            # Per-unit boundary decision scalars stacked over the
            # per-candidate shift decisions (tools/stage_diff.py) —
            # cross-backend f32 sum order and division rounding feed
            # threshold tests here, so flips localize to these values.
            cand = jnp.stack([prev_p.astype(F32), next_p.astype(F32),
                              ratio_c, factor_c, use_c.astype(F32),
                              jnp.zeros_like(ratio_c)], axis=1)
            cand = jnp.pad(cand, ((0, dims.U - cand.shape[0]), (0, 0)))
            return jnp.concatenate([dbg_v, cand], axis=0)
        return heads_v

    def core(bank, bank_lens, gains, ar):
        ar = dict(ar)
        ar["_unit_n"] = jnp.where(
            ar["unit_id"] >= 0,
            bank_lens[jnp.maximum(ar["unit_id"], 0)], 0
        ).astype(jnp.int32)

        if stage == "noop":
            # Pure dispatch+sync floor (input-dependent so nothing
            # constant-folds): the tunnel round-trip is ~25 ms and is
            # included in EVERY absolute stage time — the first real
            # stage's delta is mostly this, not compute.
            return _ck(ar["_unit_n"])

        base, fo, fi = prepare_base(bank, bank_lens, gains, ar)

        # Boundary-shift candidate machinery: the pitch searches and the
        # shift/blend resample only matter for units whose host-known
        # gates pass (shift_slots, ~16% of slots at the bench corpus) —
        # run them on NSHIFT compacted rows instead of all U. Row
        # picks/scatters are exact one-nonzero where-sums (arbitrary
        # f32 values — a one-hot matmul would ride bf16 and round).
        ss = ar["shift_slots"]                              # [NSHIFT]
        s_live = ss >= 0
        si = jnp.maximum(ss, 0)
        pickm = (si[:, None] == jnp.arange(dims.U)[None, :]) \
            & s_live[:, None]                               # [NSHIFT, U]
        scat = jnp.arange(dims.U)[:, None] == ss[None, :]   # [U, NSHIFT]

        def pick_rows(m):
            return jnp.sum(
                jnp.where(pickm[:, :, None], m[None], F32(0.0)), axis=1)

        def pick_scal(v):
            return jnp.sum(
                jnp.where(pickm, v[None, :], jnp.zeros((), v.dtype)),
                axis=1)

        # Per-unit pitch of the unit head is independent of composition —
        # hoist it out of the sequential scan, one batched dispatch for
        # the candidate slots (the conv path has a per-dispatch latency
        # floor; the Pallas path is one kernel either way).
        cand_np = dops.estimate_pitch_batch(
            pick_rows(base[:, :dops._PITCH_SPAN]),
            pick_scal(ar["unit_analysis"]),
        )                                                   # [NSHIFT]
        # Scatter to [U]; non-candidates read 0 (unvoiced) — their
        # do_smooth gate is false, so the value is never consumed.
        next_pitches = jnp.sum(
            jnp.where(scat, cand_np[None, :], F32(0.0)), axis=1)
        if stage == "head_pitch":
            return _ck(next_pitches)
        ar["_next_pitch"] = next_pitches

        def compose_pallas(contrib, fo, export_windows):
            """Pallas placement: the whole unit loop runs inside ONE
            kernel program per sentence (ops/pallas/compose.py), so the
            per-unit read-merge-write costs VMEM ops instead of the
            ~0.4 ms/step that each batch-varying dynamic slice/update
            pays in a vmapped XLA scan (tools/microbench_width.py).
            Bit-identical to compose_scan (tools/microbench_compose.py
            asserts on-chip equality; tests/test_pallas_compose.py in
            interpret mode)."""
            from ctts_tpu.ops.pallas.compose import compose_units

            kubuf = -(-ubuf // 1024) * 1024
            if kubuf != ubuf:
                contrib = jnp.concatenate(
                    [contrib, jnp.zeros((dims.U, kubuf - ubuf), F32)],
                    axis=1)
            base_off = (ar["unit_region"] * dims.WREG + ar["unit_off"]
                        ).astype(jnp.int32)
            n_eff = jnp.where(ar["unit_id"] >= 0, ar["_unit_n"], 0)
            interp = os.environ.get("CTTS_PALLAS_INTERPRET") == "1"
            buf, seg, tail = compose_units(
                base_off, ar["unit_cf_in"].astype(jnp.int32), n_eff,
                ar["unit_analysis"].astype(jnp.int32),
                contrib, fo, U=dims.U, UBUF=kubuf, CFMAX=CFMAX,
                TOT=dims.R * dims.WREG, export=export_windows,
                interpret=interp)
            return (buf.reshape(dims.R, dims.WREG),
                    (seg[:, :dops._PITCH_SPAN], tail))

        def compose_scan(contrib, fo, export_windows):
            """Light placement scan: crossfade-mix + write per unit slot
            (contributions fully prepared); optionally export each unit's
            pre-merge analysis window.

            The region buffers are FLAT ([R*WREG]) inside the scan: a 2-D
            `bufs[r]` with a batch-varying r gathers the whole 32k-wide
            row per step; flat offsets slice only the windows actually
            touched. Writes stay in-row: derive_dims guarantees
            off + UBUF ≤ MARGIN + region_len + bank_w ≤ WREG.

            On TPU the Pallas kernel replaces this scan (same bits,
            3.5x faster); this XLA path remains the CPU/test and
            fallback lowering."""
            if _compose_backend() == "pallas" and CFMAX % 1024 == 0 \
                    and (dims.R * dims.WREG) % 1024 == 0 \
                    and _pallas_sent_fits(dims.R * dims.WREG
                                          + dims.U * ubuf) \
                    and MARGIN >= 2 * CFMAX:
                return compose_pallas(contrib, fo, export_windows)
            iu = jnp.arange(ubuf)

            # Every non-fusable memory op in the step body costs ~0.3 ms
            # of per-step overhead on this backend (elementwise chains
            # fuse; slices/updates do not), so the step keeps exactly
            # three: the unit window read (whose CFMAX prefix doubles as
            # the crossfade tail), ONE boundary-analysis export window
            # (the pitch segment and energy tail are carved out of it
            # OUTSIDE the scan, batched), and the write.
            EXPW = 2 * CFMAX + 512

            def step(flat, k):
                active = ar["unit_id"][k] >= 0
                base_off = (ar["unit_region"][k] * dims.WREG
                            + ar["unit_off"][k])
                cf = ar["unit_cf_in"][k]
                n = ar["_unit_n"][k]
                x = contrib[k]
                if export_windows:
                    # [write_pt - 2*CFMAX, write_pt + 512) covers the
                    # pitch segment (starts `analysis` ≤ 2*CFMAX back,
                    # _PITCH_SPAN ≤ ana + 512 wide) and the CFMAX energy
                    # tail. MARGIN ≥ 2*CFMAX keeps the read in-row.
                    win = lax.dynamic_slice(
                        flat, (base_off + cf - 2 * CFMAX,), (EXPW,)
                    )
                else:
                    win = jnp.zeros((), F32)
                cur = lax.dynamic_slice(flat, (base_off,), (ubuf,))
                mixed = q16(trunc16(cur[:CFMAX] * fo[k] + x[:CFMAX]))
                x = jnp.where(iu < cf, jnp.pad(mixed, (0, ubuf - CFMAX)), x)
                neww = jnp.where((iu < n) & active, x, cur)
                flat = lax.dynamic_update_slice(flat, neww, (base_off,))
                return flat, win

            unroll = int(os.environ.get("CTTS_SCAN_UNROLL", "1"))
            flat0 = dops._vary(jnp.zeros(dims.R * dims.WREG, F32))
            flat, wins = lax.scan(step, flat0, jnp.arange(dims.U),
                                  unroll=unroll)
            return flat.reshape(dims.R, dims.WREG), wins

        if stage == "contrib":
            contrib = make_contrib_fn(base, fo, fi, ar)(base[:, :CFMAX])
            return _ck(contrib)

        if dims.compose_refine:
            # Fixed-point compose: body = compose with current heads →
            # re-derive heads from the exported analysis windows. Head
            # dependencies are causal, so a unit at head-mod chain depth
            # d has its final head after d bodies; the host computes the
            # batch's max depth statically (walk_plan) and passes it as
            # `refine_trips` — no convergence probe, no wasted trip. A
            # final exportless scan then composes with the final heads.
            heads0 = base[:, :CFMAX]
            contrib_fn = make_contrib_fn(base, fo, fi, ar)

            if stage == "scanonly":
                # Placement scan alone (no window export, no boundary
                # DSP) — isolates the sequential scan's cost.
                bufs_1, _ = compose_scan(contrib_fn(heads0), fo, False)
                return _ck(bufs_1)

            if stage == "compose1":
                # One fixed-point trip (profiling: trip cost vs count).
                bufs_1, windows = compose_scan(contrib_fn(heads0), fo,
                                               True)
                heads_1 = boundary_heads(base, ar, windows)
                return _ck(bufs_1 + jnp.sum(heads_1))

            if stage == "heads1":
                _, windows = compose_scan(contrib_fn(heads0), fo, True)
                return _ck(boundary_heads(base, ar, windows))

            if stage == "bdec":
                _, windows = compose_scan(contrib_fn(heads0), fo, True)
                return _ck(boundary_heads(base, ar, windows, debug=True))

            def r_cond(carry):
                _, it = carry
                return it < ar["refine_trips"]

            def r_body(carry):
                heads, it = carry
                _, windows = compose_scan(contrib_fn(heads), fo, True)
                return boundary_heads(base, ar, windows), it + 1

            heads, _ = lax.while_loop(r_cond, r_body,
                                      (heads0, jnp.int32(0)))
            bufs, _ = compose_scan(contrib_fn(heads), fo, False)
        elif dims.exact_compose:
            bufs0 = dops._vary(jnp.zeros((dims.R, dims.WREG), F32))
            bufs, _ = lax.scan(unit_step_fn(bank, bank_lens, gains, ar),
                               bufs0, jnp.arange(dims.U))
        else:
            # Two-pass XLA compose: light scans + batched boundary DSP.
            contrib = prepare_contrib(base, fo, fi, ar, None)
            _, windows = compose_scan(contrib, fo, True)
            heads = boundary_heads(base, ar, windows)
            contrib = prepare_contrib(base, fo, fi, ar, heads)
            bufs, _ = compose_scan(contrib, fo, False)
        if stage == "compose":
            return _ck(bufs)

        # --- in-region (punct) tail fades --------------------------------
        # Each fade touches ≤ FADEW samples before its position, and fade
        # windows never overlap (each is ~3 ms and every pair is separated
        # by a punctuation pause; only a pathological word_pause_ms≈0
        # config could overlap them, where C would apply both
        # sequentially). Apply them as FADEW-wide window patches — a short
        # scan of tiny slice/update pairs instead of full-WREG gain
        # passes (0.18 s/batch in the round-1 profile).
        from ctts_tpu.ops.luts import sine_fade_gain

        jf = jnp.arange(dims.FADEW)

        def fade_step(b, k):
            # Flat offsets (2-D dynamic indices gather the whole row).
            pos = MARGIN + jnp.maximum(ar["fade_pos"][k], 0)
            flen = jnp.minimum(ar["fade_len"][k], pos)
            foff = (ar["fade_region"][k] * dims.WREG + pos - dims.FADEW)
            win = lax.dynamic_slice(b, (foff,), (dims.FADEW,))
            rel = (jf - (dims.FADEW - flen)).astype(F32)
            t = (flen.astype(F32) - rel) * (
                F32(1.0) / jnp.maximum(flen, 1).astype(F32)
            )
            gain = sine_fade_gain(t)
            active = (ar["fade_pos"][k] >= 0) & (flen > 0)
            in_fade = (jf >= dims.FADEW - flen) & active
            neww = jnp.where(in_fade, trunc16(win * gain), win)
            return lax.dynamic_update_slice(b, neww, (foff,)), None

        bufs_flat, _ = lax.scan(fade_step, bufs.reshape(-1),
                                jnp.arange(dims.FD))
        bufs = bufs_flat.reshape(dims.R, dims.WREG)
        if stage == "fades":
            return _ck(bufs)

        # --- per-region word DSP -----------------------------------------
        # 2a: silence-removal segment tables (vmapped mask math, XLA).
        threshold = ar["threshold"]

        def seg_table(row, length, do_remove):
            # Region content lives in [MARGIN, MARGIN+CONTW); scanning
            # only that slice keeps the run-detection scans off the
            # padded region width.
            starts, seg_len, new_len, ovf = dops.silence_segments(
                row[MARGIN:MARGIN + dims.CONTW], length, threshold,
                dims.min_silence_samples
            )
            starts = jnp.where(do_remove, starts, 0)
            seg_len = jnp.where(do_remove, seg_len, 0)
            new_len = jnp.where(do_remove, new_len, length)
            dst = MARGIN + jnp.concatenate(
                [jnp.zeros(1, jnp.int32), jnp.cumsum(seg_len)[:-1]]
            )
            return starts + MARGIN, dst, seg_len, new_len, ovf & do_remove

        seg_starts, seg_dst, seg_lens, comp_lens, seg_ovf = jax.vmap(
            seg_table
        )(bufs, ar["region_len"], ar["region_remove"])
        # Surfaced counter (no-silent-caps rule): regions whose kept-
        # segment table overflowed NBLK and stayed partially uncompacted.
        ovf_count = jnp.sum(seg_ovf.astype(jnp.int32))
        if stage == "segtables":
            return _ck(seg_starts.astype(F32) + seg_dst.astype(F32)
                       + seg_lens.astype(F32))

        # 2b: data movement — segment window moves. On TPU the Pallas
        # compact kernel moves every region's segments inside one
        # program (aligned-slice + roll, see ops/pallas/compact.py); the
        # vmapped while_loop of batch-varying window moves remains the
        # CPU/fallback lowering.
        if _compose_backend() == "pallas" and dims.WREG % 1024 == 0 \
                and _pallas_sent_fits(dims.R * dims.WREG):
            from ctts_tpu.ops.pallas.compact import compact_units

            bufs = compact_units(
                bufs.reshape(-1), seg_starts, seg_dst, seg_lens,
                R=dims.R, WREG=dims.WREG, NBLK=dops.NBLK, MW=dims.CONTW,
                interpret=os.environ.get("CTTS_PALLAS_INTERPRET") == "1",
            ).reshape(dims.R, dims.WREG)
        else:
            bufs = jax.vmap(
                lambda b, s, d, sl: dops.move_segments(b, s, d, sl,
                                                       win_w=dims.CONTW)
            )(bufs, seg_starts, seg_dst, seg_lens)
        if stage == "move":
            return _ck(bufs)

        # 2c: contour + energy + fades. The rise segment (c1) runs over a
        # COMPACT per-sentence frame workspace: each region's live
        # content is copied into a zone sized by its actual DSP length
        # (region-granular window moves), so the shifted-select resample
        # covers ~SMAX/128 real frame slots instead of R * max_frames
        # padded ones (3.5x fewer at the bench bucket — the contour pass
        # was 0.51 s/batch). Exactness: every read that could cross a
        # zone boundary is already masked by the same (pos + idx < count)
        # / in_range masks _contour0 uses, OLA contributions are gated by
        # frame_ok, and the merge-back applies the identical
        # (i < count) & active & good mask — so zone padding contents
        # never reach the output. The interrogative-final *fall* segment
        # (c2) applies to at most the final word region of a question; a
        # while_loop walks only those regions.
        FRC, HOPC = 256, 128
        K_slots = dims.SMAX // 128 + 2 * dims.R + 4
        WC = K_slots * 128 + dims.CONTW + 1024

        contour_p = ar["region_contour"]
        ws_r, we_r, peak_r = (contour_p[:, 0], contour_p[:, 1],
                              contour_p[:, 2])
        rise_r = (comp_lens.astype(F32) * F32(0.6)).astype(jnp.int32)
        use_split_r = (ar["region_qfinal"] & (rise_r > 100)
                       & (comp_lens - rise_r > 100))
        seg1_len = jnp.where(use_split_r, rise_r, comp_lens)
        f_end_r = jnp.where(use_split_r, peak_r, we_r)
        cnt_r = jnp.where(ar["region_do_dsp"], seg1_len, 0)
        act_r = (cnt_r >= 100) & (jnp.abs(ws_r - f_end_r) >= F32(0.01))

        zone_slots = jnp.where(cnt_r > 0, (cnt_r + 127) // 128 + 1, 1)
        zone_off = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(zone_slots)[:-1]]
        )

        # Copy-in. Every LIVE resample read is at a region position
        # < cnt (frame_ok bounds pos ≤ cnt−256, live lerp reads ≤
        # pos+255, and ca reads past cnt are masked), so only rows
        # j < zone_slots[r] of each zone ever reach the output — what
        # rows outside the zones hold is arbitrary.
        if dims.CONTW % 128 == 0 and \
                os.environ.get("CTTS_CONTOUR_COPYIN", "onehot") != "loop":
            # Exact one-hot ROW-pick matmuls (inverse of the merge-back
            # below): buffer values sit on the int16 lattice between
            # stages, so hi/lo halves are bf16-exact. Replaces R
            # serialized dynamic_update_slice passes (8.1 ms/batch of
            # the contour stage on v5e; the matmul is ~1 ms on the MXU).
            # Rows with no source (outside every zone) become 0.
            from ctts_tpu.ops.exact import split_hi_lo as _shl_in

            rows_per_in = dims.CONTW // 128
            s_rows_in = WC // 128
            win_rows = lax.slice(
                bufs, (0, MARGIN), (dims.R, MARGIN + dims.CONTW)
            ).reshape(dims.R * rows_per_in, 128)
            j_in = jnp.arange(rows_per_in)[None, :]
            tgt_in = jnp.where(j_in < zone_slots[:, None],
                               zone_off[:, None] + j_in, -1).reshape(-1)
            sel_in = (jnp.arange(s_rows_in)[:, None] == tgt_in[None, :]
                      ).astype(F32)              # [s_rows_in, R*rows_per]
            wh_in, wl_in = _shl_in(win_rows)
            wksp = (F32(256.0) * (sel_in @ wh_in)
                    + sel_in @ wl_in).reshape(-1)
        else:
            # Ascending zones: each CONTW-wide write may spill into
            # later zones, which are rewritten by their own later copy.
            wksp = jnp.zeros(WC, F32)
            for r in range(dims.R):
                win_r = lax.slice(bufs, (r, MARGIN),
                                  (r + 1, MARGIN + dims.CONTW))[0]
                wksp = lax.dynamic_update_slice(wksp, win_r,
                                                (zone_off[r] * 128,))

        # Per-slot region params (one-nonzero selection; counts < 2^24
        # are exact in f32).
        sidx = jnp.arange(K_slots)
        member = ((sidx[None, :] >= zone_off[:, None])
                  & (sidx[None, :] < (zone_off + zone_slots)[:, None]))

        def pick(v):
            # Exact one-nonzero selection [R] -> [K_slots] (a matmul
            # would ride bf16 and round counts/factors; R is tiny).
            return jnp.sum(
                jnp.where(member, v.astype(F32)[:, None], F32(0.0)),
                axis=0,
            )

        cnt_s = pick(cnt_r).astype(jnp.int32)
        fs_s = pick(ws_r)
        fe_s = pick(f_end_r)
        act_s = jnp.any(member & act_r[:, None], axis=0)
        pos_s = (sidx - pick(zone_off).astype(jnp.int32)) * HOPC

        # Frame math (mirrors dops._contour0 on the compact grid).
        denomc = (cnt_s - FRC).astype(F32)
        inv_cnt = jnp.where(denomc != 0, F32(1.0) / denomc, F32(jnp.inf))
        frame_ok = (pos_s + FRC <= cnt_s) & act_s
        tc = pos_s.astype(F32) * inv_cnt
        smooth_tc = tc * tc * (F32(3.0) - F32(2.0) * tc)
        pf_s = fs_s + (fe_s - fs_s) * smooth_tc

        tiles = [
            lax.slice(wksp, (j * HOPC,),
                      (K_slots * HOPC + j * HOPC,)).reshape(K_slots, HOPC)
            for j in range(4)
        ]
        winm = jnp.concatenate(tiles, axis=1)            # [K_slots, 512]
        if stage == "contour_in":   # copy-in + tile build
            return _ck(winm)

        from ctts_tpu.ops.luts import hann as hann_lut

        ic256 = jnp.arange(FRC)
        src = ic256[None, :].astype(F32) * pf_s[:, None]
        idxc = src.astype(jnp.int32)
        fracc = src - idxc.astype(F32)
        in_rangec = idxc + 1 < FRC
        D = dims.contour_drift
        wpadc = jnp.concatenate(
            [jnp.zeros((K_slots, D), F32), winm], axis=1
        )
        driftc = idxc - ic256[None, :]
        ca, cb = dops.shifted_select_resample(wpadc, driftc, D, FRC)
        ca = jnp.where(pos_s[:, None] + idxc < cnt_s[:, None], ca,
                       F32(0.0))
        samplec = jnp.where(in_rangec,
                            ca * (F32(1.0) - fracc) + cb * fracc, ca)

        if stage == "contour_sel":  # shifted-select resample
            return _ck(samplec)
        hann256 = hann_lut(FRC)
        contribc = trunc16(samplec * hann256[None, :])
        contribc = jnp.where(frame_ok[:, None], contribc, F32(0.0))
        normcc = jnp.where(frame_ok[:, None], hann256[None, :], F32(0.0))

        # 50%-overlap OLA as two interleaved non-overlapping tilings
        # (global slot parity: position = slot * 128 regardless of zone
        # alignment, and adjacent same-parity slots are 256 apart).
        LA = K_slots * HOPC + FRC + HOPC
        even = contribc[0::2].reshape(-1)
        odd = contribc[1::2].reshape(-1)
        accc = (
            jnp.concatenate([even, jnp.zeros(LA - even.shape[0], F32)])
            + jnp.concatenate(
                [jnp.zeros(HOPC, F32), odd,
                 jnp.zeros(LA - HOPC - odd.shape[0], F32)]
            )
        )
        n_even = normcc[0::2].reshape(-1)
        n_odd = normcc[1::2].reshape(-1)
        normb = (
            jnp.concatenate([n_even, jnp.zeros(LA - n_even.shape[0], F32)])
            + jnp.concatenate(
                [jnp.zeros(HOPC, F32), n_odd,
                 jnp.zeros(LA - HOPC - n_odd.shape[0], F32)]
            )
        )
        accc = wrap16(accc)
        goodb = normb > F32(0.01)
        valb = q16(dops.div_rn(accc, jnp.where(goodb, normb, F32(1.0))))
        valb = jnp.concatenate([valb, jnp.zeros(WC - LA, F32)])
        normb = jnp.concatenate([normb, jnp.zeros(WC - LA, F32)])
        if stage == "contour_ola":  # OLA + normalize
            return _ck(valb)

        # Merge back under the same (i < count) & active & good mask.
        icw = jnp.arange(dims.CONTW)
        if dims.CONTW % 128 == 0:
            # The zone reads are 128-row aligned, valb is q16-quantized
            # (int16-valued -> hi/lo halves are bf16-exact) and normb is
            # only consumed as a 0/1 threshold mask — so the R dynamic
            # slices become exact one-hot ROW-pick matmuls on the MXU
            # (the loop of dynamic slice/update pairs ran at ~4 GB/s
            # effective: 15 ms/batch of the contour stage).
            from ctts_tpu.ops.exact import split_hi_lo as _shl

            rows_per = dims.CONTW // 128
            s_rows = valb.shape[0] // 128
            vh_r, vl_r = _shl(valb)
            vh_r = vh_r.reshape(s_rows, 128)
            vl_r = vl_r.reshape(s_rows, 128)
            good_r = (normb > F32(0.01)).astype(F32).reshape(s_rows, 128)
            tgt = (zone_off[:, None]
                   + jnp.arange(rows_per)[None, :]).reshape(-1)
            sel = (tgt[:, None] == jnp.arange(s_rows)[None, :]
                   ).astype(F32)                    # [R*rows_per, s_rows]
            val_w = (F32(256.0) * (sel @ vh_r) + sel @ vl_r
                     ).reshape(dims.R, dims.CONTW)
            good_w = (sel @ good_r).reshape(dims.R, dims.CONTW) > F32(0.5)
            old = lax.slice(bufs, (0, MARGIN),
                            (dims.R, MARGIN + dims.CONTW))
            m = ((icw[None, :] < cnt_r[:, None]) & act_r[:, None]
                 & good_w)
            merged = jnp.where(m, val_w, old)
            bufs = jnp.concatenate(
                [bufs[:, :MARGIN], merged, bufs[:, MARGIN + dims.CONTW:]],
                axis=1)
        else:
            for r in range(dims.R):
                off = zone_off[r] * 128
                val_w = lax.dynamic_slice(valb, (off,), (dims.CONTW,))
                norm_w = lax.dynamic_slice(normb, (off,), (dims.CONTW,))
                old = lax.slice(bufs, (r, MARGIN),
                                (r + 1, MARGIN + dims.CONTW))[0]
                m = (icw < cnt_r[r]) & act_r[r] & (norm_w > F32(0.01))
                merged = jnp.where(m, val_w, old)
                bufs = lax.dynamic_update_slice(bufs, merged[None],
                                                (r, MARGIN))

        if stage == "contour_merge":  # zone merge-back
            return _ck(bufs)
        qf = (ar["region_qfinal"] & ar["region_do_dsp"]
              & ar["region_active"])
        ridx = jnp.arange(dims.R)
        qfirst = jnp.min(jnp.where(qf, ridx, dims.R))
        qlast = jnp.max(jnp.where(qf, ridx, -1))

        def q_cond(carry):
            _, r = carry
            return r <= qlast

        def q_body(carry):
            b, r = carry
            rc = jnp.minimum(r, dims.R - 1)
            row = b[rc]
            content = row[MARGIN:MARGIN + dims.CONTW]
            count = comp_lens[rc]
            rise = (count.astype(F32) * F32(0.6)).astype(jnp.int32)
            use_split = (rise > 100) & (count - rise > 100)
            seg2_len = jnp.where(use_split, count - rise, 0)
            peak = ar["region_contour"][rc, 2]
            we = ar["region_contour"][rc, 1]
            c2 = dops.contour_segment(content, rise, seg2_len, peak, we,
                                      max_frames, dims.contour_drift)
            # Guard against revisits after this sentence's own last
            # qfinal region (vmap runs the loop to the batch max).
            newc = jnp.where(qf[rc] & (r <= qlast), c2, content)
            new_row = jnp.concatenate(
                [row[:MARGIN], newc, row[MARGIN + dims.CONTW:]]
            )
            return lax.dynamic_update_slice(b, new_row[None], (rc, 0)), r + 1

        bufs, _ = lax.while_loop(q_cond, q_body, (bufs, qfirst))

        def region_post(row, count, do_dsp, contour, energy_on, fade_after):
            head = row[:MARGIN]
            content = row[MARGIN:MARGIN + dims.CONTW]
            rest = row[MARGIN + dims.CONTW:]
            es, ee = contour[3], contour[4]

            # Energy ramp (ctts.c:2841-2865); gated by the whole-function
            # count >= 100 check (ctts.c:2740).
            ic = jnp.arange(content_w)
            te = ic.astype(F32) / jnp.maximum(count - 1, 1).astype(F32)
            ramped = q16(content * (es + (ee - es) * te))
            apply_e = do_dsp & energy_on & (count >= 100)
            content = jnp.where((ic < count) & apply_e, ramped, content)

            content = jnp.where(
                fade_after > 0,
                dops.tail_fade_window(content, count, fade_after,
                                      dims.FADE2W),
                content,
            )
            return jnp.concatenate([head, content, rest])

        bufs = jax.vmap(region_post)(
            bufs, comp_lens, ar["region_do_dsp"],
            ar["region_contour"], ar["region_energy"],
            ar["region_fade_after"],
        )
        if stage == "contour":
            return _ck(bufs)
        new_lens = jnp.where(ar["region_active"], comp_lens, 0)
        pauses = jnp.where(ar["region_active"], ar["region_pause"], 0)

        # --- sentence assembly (overlap-add at cumsum offsets) ----------
        seg_lens = new_lens + pauses
        offsets = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(seg_lens)[:-1]]
        )
        total_len = jnp.sum(seg_lens)

        if _compose_backend() == "pallas" and dims.WREG % 1024 == 0 \
                and _pallas_sent_fits(dims.R * dims.WREG):
            # One kernel program per sentence: each region add is an
            # aligned-slice + roll read-modify-write in VMEM instead of
            # a batch-varying dynamic slice/update pair (~11 ms/batch).
            from ctts_tpu.ops.pallas.assemble import assemble_regions

            live_len = jnp.where(ar["region_active"],
                                 MARGIN + new_lens, 0)
            sent = assemble_regions(
                bufs.reshape(-1), offsets, live_len,
                R=dims.R, WREG=dims.WREG, SMAX=dims.SMAX, MARGIN=MARGIN,
                interpret=os.environ.get("CTTS_PALLAS_INTERPRET") == "1",
            )[MARGIN:]
        else:
            sent = jnp.zeros(MARGIN + dims.SMAX + dims.WREG, F32)

            # Unrolled (static r keeps each row read a free view; only
            # the destination offset is dynamic).
            iw = jnp.arange(dims.WREG)
            for r in range(dims.R):
                row = jnp.where(iw < MARGIN + new_lens[r], bufs[r],
                                F32(0.0))
                row = jnp.where(ar["region_active"][r], row, F32(0.0))
                start = offsets[r]  # buffer index of margin start
                seg = lax.dynamic_slice(sent, (start,), (dims.WREG,))
                sent = lax.dynamic_update_slice(sent, seg + row, (start,))
            sent = sent[MARGIN: MARGIN + dims.SMAX]
        ii = jnp.arange(dims.SMAX)
        sent = q16(jnp.where(ii < total_len, sent, F32(0.0)))
        if stage == "assemble":
            return _ck(sent)

        # --- WSOLA (compiled only for speed≠1 buckets) -------------------
        if dims.stretch:
            speed = ar["speed"]
            out, out_len = time_stretch_device(
                sent, total_len, speed, dims.OMAX, dims.synth_hop
            )
        else:
            out, out_len = sent, total_len
        if stage == "checksum":  # full compute, tiny transfer
            return _ck(out)[0], out_len
        # int16 on device: halves the host transfer.
        return out.astype(jnp.int16), out_len, ovf_count

    return core


@functools.lru_cache(maxsize=64)
def _compiled_core(dims: PlanDims, ubuf: int):
    return jax.jit(build_core(dims, ubuf))


def execute_plan_jax(plan: SynthesisPlan, db: VoiceDatabase,
                     voice: Optional[DeviceVoice] = None,
                     bucket: bool = True) -> np.ndarray:
    """Single-sentence convenience entry: lower, run, trim, int16."""
    if voice is None:
        voice = DeviceVoice(db, plan.target_rms)
    w = walk_plan(plan, db)
    dims = derive_dims(w, db)
    if bucket:
        dims = bucket_dims(dims)
    dplan = fill_device_plan(w, db, dims)
    core = _compiled_core(dplan.dims, voice.ubuf)
    arrays = {k: jnp.asarray(v) for k, v in dplan.arrays.items()}
    shared = shared_plan_values(dplan.arrays, voice.lengths, dplan.dims)
    arrays.update({k: jnp.asarray(v) for k, v in shared.items()})
    out, out_len, ovf = core(voice.bank, voice.lengths, voice.gains, arrays)
    out_len = int(out_len)
    if int(ovf) > 0:
        import sys

        print(f"ctts_tpu: {int(ovf)} region(s) exceeded the {dops.NBLK}-"
              "segment silence table; remainder kept uncompacted",
              file=sys.stderr)
    return np.asarray(out[:out_len]).astype(np.int16)
