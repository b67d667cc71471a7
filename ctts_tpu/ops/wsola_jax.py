"""WSOLA time stretch on device (parity: ctts.c:3378-3617).

The frame chain is inherently sequential (each search correlates against
the previously *chosen* frame), so the loop remains a device-side scan —
but each step is conv-free and gather-free:

- All 257 candidate windows at one nominal position are materialized as
  stacked static slices of ONE batch-invariant 768-sample window, and
  the search numerators are batched matvecs against the previous frame's
  tail (itself a one-hot pick from the same stack) — MXU work instead of
  the 1-D conv op's per-step dispatch latency.
- Candidate energies come from a precomputed sliding-window table built
  once per sentence from int32 cumsums.
- The chosen frame is fetched by one-hot contraction from the stacked
  windows instead of a batch-varying dynamic_slice (which lowers to an
  elementwise gather under vmap — the round-1 stretch-path bottleneck).

Decision arithmetic is EXACT: inputs are int16-valued, so numerators and
energies are computed as exact integers via hi/lo splitting (ops.exact)
and rounded to f32 once. The NumPy oracle computes the identical integer
in f64 (dsp_np.cross_correlation), making WSOLA offset decisions
bit-stable between device and oracle. (The C reference accumulates in
f32 with 4-way unrolling — ctts.c:3397-3414; the exact sum agrees with
it except on float near-ties, bounded by the golden corpus tests.)

The OLA accumulation order and quantization are unchanged (int16
wrapping adds, per-frame trunc16, f32 norm accumulation in frame order).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
from jax import lax

from ctts_tpu.ops.exact import (
    combine_exact,
    exact_sumsq_components,
    split_hi_lo,
)
from ctts_tpu.ops.luts import hann
from ctts_tpu.ops.quant import q16, trunc16, wrap16

F32 = jnp.float32

FRAME = 512
AHOP = 128          # analysis hop (75% overlap)
OVERLAP = FRAME - AHOP  # 384
MAX_SHIFT = 128     # ±25% of frame
NCAND = 2 * MAX_SHIFT + 1  # 257 candidate offsets

_WIN_W = FRAME + 2 * MAX_SHIFT  # 768: window covering candidates + frame


def _sliding_sumsq(x: jnp.ndarray, width: int) -> jnp.ndarray:
    """Exact sliding-window energy: out[p] = f32(Σ_{i<width} x[p+i]²) for
    p = 0..len(x)-width, correctly rounded from the exact integer.

    int32 cumsums of the split components may wrap mod 2^32; window
    differences still recover the true sums (each < 2^24)."""
    from ctts_tpu.ops.device_ops import _cumsum_i32

    xh, xl = split_hi_lo(x)

    def win_sum(prod):
        # Hierarchical cumsum (~3 full passes vs ~17 shifted-add passes
        # for a flat 131k-wide cumsum); int32 wrap-around addition is
        # associative, so window differences recover the same exact sums.
        cs = _cumsum_i32(prod.astype(jnp.int32)[None, :])[0]
        cs = jnp.concatenate([jnp.zeros(1, jnp.int32), cs])
        return (cs[width:] - cs[:-width]).astype(F32)

    hh = win_sum(xh * xh)
    mid = win_sum(xh * xl)
    ll = win_sum(xl * xl)
    return combine_exact(hh, mid, ll, 512.0)


def _stack_windows(win: jnp.ndarray, width: int) -> jnp.ndarray:
    """[W] -> [NCAND, width]: row o = win[o : o+width] (static slices)."""
    return jnp.stack([
        lax.slice(win, (o,), (o + width,)) for o in range(NCAND)
    ])


def _wsola_backend() -> str:
    """Frame-chain backend: the Pallas kernel (ops/pallas/wsola.py) runs
    the whole sequential chain in-kernel with a dynamic trip count; the
    scan remains the portable lowering. Both produce identical bits."""
    choice = os.environ.get("CTTS_WSOLA_BACKEND", "auto")
    if choice != "auto":
        return choice
    return "pallas" if jax.default_backend() != "cpu" else "xla"


def _roundup(x: int, m: int) -> int:
    return -(-x // m) * m


import functools as _functools


def _wsola_planes(inp, run_all, max_steps):
    """Kernel input planes for one sentence: the padded f32 plane (the
    kernel splits windows into exact bf16 halves in-register) and the
    shifted/stride-4 energy tables (values identical to the XLA path's
    sq where both read them), plus the dynamic run count."""
    S = inp.shape[0]
    SP = _roundup(S + 2048, 1024)
    pad2 = jnp.concatenate(
        [jnp.zeros(MAX_SHIFT, F32), inp, jnp.zeros(SP - S - MAX_SHIFT, F32)]
    )
    sq = _sliding_sumsq(pad2, OVERLAP)           # [SP - OVERLAP + 1]
    sqs = jnp.zeros(SP, F32).at[MAX_SHIFT:MAX_SHIFT + sq.shape[0]].set(sq)
    sq4 = sq[::4]
    # The kernel's coarse-energy load reads 2048 entries from 32k.
    S4P = _roundup(max(sq4.shape[0], 32 * max_steps + 2048), 1024)
    sq4p = jnp.zeros(S4P, F32).at[:sq4.shape[0]].set(sq4)
    nrun = jnp.sum(run_all.astype(jnp.int32))
    return pad2, sqs, sq4p, nrun


@_functools.lru_cache(maxsize=None)
def _frames_fn(hop: int, out_size: int, interpret: bool):
    """custom_vmap wrapper: unbatched calls run the per-sentence kernel;
    a vmapped call (the production core is vmapped over the batch)
    routes to the S-interleaved batch kernel — same bits
    (tests/test_pallas_wsola.py::test_batch_kernel_parity), ~Sx fewer
    serialized grid programs (the chain is latency-bound at ~2.5
    µs/frame and TPU grid programs serialize)."""
    from jax import custom_batching

    from ctts_tpu.ops.pallas.wsola import (
        batch_group_size,
        wsola_frames,
        wsola_frames_batch,
    )

    @custom_batching.custom_vmap
    def run(iv, sqs, sq4, input_count, nrun):
        return wsola_frames(
            iv, sqs, sq4, input_count, nrun, hop=hop,
            out_size=out_size, interpret=interpret)

    @run.def_vmap
    def run_vmap(axis_size, in_batched, iv, sqs, sq4,
                 input_count, nrun):
        def bc(x, b):
            return x if b else jnp.broadcast_to(
                x, (axis_size,) + jnp.shape(x))

        iv, sqs, sq4, input_count, nrun = (
            bc(v, b) for v, b in zip(
                (iv, sqs, sq4, input_count, nrun), in_batched))
        S = batch_group_size(iv.shape[1], sq4.shape[1], out_size)
        acc, norm = wsola_frames_batch(
            iv, sqs, sq4, input_count, nrun, hop=hop,
            out_size=out_size, S=S, interpret=interpret)
        return (acc, norm), (True, True)

    return run


def _frames_pallas(inp, input_count, run_all, max_steps, hop, out_size):
    """Pallas frame chain: build the kernel's input planes and run the
    per-sentence kernel (or, under vmap, the S-interleaved batch
    kernel — see _frames_fn). Returns the (acc, norm) OLA accumulators
    (the kernel accumulates in the C's frame order)."""
    iv, sqs, sq4p, nrun = _wsola_planes(inp, run_all, max_steps)
    return _frames_fn(
        hop, out_size, os.environ.get("CTTS_PALLAS_INTERPRET") == "1",
    )(iv, sqs, sq4p, input_count, nrun)


def synthesis_hop_for_speed(speed: float) -> int:
    """(size_t)(analysis_hop / clamped_speed), min 1 (ctts.c:3511-3512).
    Static per plan: the hop specializes the compiled program so the OLA
    write offsets are compile-time constants (vmap-friendly)."""
    import numpy as np

    s = min(max(np.float32(speed), np.float32(0.5)), np.float32(2.0))
    return max(int(np.float32(AHOP) / s), 1)


def _select_offset(corr: jnp.ndarray) -> jnp.ndarray:
    """Coarse(step 4)-then-fine(±3, skip center) selection with the C's
    strict-'>' earliest-offset tie-breaking (ctts.c:3436-3488). `corr` is
    [NCAND] with invalid candidates already masked to -inf."""
    offs = jnp.arange(NCAND) - MAX_SHIFT  # -128..128

    corr_c = corr[::4]
    bc = jnp.argmax(corr_c)
    best_corr = corr_c[bc]
    best_off = offs[bc * 4]
    # All candidates invalid → the C keeps offset 0 (best_corr = -2.0f).
    none_valid = jnp.isneginf(best_corr)
    best_off = jnp.where(none_valid, 0, best_off)
    best_corr = jnp.where(none_valid, F32(-2.0), best_corr)

    rel = jnp.arange(-3, 4)
    fidx = best_off + MAX_SHIFT + rel
    fok = (fidx >= 0) & (fidx <= 2 * MAX_SHIFT) & (rel != 0)
    corr_f = jnp.where(fok, corr[jnp.clip(fidx, 0, 2 * MAX_SHIFT)],
                       F32(-jnp.inf))
    bf = jnp.argmax(corr_f)
    improved = corr_f[bf] > best_corr
    return jnp.where(improved, best_off + rel[bf], best_off)


def time_stretch_device(
    inp: jnp.ndarray,
    input_count: jnp.ndarray,
    speed: jnp.ndarray,
    out_size: int,
    hop: int,
    unroll: int = 4,
):
    """Stretch inp[:input_count] by `speed` (with static synthesis hop
    `hop` = synthesis_hop_for_speed(speed)); returns (out, out_len).

    `out_size` must be ≥ num_frames * hop + FRAME + 1024 for the bucket's
    hop (device._omax_for sizes it; ≈ 2·len(inp) only at speed 0.5).
    When |speed-1| < 0.01 the input is passed through (ctts.c:3497-3503).

    Structure: the sequential part is ONLY the offset-selection chain.
    The scan carries two scalars (previous chosen offset + have_prev) and
    emits each frame's windowed contribution; the OLA accumulation into
    the output/normalization buffers happens OUTSIDE the scan as Jp =
    ceil(FRAME/hop) shifted block adds (synth positions are k*hop, k
    static). That removes the 4 out/norm slice+update memory ops and the
    2·out_size carry from every step — per-step cost on this backend
    tracks the count of non-fusable memory ops, not FLOPs.

    OLA-outside parity argument (bit-exact vs the sequential C order,
    ctts.c:3552-3566): the output adds are int16 wrapping adds of
    int16-valued contributions; ≤ 8 frames overlap any sample, so the
    f32 partial sums stay exact integers (< 2^19) and wrapping once at
    the end equals wrapping after every add (mod-2^16 homomorphism). The
    norm adds are genuine f32 ops whose ORDER matters: accumulating the
    shifted blocks in DESCENDING j applies frames in ascending k at
    every output position — the C's exact order (non-run frames add
    +0.0, which preserves value and sign for the non-negative norm).
    """
    S = inp.shape[0]
    window = hann(FRAME)

    speed = jnp.clip(speed, F32(0.5), F32(2.0))
    passthrough = jnp.abs(speed - F32(1.0)) < F32(0.01)

    num_frames = jnp.where(
        input_count > FRAME, (input_count - FRAME) // AHOP + 1, 1
    )
    alloc = num_frames * hop + FRAME + 1024  # dynamic logical cap

    max_steps = (S - FRAME) // AHOP + 2 if S > FRAME else 2
    # Static cap from the output capacity as well.
    max_steps = min(max_steps, (out_size - FRAME) // hop + 1)

    # Left-pad by MAX_SHIFT so candidate windows never index below 0, and
    # right-pad so the widest window slice stays in bounds.
    inp_pad = jnp.concatenate(
        [jnp.zeros(MAX_SHIFT, F32), inp, jnp.zeros(FRAME + MAX_SHIFT, F32)]
    )
    # Sliding candidate energies over the padded signal: energy of the
    # OVERLAP-window starting at padded position p.
    sq = _sliding_sumsq(inp_pad, OVERLAP)
    sq_pad = jnp.concatenate([sq, jnp.zeros(_WIN_W, F32)])

    io = jnp.arange(NCAND)
    ks = jnp.arange(max_steps)
    # Frame-run flags, precomputed outside the scan ([T] vector ops).
    run_all = ((ks * AHOP + FRAME <= input_count)
               & (ks * hop + FRAME <= alloc)
               & (ks * hop + FRAME <= out_size))

    def step(carry, xs):
        qo_prev, have_prev = carry
        k, run = xs
        nominal = k * AHOP

        # Window covering candidate offsets [-128, 128] + FRAME samples;
        # padded position of offset o's window start is nominal + o + 128
        # = win768 index o (win768 starts at padded pos nominal).
        win768 = lax.dynamic_slice(inp_pad, (nominal,), (_WIN_W,))
        wh, wl = split_hi_lo(win768)
        # ONE FRAME-wide stack pair serves both the search (its OVERLAP
        # prefix) and the frame fetch — same elements as the old
        # OVERLAP+AHOP stack pairs, half the slice ops.
        fh = _stack_windows(wh, FRAME)     # [257, 512]
        fl = _stack_windows(wl, FRAME)
        mh = fh[:, :OVERLAP]               # [257, 384] views
        ml = fl[:, :OVERLAP]

        # Previous frame's tail = OVERLAP window at padded position
        # prev_actual + AHOP = (nominal - AHOP + off_prev) + AHOP
        # = win768 index qo_prev = off_prev + MAX_SHIFT ∈ [0, 256].
        onehot_q = (io == qo_prev).astype(F32)
        th = onehot_q @ mh                 # exact picks, [384]
        tl = onehot_q @ ml

        # Exact integer numerators for all 257 candidates (MXU matvecs;
        # split halves are bf16-exact so even default precision is exact).
        hh = mh @ th
        mid = mh @ tl + ml @ th
        ll = ml @ tl
        num = combine_exact(hh, mid, ll, 256.0)        # [257]

        sq1 = lax.dynamic_slice(sq_pad, (nominal,), (NCAND,))
        sq2 = exact_sumsq_components(th, tl, lambda a, b: a @ b)

        denom = jnp.sqrt(sq1 * sq2)
        corr = jnp.where(denom < F32(1.0), F32(0.0), num / denom)

        pos = nominal + io - MAX_SHIFT
        valid = (pos >= 0) & (pos + FRAME <= input_count)
        corr = jnp.where(valid, corr, F32(-jnp.inf))

        offset = jnp.where(have_prev, _select_offset(corr), 0)
        actual = nominal + offset
        actual = jnp.where(
            actual + FRAME > input_count, input_count - FRAME, actual
        )
        actual = jnp.maximum(actual, 0)

        # Frame fetch: one-hot pick from the FRAME-wide stacks (the frame
        # at offset d starts at win768 index d + MAX_SHIFT).
        # Reconstruction 256*hi + lo of the exact picks is exact in f32.
        onehot_f = (io == (actual - nominal + MAX_SHIFT)).astype(F32)
        frame = F32(256.0) * (onehot_f @ fh) + onehot_f @ fl
        contrib = jnp.where(run, trunc16(frame * window), F32(0.0))

        # Next step's window starts AHOP later: qo = actual + AHOP
        # relative to (nominal + AHOP) - MAX_SHIFT.
        qo = actual - nominal + MAX_SHIFT
        qo_prev = jnp.where(run, qo, qo_prev)
        have_prev = have_prev | run
        return (qo_prev, have_prev), contrib

    # NOTE: a while_loop bounded by the input's own frame count was
    # tried and is 4.5x SLOWER under vmap: heterogeneous per-lane trip
    # counts make the batching rule select the ENTIRE carry every joint
    # step. The static scan's extra steps are cheap masked no-ops. On
    # TPU the Pallas kernel replaces the scan AND the OLA entirely
    # (same bits, dynamic per-sentence trip count, in-kernel
    # accumulation in the C's frame order); the scan + shifted-block
    # OLA below remain the CPU/test and fallback lowering.
    if _wsola_backend() == "pallas" and S % 1024 == 0:
        acc_f, norm = _frames_pallas(inp, input_count, run_all,
                                     max_steps, hop, out_size)
        out = wrap16(acc_f)
    else:
        from ctts_tpu.ops.device_ops import _vary

        _, contribs = lax.scan(
            step,
            (_vary(jnp.int32(0)), _vary(jnp.array(False))),
            (ks, run_all),
            unroll=unroll,
        )

        # --- OLA outside the scan: Jp shifted block adds -----------------
        Jp = -(-FRAME // hop)              # frames overlapping a sample
        padw = Jp * hop
        nb_out = -(-out_size // hop)
        nrows = max(nb_out, max_steps + Jp)
        cp = jnp.zeros((nrows, padw), F32)
        cp = cp.at[:max_steps, :FRAME].set(contribs)
        wrun = jnp.where(run_all[:, None], window[None, :], F32(0.0))
        wr = jnp.zeros((nrows, padw), F32)
        wr = wr.at[:max_steps, :FRAME].set(wrun)

        acc = jnp.zeros((nrows, hop), F32)
        nacc = jnp.zeros((nrows, hop), F32)
        for j in reversed(range(Jp)):      # descending j = ascending k
            blk = lax.slice(cp, (0, j * hop), (nrows, (j + 1) * hop))
            nblk = lax.slice(wr, (0, j * hop), (nrows, (j + 1) * hop))
            if j == 0:
                acc = acc + blk
                nacc = nacc + nblk
            else:
                acc = acc.at[j:].add(blk[:nrows - j])
                nacc = nacc.at[j:].add(nblk[:nrows - j])
        out = wrap16(acc.reshape(-1)[:out_size])
        norm = nacc.reshape(-1)[:out_size]

    # actual_len = (last run frame)*hop + FRAME (0 when no frame ran).
    any_run = jnp.any(run_all)
    last_k = jnp.max(jnp.where(run_all, ks, -1))
    actual_len = jnp.where(any_run, last_k * hop + FRAME, 0)

    good = norm > F32(0.01)
    val = q16(out / jnp.where(good, norm, F32(1.0)))
    i = jnp.arange(out_size)
    result = jnp.where((i < actual_len) & good, val,
                       jnp.where(i < actual_len, out, F32(0.0)))

    # Trim trailing zeros (ctts.c:3612-3614).
    nonzero = (result != F32(0.0)) & (i < actual_len)
    out_len = jnp.where(
        jnp.any(nonzero), jnp.max(jnp.where(nonzero, i, -1)) + 1, 0
    )

    # Passthrough for |speed-1| < 0.01.
    pass_out = jnp.zeros(out_size, F32).at[: min(S, out_size)].set(
        inp[: min(S, out_size)]
    )
    pass_out = jnp.where(i < input_count, pass_out, F32(0.0))
    result = jnp.where(passthrough, pass_out, result)
    out_len = jnp.where(passthrough, input_count, out_len)
    return result, out_len
