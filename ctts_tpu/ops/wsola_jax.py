"""WSOLA time stretch on device (parity: ctts.c:3378-3617).

The frame chain is inherently sequential (each search correlates against
the previously *chosen* frame), so this is a `lax.scan` over frame slots;
throughput comes from vmapping the scan over sentence batches. Each step
evaluates the reference's coarse(step 4)-then-fine search; correlations
for all candidate offsets of one phase are computed as a batched masked
dot against the previous frame's tail.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
from jax import lax

from ctts_tpu.ops.luts import hann
from ctts_tpu.ops.quant import q16, trunc16, wrap16

F32 = jnp.float32

FRAME = 512
AHOP = 128          # analysis hop (75% overlap)
OVERLAP = FRAME - AHOP  # 384
MAX_SHIFT = 128     # ±25% of frame


_SEG = OVERLAP + 2 * MAX_SHIFT  # 640: window covering all candidates


def _search(inp_pad, input_count, prev_frame, nominal):
    """find_best_match_wsola: coarse step-4 scan then ±3 fine refinement
    (ctts.c:3436-3488). All 257 candidate correlations are computed with
    two `jnp.correlate` calls (XLA conv) over one 640-sample window;
    selection replicates the C's coarse-then-fine order with strict-'>'
    (earliest-offset) tie-breaking.

    `inp_pad` is the input left-padded with MAX_SHIFT zeros, so candidate
    window [nominal+off, +OVERLAP) lives at inp_pad[nominal+off+MAX_SHIFT].
    """
    target = prev_frame[FRAME - OVERLAP:]

    seg = lax.dynamic_slice(inp_pad, (nominal,), (_SEG,))
    num = jnp.correlate(seg, target, mode="valid", precision=lax.Precision.HIGHEST)                # [257]
    sq1 = jnp.correlate(seg * seg, jnp.ones(OVERLAP, F32), mode="valid", precision=lax.Precision.HIGHEST)
    sq2 = jnp.sum(target * target)

    denom = jnp.sqrt(sq1 * sq2)
    corr = jnp.where(denom < F32(1.0), F32(0.0), num / denom)

    offs = jnp.arange(2 * MAX_SHIFT + 1) - MAX_SHIFT              # -128..128
    pos = nominal + offs
    valid = (pos >= 0) & (pos + FRAME <= input_count)
    corr = jnp.where(valid, corr, F32(-jnp.inf))

    # Coarse pass: offsets -128..128 step 4.
    corr_c = corr[::4]
    bc = jnp.argmax(corr_c)
    best_corr = corr_c[bc]
    best_off = offs[bc * 4]
    # All candidates invalid → the C keeps offset 0 (best_corr = -2.0f).
    none_valid = jnp.isneginf(best_corr)
    best_off = jnp.where(none_valid, 0, best_off)

    # Fine pass: ±3 around the coarse winner, skipping it.
    rel = jnp.arange(-3, 4)
    fidx = best_off + MAX_SHIFT + rel
    fok = (fidx >= 0) & (fidx <= 2 * MAX_SHIFT) & (rel != 0)
    corr_f = jnp.where(fok, corr[jnp.clip(fidx, 0, 2 * MAX_SHIFT)],
                       F32(-jnp.inf))
    bf = jnp.argmax(corr_f)
    improved = corr_f[bf] > best_corr
    return jnp.where(improved, best_off + rel[bf], best_off)


def synthesis_hop_for_speed(speed: float) -> int:
    """(size_t)(analysis_hop / clamped_speed), min 1 (ctts.c:3511-3512).
    Static per plan: the hop specializes the compiled program so the OLA
    write offsets are compile-time constants (vmap-friendly)."""
    import numpy as np

    s = min(max(np.float32(speed), np.float32(0.5)), np.float32(2.0))
    return max(int(np.float32(AHOP) / s), 1)


def time_stretch_device(
    inp: jnp.ndarray,
    input_count: jnp.ndarray,
    speed: jnp.ndarray,
    out_size: int,
    hop: int,
):
    """Stretch inp[:input_count] by `speed` (with static synthesis hop
    `hop` = synthesis_hop_for_speed(speed)); returns (out, out_len).

    `out_size` must be ≥ 2 * len(inp) + 2048 (worst case speed 0.5).
    When |speed-1| < 0.01 the input is passed through (ctts.c:3497-3503).
    """
    S = inp.shape[0]
    window = hann(FRAME)

    speed = jnp.clip(speed, F32(0.5), F32(2.0))
    passthrough = jnp.abs(speed - F32(1.0)) < F32(0.01)

    synthesis_hop = hop

    num_frames = jnp.where(
        input_count > FRAME, (input_count - FRAME) // AHOP + 1, 1
    )
    alloc = num_frames * synthesis_hop + FRAME + 1024  # dynamic logical cap

    max_steps = (S - FRAME) // AHOP + 2 if S > FRAME else 2
    # Static cap from the output capacity as well.
    max_steps = min(max_steps, (out_size - FRAME) // hop + 1)

    # Left-pad once so the search window never clamps (see _search).
    inp_pad = jnp.concatenate(
        [jnp.zeros(MAX_SHIFT, F32), inp, jnp.zeros(FRAME, F32)]
    )

    def step(carry, k):
        out, norm, prev_frame, have_prev, actual_len = carry
        nominal = k * AHOP
        synth_pos = k * synthesis_hop

        run = (nominal + FRAME <= input_count) & (synth_pos + FRAME <= alloc) \
            & (synth_pos + FRAME <= out_size)

        offset = jnp.where(
            have_prev, _search(inp_pad, input_count, prev_frame, nominal), 0
        )
        actual = nominal + offset
        actual = jnp.where(
            actual + FRAME > input_count, input_count - FRAME, actual
        )
        actual = jnp.maximum(actual, 0)

        frame = lax.dynamic_slice(inp, (actual,), (FRAME,))
        contrib = trunc16(frame * window)

        seg = lax.dynamic_slice(out, (synth_pos,), (FRAME,))
        seg = wrap16(seg + jnp.where(run, contrib, F32(0.0)))
        out = lax.dynamic_update_slice(out, seg, (synth_pos,))

        nseg = lax.dynamic_slice(norm, (synth_pos,), (FRAME,))
        nseg = nseg + jnp.where(run, window, F32(0.0))
        norm = lax.dynamic_update_slice(norm, nseg, (synth_pos,))

        prev_frame = jnp.where(run, frame, prev_frame)
        have_prev = have_prev | run
        actual_len = jnp.where(run, jnp.maximum(actual_len, synth_pos + FRAME),
                               actual_len)
        return (out, norm, prev_frame, have_prev, actual_len), None

    out0 = jnp.zeros(out_size, F32)
    norm0 = jnp.zeros(out_size, F32)
    prev0 = jnp.zeros(FRAME, F32)
    (out, norm, _, _, actual_len), _ = lax.scan(
        step, (out0, norm0, prev0, jnp.array(False), jnp.array(0)),
        jnp.arange(max_steps),
    )

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
