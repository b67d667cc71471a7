"""Ablate the WSOLA batch kernel to attribute the ~2.9 us/frame cost.

Variants strip parts of the per-frame step (NOT parity-preserving —
measurement only): full, no_fine (skip the fine search), no_search
(offset always 0), no_ola (skip the accumulate RMW), loads_only.
"""

from __future__ import annotations

import functools
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32
SPEED = 1.5


def make_variant_kernel(hop, OR, S, variant):
    from jax.experimental import pallas as pl

    from ctts_tpu.ops.pallas.wsola import (
        AHOP,
        FRAME,
        LANES,
        MAX_SHIFT,
        _BIG,
        _circulant,
        _consts,
        _corr_at,
        _first_argmax,
        _LOADW,
    )
    from ctts_tpu.ops.pallas.compose import flat_roll_left, flat_roll_right

    def frame_step(k, qo_prev, input_count, vh, vl, sqv, sv4, win4, consts):
        up4, up1, ai, bi, cc, c_ok = consts
        big = jnp.int32(_BIG)
        nominal = k * AHOP
        if variant == "loads_only":
            qo = jnp.clip(qo_prev + jnp.int32(1), 0, 2 * MAX_SHIFT)
            f4h = flat_roll_left(vh, qo)[:4]
            f4l = flat_roll_left(vl, qo)[:4]
            frame = F32(256.0) * f4h + f4l
            contrib = jnp.trunc(frame * win4)
            c16 = jnp.concatenate([contrib, jnp.zeros((12, LANES), F32)])
            return qo, c16
        th_h = flat_roll_left(vh, qo_prev)[:3]
        th_l = flat_roll_left(vl, qo_prev)[:3]
        sq2 = jnp.max(flat_roll_left(sqv, qo_prev + MAX_SHIFT)[0:1, 0:1])
        if variant == "search_offpath":
            # Full coarse compute, result kept live through c16 (cheap
            # vector add) but NOT feeding qo: cuts the argmax->scalar->
            # roll dependency chain to measure how much of the coarse
            # cost is latency vs throughput.
            ct4h = _circulant(th_h, 4, 5)
            ct4l = _circulant(th_l, 4, 5)
            sq1c = jnp.concatenate([
                sv4[0:1],
                flat_roll_left(sv4, 32)[0:1],
                flat_roll_left(sv4, 64)[0:1],
                jnp.zeros((5, LANES), F32),
            ])
            corr_c = _corr_at(vh[:8], vl[:8], vh[1:9], vl[1:9],
                              ct4h, ct4l, up4, sq1c, sq2)
            qo = jnp.clip(qo_prev + jnp.int32(1), 0, 2 * MAX_SHIFT)
            f4h = flat_roll_left(vh, qo)[:4]
            f4l = flat_roll_left(vl, qo)[:4]
            frame = F32(256.0) * f4h + f4l
            contrib = jnp.trunc(frame * win4)
            c16 = jnp.concatenate(
                [contrib + F32(1e-30) * corr_c[:4],
                 jnp.zeros((12, LANES), F32)])
            return qo, c16
        if variant == "no_search":
            best_off = jnp.int32(0) + (th_h[0, 0] > F32(1e30)).astype(
                jnp.int32)  # keep th live
            offset = best_off
        elif variant in ("no_circulant", "no_dots", "no_divide",
                         "no_argmax"):
            if variant == "no_circulant":
                ct4h = jnp.broadcast_to(th_h[0], (LANES, LANES)) \
                    + F32(0.0)
                ct4l = jnp.broadcast_to(th_l[0], (LANES, LANES))
            else:
                ct4h = _circulant(th_h, 4, 5)
                ct4l = _circulant(th_l, 4, 5)
            sq1c = jnp.concatenate([
                sv4[0:1],
                flat_roll_left(sv4, 32)[0:1],
                flat_roll_left(sv4, 64)[0:1],
                jnp.zeros((5, LANES), F32),
            ])
            if variant == "no_dots":
                corr_c = ct4h[:8] + ct4l[:8] + sq1c * sq2
            elif variant == "no_divide":
                BF = jnp.bfloat16
                lo_m = jnp.bfloat16(1.0) - up4
                cth, ctl = ct4h.astype(BF), ct4l.astype(BF)
                cu_h, cl_h = cth * up4, cth * lo_m
                cu_l, cl_l = ctl * up4, ctl * lo_m
                Ra = jnp.concatenate([vh[:8], vl[:8]]).astype(BF)
                Rb = jnp.concatenate([vh[1:9], vl[1:9]]).astype(BF)
                from ctts_tpu.ops.pallas.wsola import _DN, _gsum
                def dotT(r, c):
                    return lax.dot_general(
                        r, c, _DN, preferred_element_type=F32)
                d1 = dotT(Ra, cu_h); d2 = dotT(Rb, cl_h)
                d3 = dotT(Ra, cu_l); d4 = dotT(Rb, cl_l)
                hh = _gsum(d1[:8] + d2[:8])
                mid = _gsum(d3[:8] + d4[:8] + d1[8:] + d2[8:])
                ll = _gsum(d3[8:] + d4[8:])
                corr_c = (F32(65536.0) * hh + F32(256.0) * mid + ll
                          + sq1c * sq2)  # keep energies live, no sqrt/div
            else:
                corr_c = _corr_at(vh[:8], vl[:8], vh[1:9], vl[1:9],
                                  ct4h, ct4l, up4, sq1c, sq2)
            if variant == "no_argmax":
                qo = jnp.clip(qo_prev + jnp.int32(1), 0, 2 * MAX_SHIFT)
                f4h = flat_roll_left(vh, qo)[:4]
                f4l = flat_roll_left(vl, qo)[:4]
                frame = F32(256.0) * f4h + f4l
                contrib = jnp.trunc(frame * win4)
                c16 = jnp.concatenate(
                    [contrib + F32(1e-30) * corr_c[:4],
                     jnp.zeros((12, LANES), F32)])
                return qo, c16
            pos_c = nominal + 4 * cc - MAX_SHIFT
            valid_c = c_ok & (pos_c >= 0) & (pos_c + FRAME <= input_count)
            corr_c = jnp.where(valid_c, corr_c, -jnp.inf)
            best_corr, bc = _first_argmax(corr_c, jnp.where(c_ok, cc, big))
            best_off = 4 * bc - MAX_SHIFT
            none_valid = best_corr == -jnp.inf
            best_off = jnp.where(none_valid, 0, best_off)
            offset = best_off
        else:
            ct4h = _circulant(th_h, 4, 5)
            ct4l = _circulant(th_l, 4, 5)
            sq1c = jnp.concatenate([
                sv4[0:1],
                flat_roll_left(sv4, 32)[0:1],
                flat_roll_left(sv4, 64)[0:1],
                jnp.zeros((5, LANES), F32),
            ])
            corr_c = _corr_at(vh[:8], vl[:8], vh[1:9], vl[1:9],
                              ct4h, ct4l, up4, sq1c, sq2)
            pos_c = nominal + 4 * cc - MAX_SHIFT
            valid_c = c_ok & (pos_c >= 0) & (pos_c + FRAME <= input_count)
            corr_c = jnp.where(valid_c, corr_c, -jnp.inf)
            best_corr, bc = _first_argmax(corr_c, jnp.where(c_ok, cc, big))
            best_off = 4 * bc - MAX_SHIFT
            none_valid = best_corr == -jnp.inf
            best_off = jnp.where(none_valid, 0, best_off)
            best_corr = jnp.where(none_valid, F32(-2.0), best_corr)
            if variant == "no_fine":
                offset = best_off
            else:
                if variant == "fine_fixedoff":
                    # Cut the coarse-argmax -> scalar -> fine-roll
                    # dependency: static fine base, all work kept.
                    fidx0 = jnp.int32(125)
                elif variant == "fine_oldscalar":
                    # Dynamic rolls, but fed by the PREVIOUS frame's
                    # scalar: distinguishes dynamic-roll throughput
                    # cost from fresh-argmax dependency latency.
                    fidx0 = jnp.clip(qo_prev, 0, 250)
                else:
                    fidx0 = best_off + MAX_SHIFT - 3
                fh = flat_roll_left(vh, (fidx0 + _LOADW) % _LOADW)
                fl = flat_roll_left(vl, (fidx0 + _LOADW) % _LOADW)
                ct1h = _circulant(th_h, 1, 3)
                ct1l = _circulant(th_l, 1, 3)
                sq1f = jnp.concatenate([
                    flat_roll_left(sqv, fidx0 + MAX_SHIFT)[0:1],
                    jnp.zeros((7, LANES), F32),
                ])
                corr_f = _corr_at(fh[:8], fl[:8], fh[1:9], fl[1:9],
                                  ct1h, ct1l, up1, sq1f, sq2)
                fpos = fidx0 + bi
                f_ok = (ai == 0) & (bi < 7) & (bi != 3) & (fpos >= 0) & \
                    (fpos <= 2 * MAX_SHIFT) & \
                    (nominal + fpos - MAX_SHIFT >= 0) & \
                    (nominal + fpos - MAX_SHIFT + FRAME <= input_count)
                corr_f = jnp.where(f_ok, corr_f, -jnp.inf)
                fine_corr, bf = _first_argmax(
                    corr_f, jnp.where(ai == 0, bi, big))
                improved = fine_corr > best_corr
                offset = jnp.where(improved, best_off + bf - 3, best_off)

        offset = jnp.where(k > 0, offset, 0)
        actual = nominal + offset
        actual = jnp.where(actual + FRAME > input_count,
                           input_count - FRAME, actual)
        actual = jnp.maximum(actual, 0)
        qo = actual - nominal + MAX_SHIFT

        f4h = flat_roll_left(vh, qo)[:4]
        f4l = flat_roll_left(vl, qo)[:4]
        frame = F32(256.0) * f4h + f4l
        contrib = jnp.trunc(frame * win4)
        c16 = jnp.concatenate([contrib, jnp.zeros((12, LANES), F32)])
        return qo, c16

    def kernel(scal_ref, ih_ref, il_ref, sqs_ref, sq4_ref, win_ref,
               acc_ref, norm_ref):
        for s in range(S):
            acc_ref[s] = jnp.zeros((OR, LANES), F32)
            norm_ref[s] = jnp.zeros((OR, LANES), F32)
        win4 = win_ref[:]
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

        def body(k, qos):
            nominal = k * AHOP
            new_qos = []
            for s in range(S):
                run_s = k < scal_ref[0, s, 1]
                input_count = scal_ref[0, s, 0]
                vh = load_rolled_s(ih_ref, s, nominal)
                vl = load_rolled_s(il_ref, s, nominal)
                sqv = load_rolled_s(sqs_ref, s, nominal)
                sv4 = load_rolled_s(sq4_ref, s, 32 * k)
                qo, c16 = frame_step(k, qos[s], input_count,
                                     vh, vl, sqv, sv4, win4, consts)
                c16 = jnp.where(run_s, c16, F32(0.0))
                n_add = jnp.where(run_s, win16, F32(0.0))
                new_qos.append(jnp.where(
                    run_s, jnp.clip(qo, 0, 2 * MAX_SHIFT), qos[s]))
                if variant != "no_ola":
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
                else:
                    acc_ref[s, pl.ds(0, 16), :] = \
                        acc_ref[s, pl.ds(0, 16), :] + c16
            return tuple(new_qos)

        lax.fori_loop(0, nrun_max, body, (jnp.int32(0),) * S)

    return kernel


def run_variant(variant, S, ih, il, sqs, sq4, ic, nrun, hop, out_size):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ctts_tpu.ops.luts import hann
    from ctts_tpu.ops.pallas import vmem_params
    from ctts_tpu.ops.pallas.wsola import FRAME, LANES, _roundup

    B, SP = ih.shape
    S4P = sq4.shape[1]
    OR = _roundup(out_size + 2048, 1024) // LANES
    Bp = -(-B // S) * S
    assert Bp == B
    kern = make_variant_kernel(hop, OR, S, variant)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    scal = jnp.stack(
        [ic.astype(jnp.int32), nrun.astype(jnp.int32)], axis=1,
    ).reshape(Bp // S, S, 2)
    win4 = hann(FRAME).reshape(4, LANES)
    f = pl.pallas_call(
        kern,
        grid=(Bp // S,),
        out_shape=(jax.ShapeDtypeStruct((Bp, OR, LANES), F32),
                   jax.ShapeDtypeStruct((Bp, OR, LANES), F32)),
        in_specs=[smem((1, S, 2), lambda i: (i, 0, 0)),
                  vmem((S, SP // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((S, SP // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((S, SP // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((S, S4P // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((4, LANES), lambda i: (0, 0))],
        out_specs=(vmem((S, OR, LANES), lambda i: (i, 0, 0)),
                   vmem((S, OR, LANES), lambda i: (i, 0, 0))),
        compiler_params=vmem_params(False),
    )
    return f(scal, ih.reshape(Bp, -1, LANES), il.reshape(Bp, -1, LANES),
             sqs.reshape(Bp, -1, LANES), sq4.reshape(Bp, -1, LANES), win4)


def main():
    B = 64
    SLEN = 131072
    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ctts_tpu.ops.wsola_jax import (
        FRAME,
        _wsola_planes,
        synthesis_hop_for_speed,
    )

    hop = synthesis_hop_for_speed(SPEED)
    max_steps = (SLEN - FRAME) // 128 + 2
    out_size = -(-(max_steps * hop + FRAME + 1024) // 1024) * 1024

    rng = np.random.default_rng(0)
    t = np.arange(SLEN, dtype=np.float32)
    inp = np.zeros((B, SLEN), np.float32)
    counts = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(40000, 70000))
        f0 = float(rng.uniform(90, 260))
        x = (6000 * np.sin(2 * np.pi * f0 * t[:n] / 22050)
             + rng.normal(0, 400, n))
        inp[b, :n] = np.trunc(np.clip(x, -32768, 32767))
        counts[b] = n

    def planes(x, c):
        steps = jnp.arange(max_steps, dtype=jnp.int32)
        run_all = steps * 128 + FRAME <= c
        return _wsola_planes(x, run_all, max_steps)

    ih, il, sqs, sq4, nrun = jax.jit(jax.vmap(planes))(
        jnp.asarray(inp), jnp.asarray(counts))
    ic = jnp.asarray(counts)
    ih, il, sqs, sq4, nrun = jax.block_until_ready((ih, il, sqs, sq4, nrun))
    frames_total = int(np.asarray(nrun).sum())

    S = int(os.environ.get("ABL_S", "8"))
    variants = os.environ.get(
        "ABL_VARIANTS",
        "full,no_fine,no_search,no_ola,loads_only,search_offpath"
    ).split(",")
    for variant in variants:
        f = jax.jit(functools.partial(
            run_variant, variant, S,
            hop=hop, out_size=out_size))
        r = jax.block_until_ready(f(ih, il, sqs, sq4, ic, nrun))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(ih, il, sqs, sq4, ic, nrun))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(json.dumps({
            "variant": variant, "S": S, "ms": round(ms, 2),
            "us_per_frame": round(ms * 1e3 / frames_total, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
