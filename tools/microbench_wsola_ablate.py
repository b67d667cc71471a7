"""Ablate the WSOLA batch kernel to attribute its per-frame cost.

Variants strip phases of the per-frame step (NOT parity-preserving —
measurement only), built against the production kernel's own pieces
(_frame_coarse/_frame_decide/_frame_emit), so the numbers track the
shipped 3-phase S-interleaved structure:

  full       coarse -> decide -> emit+OLA (the real kernel's body)
  no_decide  coarse computed, offset forced to 0
  no_search  neither search (loads + emit + OLA only)
  no_ola     full decisions, OLA RMW skipped

Round-5 findings recorded in BASELINE.md: the original (pre-phase-
split) kernel measured coarse ~35 ms, circulant build 26 ms, argmax->
scalar->roll stalls 14-16 ms, base 31 ms on a 27.3k-frame batch-64;
the fixes took the chain 74.5 -> ~49 ms (sorted).
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
        LANES,
        MAX_SHIFT,
        _consts,
        _frame_coarse,
        _frame_decide,
        _frame_emit,
    )
    from ctts_tpu.ops.pallas.compose import flat_roll_left, flat_roll_right

    def kernel(scal_ref, iv_ref, sqs_ref, sq4_ref, win_ref,
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

        def load_rows_s(ref, s, pos):
            from jax.experimental.pallas import tpu as pltpu

            q8 = (pos // 1024) * 8
            j = (pos - (pos // 1024) * 1024) // 128
            w = ref[s, pl.ds(pl.multiple_of(q8, 8), 16), :]
            return pltpu.roll(w, (16 - j) % 16, 0)

        def load_rolled_s(ref, s, pos):
            q8 = (pos // 1024) * 8
            rem = pos - (pos // 1024) * 1024
            w = ref[s, pl.ds(pl.multiple_of(q8, 8), 16), :]
            return flat_roll_left(w, rem)

        def body(k, qos):
            nominal = k * AHOP
            st = []
            for s in range(S):
                input_count = scal_ref[0, s, 0]
                v = load_rows_s(iv_ref, s, nominal)
                sqv = load_rows_s(sqs_ref, s, nominal)
                if variant == "no_search":
                    st.append((v, None, None, None, None, None, None))
                    continue
                sv4 = load_rolled_s(sq4_ref, s, 32 * k)
                st.append((v, sqv) + _frame_coarse(
                    k, qos[s], input_count, v, sqv, sv4, consts))
            qo_all = []
            for s in range(S):
                input_count = scal_ref[0, s, 0]
                if variant in ("no_search", "no_decide"):
                    qo_all.append(jnp.clip(qos[s] + jnp.int32(1),
                                           0, 2 * MAX_SHIFT))
                    continue
                v, sqv, th_h, th_l, sq2, best_corr, best_off = st[s]
                qo_all.append(_frame_decide(
                    k, input_count, v, sqv, th_h, th_l, sq2,
                    best_corr, best_off, consts))
            new_qos = []
            for s in range(S):
                run_s = k < scal_ref[0, s, 1]
                qo, c16 = _frame_emit(qo_all[s], st[s][0], win4)
                c16 = jnp.where(run_s, c16, F32(0.0))
                n_add = jnp.where(run_s, win16, F32(0.0))
                new_qos.append(jnp.where(
                    run_s, jnp.clip(qo, 0, 2 * MAX_SHIFT), qos[s]))
                if variant == "no_ola":
                    acc_ref[s, pl.ds(0, 16), :] = \
                        acc_ref[s, pl.ds(0, 16), :] + c16
                    continue
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


def run_variant(variant, S, iv, sqs, sq4, ic, nrun, hop, out_size):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ctts_tpu.ops.luts import hann
    from ctts_tpu.ops.pallas import vmem_params
    from ctts_tpu.ops.pallas.wsola import FRAME, LANES, _roundup

    B, SP = iv.shape
    S4P = sq4.shape[1]
    OR = _roundup(out_size + 2048, 1024) // LANES
    assert B % S == 0
    kern = make_variant_kernel(hop, OR, S, variant)
    smem = functools.partial(pl.BlockSpec, memory_space=pltpu.SMEM)
    vmem = functools.partial(pl.BlockSpec, memory_space=pltpu.VMEM)
    scal = jnp.stack(
        [ic.astype(jnp.int32), nrun.astype(jnp.int32)], axis=1,
    ).reshape(B // S, S, 2)
    win4 = hann(FRAME).reshape(4, LANES)
    f = pl.pallas_call(
        kern,
        grid=(B // S,),
        out_shape=(jax.ShapeDtypeStruct((B, OR, LANES), F32),
                   jax.ShapeDtypeStruct((B, OR, LANES), F32)),
        in_specs=[smem((1, S, 2), lambda i: (i, 0, 0)),
                  vmem((S, SP // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((S, SP // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((S, S4P // LANES, LANES), lambda i: (i, 0, 0)),
                  vmem((4, LANES), lambda i: (0, 0))],
        out_specs=(vmem((S, OR, LANES), lambda i: (i, 0, 0)),
                   vmem((S, OR, LANES), lambda i: (i, 0, 0))),
        compiler_params=vmem_params(False),
    )
    return f(scal, iv.reshape(B, -1, LANES),
             sqs.reshape(B, -1, LANES), sq4.reshape(B, -1, LANES), win4)


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
    order = np.argsort(-counts, kind="stable")  # production sorts
    inp, counts = inp[order], counts[order]

    def planes(x, c):
        steps = jnp.arange(max_steps, dtype=jnp.int32)
        run_all = steps * 128 + FRAME <= c
        return _wsola_planes(x, run_all, max_steps)

    iv, sqs, sq4, nrun = jax.jit(jax.vmap(planes))(
        jnp.asarray(inp), jnp.asarray(counts))
    ic = jnp.asarray(counts)
    iv, sqs, sq4, nrun = jax.block_until_ready((iv, sqs, sq4, nrun))
    frames_total = int(np.asarray(nrun).sum())

    S = int(os.environ.get("ABL_S", "8"))
    variants = os.environ.get(
        "ABL_VARIANTS", "full,no_decide,no_search,no_ola").split(",")
    for variant in variants:
        f = jax.jit(functools.partial(
            run_variant, variant, S, hop=hop, out_size=out_size))
        jax.block_until_ready(f(iv, sqs, sq4, ic, nrun))
        ts = []
        for _ in range(4):
            t0 = time.perf_counter()
            jax.block_until_ready(f(iv, sqs, sq4, ic, nrun))
            ts.append(time.perf_counter() - t0)
        ms = float(np.median(ts)) * 1e3
        print(json.dumps({
            "variant": variant, "S": S, "ms": round(ms, 2),
            "us_per_frame": round(ms * 1e3 / frames_total, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
