"""Microbenchmark the individual hot-path pieces at bench shapes, so the
stage-profile deltas (tools/profile_stages.py) can be attributed to
specific ops: prepare_base (one-hot bank materialization), the batched
pitch search (Pallas), the per-trip contrib pass, the Pallas placement
kernel, and boundary_heads.

Usage: python tools/microbench_parts.py [--iters 4]
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


PIPE = 16


def timeit(name, fn, iters):
    """Pipelined timing: queue PIPE dispatches, sync once at the end —
    the tunnel's per-sync round trip (~80-100 ms) otherwise swamps any
    op under ~30 ms. Reported per-call = (t_pipe - t_sync)/PIPE where
    t_sync is the one-call sync floor measured on the same op."""
    import jax
    t0 = time.perf_counter()
    np.asarray(fn())
    compile_s = time.perf_counter() - t0
    floor = []
    for _ in range(3):
        t0 = time.perf_counter()
        np.asarray(fn())
        floor.append(time.perf_counter() - t0)
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        for _ in range(PIPE - 1):
            fn()
        np.asarray(fn())
        ts.append(time.perf_counter() - t0)
    per = (min(ts) - min(floor)) / (PIPE - 1)
    print(f"# {name}: {per*1e3:.2f} ms/call "
          f"(sync floor {min(floor)*1e3:.1f} ms, compile {compile_s:.1f}s)",
          flush=True)
    return per


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=4)
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from bench import TEXTS, build_db
    import ctts_tpu.ops.device_ops as dops
    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.ops.exact import split_hi_lo
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.device import (
        DeviceVoice, bucket_dims, build_device_plan,
    )

    F32 = jnp.float32

    root = tempfile.mkdtemp(prefix="ctts_mb_")
    dbp = build_db(root)
    db = VoiceDatabase(dbp)
    config = config_defaults()
    voice = DeviceVoice(db)

    texts = TEXTS * 4
    plans = [compile_plan(db, t, config, None, 1.0) for t in texts]
    floor = {"U": 32, "R": 16, "FD": 8, "WREG": 32768, "SMAX": 114688,
             "CONTW": 16384}
    from ctts_tpu.synth.device import derive_dims, fill_device_plan, walk_plan
    import dataclasses
    walked = [walk_plan(p, db) for p in plans]
    all_dims = [derive_dims(w, db) for w in walked]
    dims = all_dims[0]
    for d in all_dims[1:]:
        dims = dataclasses.replace(
            dims,
            U=max(dims.U, d.U), R=max(dims.R, d.R), FD=max(dims.FD, d.FD),
            WREG=max(dims.WREG, d.WREG), SMAX=max(dims.SMAX, d.SMAX),
            OMAX=max(dims.OMAX, d.OMAX), CONTW=max(dims.CONTW, d.CONTW),
            FADEW=max(dims.FADEW, d.FADEW),
        )
    dims = bucket_dims(dims, floor)
    dplans = [fill_device_plan(w, db, dims) for w in walked]
    arrays = {
        k: jnp.asarray(np.stack([dp.arrays[k] for dp in dplans]))
        for k in dplans[0].arrays
    }
    np.asarray(arrays["unit_id"])
    B, U, UBUF, CFMAX = len(texts), dims.U, voice.ubuf, dims.CFMAX
    print(f"# B={B} U={U} UBUF={UBUF} CFMAX={CFMAX} R={dims.R} "
          f"WREG={dims.WREG}", flush=True)

    bank, bank_lens, gains = voice.bank, voice.lengths, voice.gains

    # --- prepare_base alone (one-hot bank materialization) -------------
    from ctts_tpu.ops.luts import fade_in_gain, fade_out_gain

    def prep(ar):
        uid = jnp.maximum(ar["unit_id"], 0)
        onehot = (uid[:, None] == jnp.arange(bank.shape[0])[None, :]
                  ).astype(F32)
        bh, bl = split_hi_lo(bank)
        x = (F32(256.0) * (onehot @ bh) + onehot @ bl)
        g = gains[uid]
        return jnp.sum(dops.q16(x * g[:, None]))

    jprep = jax.jit(jax.vmap(prep))
    timeit("prepare_base(matmul+q16)", lambda: jprep(arrays), args.iters)

    # --- fade curves alone ---------------------------------------------
    def fades(ar):
        it = jnp.arange(CFMAX)
        tmix = it[None, :].astype(F32) * (
            F32(1.0) / jnp.maximum(ar["unit_cf_in"], 1).astype(F32)[:, None]
        )
        return jnp.sum(fade_out_gain(tmix)) + jnp.sum(fade_in_gain(tmix))

    jfades = jax.jit(jax.vmap(fades))
    timeit("cf fade curves", lambda: jfades(arrays), args.iters)

    # --- batched pitch (pallas) on bench-like segments ------------------
    rng = np.random.default_rng(0)
    segs = jnp.asarray(
        rng.integers(-3000, 3000, (B * U, dops._PITCH_SPAN)).astype(
            np.float32))
    counts = jnp.asarray(
        rng.integers(100, 2000, B * U).astype(np.int32))

    jp = jax.jit(lambda s, c: jnp.sum(dops.estimate_pitch_batch(s, c)))
    timeit(f"estimate_pitch_batch[{B*U}]", lambda: jp(segs, counts),
           args.iters)

    jp2 = jax.jit(lambda s, c: jnp.sum(
        dops.estimate_pitch_batch(s, c, backend="conv")))
    timeit(f"estimate_pitch_batch[conv,{B*U}]", lambda: jp2(segs, counts),
           args.iters)

    # --- compose kernel alone -------------------------------------------
    from ctts_tpu.ops.pallas.compose import compose_units

    contrib = jnp.asarray(
        rng.integers(-3000, 3000, (B, U, UBUF)).astype(np.float32))
    fo = jnp.ones((B, U, CFMAX), F32)

    def compose_only(ar, ctb, fo_b):
        base_off = (ar["unit_region"] * dims.WREG + ar["unit_off"]
                    ).astype(jnp.int32)
        n_eff = jnp.where(ar["unit_id"] >= 0,
                          jnp.minimum(bank_lens[jnp.maximum(
                              ar["unit_id"], 0)], UBUF), 0).astype(jnp.int32)
        buf, seg, tail = compose_units(
            base_off, ar["unit_cf_in"].astype(jnp.int32), n_eff,
            ar["unit_analysis"].astype(jnp.int32),
            ctb, fo_b, U=U, UBUF=UBUF, CFMAX=CFMAX,
            TOT=dims.R * dims.WREG, export=False)
        return jnp.sum(buf)

    jco = jax.jit(jax.vmap(compose_only))
    timeit("compose kernel (no export)",
           lambda: jco(arrays, contrib, fo), args.iters)

    def compose_exp(ar, ctb, fo_b):
        base_off = (ar["unit_region"] * dims.WREG + ar["unit_off"]
                    ).astype(jnp.int32)
        n_eff = jnp.where(ar["unit_id"] >= 0,
                          jnp.minimum(bank_lens[jnp.maximum(
                              ar["unit_id"], 0)], UBUF), 0).astype(jnp.int32)
        buf, seg, tail = compose_units(
            base_off, ar["unit_cf_in"].astype(jnp.int32), n_eff,
            ar["unit_analysis"].astype(jnp.int32),
            ctb, fo_b, U=U, UBUF=UBUF, CFMAX=CFMAX,
            TOT=dims.R * dims.WREG, export=True)
        return jnp.sum(buf) + jnp.sum(seg) + jnp.sum(tail)

    jce = jax.jit(jax.vmap(compose_exp))
    timeit("compose kernel (export)",
           lambda: jce(arrays, contrib, fo), args.iters)

    # --- pitch_shift_blend batched ---------------------------------------
    heads = jnp.asarray(
        rng.integers(-3000, 3000, (B * U, CFMAX)).astype(np.float32))
    regions = jnp.asarray(
        rng.integers(0, CFMAX, B * U).astype(np.int32))
    factors = jnp.asarray(rng.uniform(0.9, 1.1, B * U).astype(np.float32))

    jblend = jax.jit(lambda h, r, f: jnp.sum(
        jax.vmap(dops.pitch_shift_blend)(h, r, f)))
    timeit(f"pitch_shift_blend[{B*U}]",
           lambda: jblend(heads, regions, factors), args.iters)


if __name__ == "__main__":
    main()
