"""Per-stage device profiling via stage-ablated cores.

The synthesis core is one jitted program; `build_core(..., stage=S)`
truncates it after stage S and returns a checksum, so wall-clock deltas
between consecutive stages attribute device time per stage. Timing is by
forced host transfer (block_until_ready is unreliable on the axon
backend — CLAUDE.md).

Usage:  python tools/profile_stages.py [--speed 1.5] [--mult 4] [--iters 3]
Prints one JSON object with per-stage seconds.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

STAGES = ["head_pitch", "compose", "fades", "segtables", "move",
          "contour", "assemble", "checksum", "full"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--speed", type=float, default=1.0)
    ap.add_argument("--mult", type=int, default=4)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--stages", type=str, default=",".join(STAGES))
    args = ap.parse_args()

    import jax

    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    import jax.numpy as jnp

    from bench import TEXTS, build_db
    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.device import (
        DeviceVoice, bucket_dims, build_core, build_device_plan,
        shared_plan_values,
    )

    root = tempfile.mkdtemp(prefix="ctts_prof_")
    dbp = build_db(root)
    db = VoiceDatabase(dbp)
    config = config_defaults()
    voice = DeviceVoice(db)

    texts = TEXTS * args.mult
    if os.environ.get("CTTS_PROF_NO_Q") == "1":
        # Strip interrogatives: isolates the qfinal while_loop's share
        # of the contour stage (empty qf set ⇒ zero trips).
        texts = [t.replace("?", ".") for t in texts]
    t0 = time.perf_counter()
    plans = [compile_plan(db, t, config, None, args.speed) for t in texts]
    t_plan = time.perf_counter() - t0

    floor = {"U": 32, "R": 16, "FD": 8, "WREG": 32768, "SMAX": 114688,
             "CONTW": 16384}
    t0 = time.perf_counter()
    from ctts_tpu.synth.device import derive_dims, fill_device_plan, walk_plan
    walked = [walk_plan(p, db) for p in plans]
    # Length-sort like the production batcher (batch.py _length_order):
    # WSOLA lockstep groups otherwise run to their longest member.
    walked.sort(key=lambda w: -w.total_len)
    all_dims = [derive_dims(w, db) for w in walked]
    import dataclasses
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
    t_lower = time.perf_counter() - t0

    t0 = time.perf_counter()
    stacked = {
        k: np.stack([dp.arrays[k] for dp in dplans])
        for k in dplans[0].arrays
    }
    arrays = {k: jnp.asarray(v) for k, v in stacked.items()}
    shared = {
        k: jnp.asarray(v)
        for k, v in shared_plan_values(stacked, voice.lengths, dims).items()
    }
    np.asarray(arrays["unit_id"])  # force upload
    t_stack = time.perf_counter() - t0

    total_audio = 0.0
    report = {
        "host_plan_s": round(t_plan, 3),
        "host_lower_s": round(t_lower, 3),
        "stack_upload_s": round(t_stack, 3),
        "batch": len(texts), "dims": str(dims),
    }

    want = args.stages.split(",")
    prev = 0.0
    for stage in want:
        sc = build_core(dims, voice.ubuf, stage)

        def with_shared(bank, lens, gains, ar, sh):
            a = dict(ar)
            a.update(sh)
            return sc(bank, lens, gains, a)

        core = jax.jit(jax.vmap(with_shared,
                                in_axes=(None, None, None, 0, None)))
        t0 = time.perf_counter()
        res = core(voice.bank, voice.lengths, voice.gains, arrays, shared)
        out, out_len = res[0], res[1]
        np.asarray(out)  # forced transfer = sync
        compile_s = time.perf_counter() - t0

        ts = []
        for _ in range(args.iters):
            t0 = time.perf_counter()
            res = core(voice.bank, voice.lengths, voice.gains, arrays,
                       shared)
            out, out_len = res[0], res[1]
            o = np.asarray(out)
            ts.append(time.perf_counter() - t0)
        best = min(ts)
        report[stage] = round(best, 4)
        report[stage + "_delta"] = round(best - prev, 4)
        report[stage + "_compile_s"] = round(compile_s, 1)
        prev = best
        if stage == "full":
            lens = np.asarray(out_len)
            total_audio = float(lens.sum()) / 22050.0
            report["audio_s"] = round(total_audio, 2)
            report["rtf"] = round(total_audio / best, 1)
        print(f"# {stage}: {best:.4f}s (compile {compile_s:.1f}s)",
              file=sys.stderr, flush=True)

    print(json.dumps(report))


if __name__ == "__main__":
    main()
