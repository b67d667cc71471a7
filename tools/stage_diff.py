"""Diff every synthesis stage between the live backend and a CPU oracle
run of the SAME stage core (CTTS_STAGE_RAW=1 makes build_core return the
raw intermediate instead of a checksum).

The CPU device path is exactly oracle-parity on the target utterance, so
the first stage whose TPU intermediate diverges beyond the int16-lattice
budget localizes a TPU-only numerical bug. Gated lowerings are forced to
the SAME variant on both backends via the CTTS_* env switches so the
intermediates are comparable bit-for-bit (garbage in masked lanes aside).

Usage: CTTS_STAGE_RAW=1 CTTS_CONTOUR_GRAIN=128 CTTS_SEG_EXTRACT=topk \
       CTTS_COMPOSE_BACKEND=xla CTTS_PITCH_BACKEND=xla \
       python tools/stage_diff.py [--stages s1,s2,...] [--text "..."]
Writes per-stage arrays to /tmp/stage_<backend>_<stage>.npy and prints
max-abs diffs once both backends have run (run TPU first, then
JAX_PLATFORMS=cpu re-run diffs against the saved TPU arrays).
"""

from __future__ import annotations

import argparse
import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEF_TEXT = ("o brasil é um país muito grande com muitas cidades bonitas e "
            "pessoas simpáticas que adoram futebol e música")

STAGES = ["head_pitch", "contrib", "scanonly", "compose1", "compose",
          "fades", "segtables", "move", "contour_in", "contour_sel",
          "contour_ola", "contour_merge", "contour", "assemble"]


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--stages", type=str, default=",".join(STAGES))
    ap.add_argument("--text", type=str, default=DEF_TEXT)
    args = ap.parse_args()
    os.environ["CTTS_STAGE_RAW"] = "1"

    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/tmp/ctts_jax_cache")

    from bench import build_db
    from ctts_tpu.config import load_config
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.device import (
        DeviceVoice, bucket_dims, build_core, derive_dims,
        fill_device_plan, shared_plan_values, walk_plan,
    )
    from ctts_tpu.text.rules import NormalizationRules

    root = tempfile.mkdtemp(prefix="ctts_sdiff_")
    dbp = build_db(root)
    db = VoiceDatabase(dbp)
    config = load_config("/root/reference/config.yaml")
    rules = NormalizationRules.load("/root/reference/normalization.csv",
                                    verbose=False, flavor="glibc")
    voice = DeviceVoice(db)

    plan = compile_plan(db, args.text, config, rules, 1.0)
    walked = walk_plan(plan, db)
    floor = {"U": 64, "R": 16, "FD": 8, "WREG": 65536, "SMAX": 262144,
             "CONTW": 32768, "WIN": 8192, "CFMAX": 4096}
    dims = bucket_dims(derive_dims(walked, db), floor)
    dplan = fill_device_plan(walked, db, dims)
    stacked = {k: np.stack([v]) for k, v in dplan.arrays.items()}
    arrays = {k: jnp.asarray(v) for k, v in stacked.items()}
    shared = {
        k: jnp.asarray(v)
        for k, v in shared_plan_values(stacked, voice.lengths,
                                       dims).items()
    }

    backend = jax.default_backend()
    for stage in args.stages.split(","):
        core = build_core(dims, voice.ubuf, stage)

        def with_shared(bank, lens, gains, ar, sh, _core=core):
            a = dict(ar)
            a.update(sh)
            return _core(bank, lens, gains, a)

        fn = jax.jit(jax.vmap(with_shared,
                              in_axes=(None, None, None, 0, None)))
        x = np.asarray(
            fn(voice.bank, voice.lengths, voice.gains, arrays, shared)[0])
        np.save(f"/tmp/stage_{backend}_{stage}.npy", x)
        other = f"/tmp/stage_cpu_{stage}.npy" if backend != "cpu" else \
            f"/tmp/stage_tpu_{stage}.npy"
        msg = ""
        if os.path.exists(other):
            y = np.load(other)
            if y.shape == x.shape:
                d = np.abs(x.astype(np.float64) - y.astype(np.float64))
                msg = (f" | vs other: nbad32 {(d > 32).sum()} "
                       f"max {d.max():.1f} nne {(d > 0).sum()}")
            else:
                msg = f" | shape mismatch {x.shape} vs {y.shape}"
        print(f"{stage}: shape {x.shape}{msg}", flush=True)


if __name__ == "__main__":
    main()
