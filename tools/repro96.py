"""Repro harness for the golden-TPU 96_decl_very_long parity failure.

Synthesizes the one >16-region corpus utterance at the acceptance floor
dims (its own R=32 bucket) on the live backend and diffs against the
NumPy oracle, honoring CTTS_COMPOSE_BACKEND / CTTS_PITCH_BACKEND /
CTTS_WSOLA_BACKEND for bisection.
"""

from __future__ import annotations

import os
import sys
import tempfile

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TEXT = ("o brasil é um país muito grande com muitas cidades bonitas e "
        "pessoas simpáticas que adoram futebol e música")


def main() -> None:
    import jax

    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from bench import build_db
    from ctts_tpu.config import load_config
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.oracle import execute_plan_oracle
    from ctts_tpu.text.rules import NormalizationRules

    root = tempfile.mkdtemp(prefix="ctts_repro96_")
    dbp = build_db(root)
    db = VoiceDatabase(dbp)
    config = load_config("/root/reference/config.yaml")
    rules = NormalizationRules.load("/root/reference/normalization.csv",
                                    verbose=False, flavor="glibc")
    floor = {"U": 64, "R": 16, "FD": 8, "WREG": 65536,
             "SMAX": 262144, "CONTW": 32768, "WIN": 8192, "CFMAX": 4096}
    bs = BatchSynthesizer(db, config, rules=rules, dims_floor=floor)
    got = bs.synthesize([TEXT], speed=1.0)[0]

    plan = compile_plan(db, TEXT, config, rules, 1.0)
    ref = execute_plan_oracle(plan, db)
    print("lens", len(ref), len(got))
    n = min(len(ref), len(got))
    diff = np.abs(ref[:n].astype(np.int32) - got[:n].astype(np.int32))
    bad = int((diff > 32).sum())
    print("backend", jax.default_backend(),
          "COMPOSE_BACKEND", os.environ.get("CTTS_COMPOSE_BACKEND", "auto"),
          "bad", bad, "max", int(diff.max()) if n else -1,
          "first_bad", int(np.argmax(diff > 32)) if bad else -1)


if __name__ == "__main__":
    main()
