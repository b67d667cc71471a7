"""Golden acceptance suite: all 120 corpus utterances, native engine vs
the C reference binary, under the reference's own config.yaml and
normalization.csv (glibc rule flavor — what the C binary actually applies
on this platform).

Contract: byte-length equality and ≤2 LSB everywhere except samples
poisoned by the reference's heap overread (bounded count per utterance).
Runs as one test (session-scoped fixtures; ~1 min total).
"""

import os
import shutil
import subprocess

import numpy as np
import pytest

from ctts_tpu.config import load_config
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.testing.corpus import CORPUS
from ctts_tpu.text.rules import NormalizationRules
from ctts_tpu.utils.wav import read_wav

native = pytest.importorskip("ctts_tpu.runtime.native")


@pytest.mark.slow
def test_golden_120_corpus(ref_build, voice_db, tmp_path):
    if not native.native_available():
        pytest.skip("native library unavailable")

    workdir = tmp_path
    shutil.copy("/root/reference/config.yaml", workdir / "config.yaml")
    shutil.copy("/root/reference/normalization.csv",
                workdir / "normalization.csv")

    db = VoiceDatabase(voice_db)
    engine = native.NativeEngine(voice_db)
    config = load_config(workdir / "config.yaml")
    rules = NormalizationRules.load(
        str(workdir / "normalization.csv"), verbose=False, flavor="glibc"
    )

    failures = []
    oob_budget_hits = 0
    for fname, text, speed in CORPUS:
        out = workdir / ("ref_" + fname)
        # CLI semantics: explicit speed argument (clamped by the CLI).
        subprocess.run(
            [ref_build["ctts"], "synth", voice_db, text, str(out),
             str(speed)],
            capture_output=True, cwd=workdir, check=True,
        )
        ref = read_wav(str(out))

        cli_speed = float(np.float32(speed))
        cli_speed = min(max(cli_speed, 0.5), 2.0)
        plan = compile_plan(db, text, config, rules, cli_speed)
        got = engine.execute(plan)

        if ref.shape[0] != got.shape[0]:
            failures.append(f"{fname}: length {ref.shape[0]} vs {got.shape[0]}")
            continue
        diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
        bad = int((diff > 2).sum())
        if bad > 0:
            # Reference OOB reads poison a few samples per affected word;
            # allow a small budget, flag anything larger.
            if bad <= 64:
                oob_budget_hits += 1
            else:
                failures.append(
                    f"{fname}: {bad} samples >2 LSB (max {diff.max()})"
                )

    assert not failures, "\n".join(failures)
    # Sanity: the OOB budget should cover only a minority of cases.
    assert oob_budget_hits < len(CORPUS) // 2, (
        f"{oob_budget_hits} utterances needed the OOB tolerance"
    )
