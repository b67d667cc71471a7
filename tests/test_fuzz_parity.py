"""Fuzz parity: randomized texts through native-vs-oracle (and a subset
vs the C binary). Shakes out plan-compiler edge cases: punctuation runs,
hyphens, unknown characters, number boundaries, whitespace pathologies.
"""

import random
import subprocess

import numpy as np
import pytest

from ctts_tpu.config import config_defaults
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.synth.oracle import execute_plan_oracle
from ctts_tpu.utils.wav import read_wav

native = pytest.importorskip("ctts_tpu.runtime.native")

SYLLABLES = ["ca", "sa", "mo", "vai", "ro", "pra", "lha", "nho", "que",
             "tem", "bom", "dia", "zi", "gu", "fle"]
PUNCT = [",", ".", "!", "?", ";", ":", "-", " ", "  ", "\t"]
WEIRD = ["(", ")", "[", "]", '"', "'", "`", "@", "#", "7", "42", "1000",
         "ç", "ã", "x", "w", "\r", "...", "?!", "--", " , ", ". . "]


def _random_text(rng: random.Random) -> str:
    parts = []
    for _ in range(rng.randint(1, 30)):
        roll = rng.random()
        if roll < 0.55:
            parts.append(rng.choice(SYLLABLES))
        elif roll < 0.8:
            parts.append(rng.choice(PUNCT))
        else:
            parts.append(rng.choice(WEIRD))
    return "".join(parts) or "a"


def test_fuzz_native_vs_oracle(voice_db):
    if not native.native_available():
        pytest.skip("native library unavailable")
    db = VoiceDatabase(voice_db)
    engine = native.NativeEngine(voice_db)
    config = config_defaults()
    rng = random.Random(20260816)

    for i in range(60):
        text = _random_text(rng)
        speed = rng.choice([1.0, 1.0, 1.0, 0.5, 1.3, 2.0])
        plan = compile_plan(db, text, config, None, speed)
        ref = execute_plan_oracle(plan, db)
        out = engine.execute(plan)
        assert ref.shape[0] == out.shape[0], (i, text, speed)
        if ref.shape[0]:
            diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
            # ≤4 LSB: numpy vs libm transcendentals differ by 1 ulp in the
            # window tables, which the WSOLA normalization can amplify by
            # a couple of LSB. Budget is 32 LSB (1e-3).
            assert diff.max() <= 4, (i, text, speed, diff.max())
            assert (diff > 2).sum() <= 32, (i, text, speed)


def test_fuzz_vs_c_binary(ref_build, voice_db, tmp_path):
    """A smaller random set straight against the reference binary."""
    if not native.native_available():
        pytest.skip("native library unavailable")
    db = VoiceDatabase(voice_db)
    engine = native.NativeEngine(voice_db)
    config = config_defaults()
    rng = random.Random(42)

    for i in range(15):
        text = _random_text(rng).replace('"', "").replace("`", "")
        if not text.strip():
            text = "oi"
        out_wav = tmp_path / f"f{i}.wav"
        r = subprocess.run(
            [ref_build["ctts"], "synth", voice_db, text, str(out_wav), "1.0"],
            capture_output=True, cwd=tmp_path,
        )
        if r.returncode != 0:
            continue  # C binary refused (e.g. empty synthesis) — skip
        ref = read_wav(str(out_wav))
        plan = compile_plan(db, text, config, None, 1.0)
        got = engine.execute(plan)
        assert ref.shape[0] == got.shape[0], (i, text)
        if ref.shape[0]:
            diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
            bad = int((diff > 2).sum())
            assert bad <= 64, (i, text, bad, diff.max())


def test_fuzz_device_vs_oracle(voice_db):
    """Randomized texts through the DEVICE executor (BatchSynthesizer,
    the production TPU path): punctuation runs, unknown chars, number
    boundaries — batched under the serving dims floor so the whole fuzz
    set shares one XLA compile. Budget 32 LSB (the driver's 1e-3
    full-scale bar); decision flips would blow it by orders."""
    from ctts_tpu.parallel.batch import BatchSynthesizer

    db = VoiceDatabase(voice_db)
    config = config_defaults()
    rng = random.Random(20260818)
    texts = [_random_text(rng) for _ in range(24)]

    floor = {"U": 32, "R": 16, "FD": 8, "WREG": 32768, "SMAX": 131072,
             "CONTW": 32768, "WIN": 2048, "CFMAX": 1024}
    bs = BatchSynthesizer(db, config, dims_floor=floor)
    outs = bs.synthesize(texts)

    for i, (t, got) in enumerate(zip(texts, outs)):
        plan = compile_plan(db, t, config, None, 1.0)
        ref = execute_plan_oracle(plan, db)
        assert ref.shape[0] == got.shape[0], (i, t)
        if ref.shape[0]:
            diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
            assert diff.max() <= 32, (i, t, int(diff.max()))
