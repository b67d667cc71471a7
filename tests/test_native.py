"""Native C++ runtime: plan execution parity vs the NumPy oracle and the
reference binary."""

import numpy as np
import pytest

from ctts_tpu.config import config_defaults, load_config
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.synth.oracle import execute_plan_oracle

native = pytest.importorskip("ctts_tpu.runtime.native")


@pytest.fixture(scope="module")
def engine(voice_db):
    if not native.native_available():
        pytest.skip("native library unavailable")
    return native.NativeEngine(voice_db)


def test_db_access(voice_db, engine):
    db = VoiceDatabase(voice_db)
    assert engine.unit_count == db.unit_count
    for i in (0, db.unit_count // 2, db.unit_count - 1):
        text = db.unit_text(i)
        assert engine.find_unit(text) == db.find_unit(text)
    assert engine.find_unit(b"zzznot") == -1


CASES = [
    ("como vai", 1.0),
    ("que legal!", 1.0),
    ("como você se chama?", 1.0),
    ("bom dia. como vai. tudo bem.", 1.0),
    ("eu quero café, pão, e manteiga", 1.0),
    ("o brasil é um país muito bonito", 1.5),
    ("o brasil é um país muito bonito", 0.5),
    ("oi xz oi", 1.0),
]


@pytest.mark.parametrize("text,speed", CASES)
def test_native_matches_oracle(voice_db, engine, text, speed):
    db = VoiceDatabase(voice_db)
    config = config_defaults()
    plan = compile_plan(db, text, config, None, speed)
    ref = execute_plan_oracle(plan, db)
    out = engine.execute(plan)
    assert ref.shape[0] == out.shape[0]
    diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
    assert diff.max() <= 2, f"max {diff.max()} at {np.argmax(diff)}"


def test_native_shipped_config(voice_db, engine):
    db = VoiceDatabase(voice_db)
    config = load_config("/root/reference/config.yaml")
    plan = compile_plan(db, "olá, como vai você", config, None, 1.0)
    ref = execute_plan_oracle(plan, db)
    out = engine.execute(plan)
    assert ref.shape[0] == out.shape[0]
    diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
    assert diff.max() <= 2
