"""Sentence splitting (plan.split): long inputs become independent batch
rows whose concatenated device output is byte-equal to the unsplit device
path (SURVEY.md §5.7; reference grow-buffer behavior ctts.c:3000-3012,
3763-3766). Runs on CPU with 8 virtual devices (conftest)."""

import numpy as np
import pytest

from ctts_tpu.config import config_defaults
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import OpKind, compile_plan
from ctts_tpu.plan.split import split_plan


@pytest.fixture(scope="module")
def voice(voice_db):
    from ctts_tpu.synth.device import DeviceVoice

    return DeviceVoice(VoiceDatabase(voice_db))


MULTI = "bom dia. como vai? tudo bem! a rosa azul."


def test_split_partitions_ops(voice_db):
    db = VoiceDatabase(voice_db)
    plan = compile_plan(db, MULTI, config_defaults(), None, 1.0)
    rows = split_plan(plan, db)
    assert len(rows) == 4
    # Partition: concatenated row ops == original ops.
    cat = [op for r in rows for op in r.ops]
    assert cat == plan.ops
    # Every row after the first starts with the sentence-end pause.
    for r in rows[1:]:
        assert r.ops[0].kind == OpKind.SILENCE
        assert r.ops[1].kind == OpKind.MARK_WORD and r.ops[1].sentence_end
    # buf_total0 increases monotonically.
    offs = [r.buf_total0 for r in rows]
    assert offs[0] == 0 and all(b > a for a, b in zip(offs, offs[1:]))


def test_split_rows_match_unsplit_device(voice_db, voice):
    """Concatenated per-row device output == unsplit device output,
    byte-equal (same bucket dims so identical compiled math)."""
    from ctts_tpu.synth.device import (
        bucket_dims, derive_dims, execute_plan_jax, walk_plan,
    )

    db = VoiceDatabase(voice_db)
    plan = compile_plan(db, MULTI, config_defaults(), None, 1.0)
    dims = bucket_dims(derive_dims(walk_plan(plan, db), db))
    full = execute_plan_jax(plan, db, voice)

    rows = split_plan(plan, db)
    parts = [
        execute_plan_jax(r, db, voice) for r in rows
    ]
    cat = np.concatenate(parts)
    assert cat.shape[0] == full.shape[0]
    assert np.array_equal(cat, full)


def test_split_no_op_cases(voice_db):
    db = VoiceDatabase(voice_db)
    cfg = config_defaults()
    # Single sentence: nothing to split.
    p1 = compile_plan(db, "como vai", cfg, None, 1.0)
    assert split_plan(p1, db) == [p1]
    # Trailing sentence end only: row would be the bare epilogue — no split.
    p2 = compile_plan(db, "como vai.", cfg, None, 1.0)
    assert len(split_plan(p2, db)) == 1
    # Stretch plans never split (WSOLA runs over the whole buffer).
    p3 = compile_plan(db, MULTI, cfg, None, 1.5)
    assert split_plan(p3, db) == [p3]


def test_batch_synthesize_split_concat(voice_db):
    """BatchSynthesizer with split=True returns per-input concatenations
    identical to split=False (the unsplit device path)."""
    from ctts_tpu.parallel.batch import BatchSynthesizer

    db = VoiceDatabase(voice_db)
    bs = BatchSynthesizer(db, config_defaults())
    texts = [MULTI, "como vai"]
    unsplit = bs.synthesize(texts, split=False)
    split = bs.synthesize(texts, split=True)
    for a, b in zip(unsplit, split):
        assert np.array_equal(a, b)
