"""Voice-bundle save/load roundtrip and use as a DeviceVoice substitute."""

import numpy as np

from ctts_tpu.config import config_defaults
from ctts_tpu.db.bundle import VoiceBundle, save_voice_bundle
from ctts_tpu.db.reader import VoiceDatabase


def test_bundle_roundtrip(voice_db, tmp_path):
    db = VoiceDatabase(voice_db)
    path = str(tmp_path / "voice_bundle.npz")
    save_voice_bundle(db, path)

    b = VoiceBundle(path)
    assert b.sample_rate == 22050
    assert b.bank.shape[0] == db.unit_count
    assert b.ubuf % 128 == 0
    assert b.texts[0] == db.unit_text(0)

    # Gains match DeviceVoice's exact computation.
    from ctts_tpu.synth.device import DeviceVoice

    dv = DeviceVoice(db)
    np.testing.assert_array_equal(np.asarray(b.gains), np.asarray(dv.gains))
    np.testing.assert_array_equal(np.asarray(b.lengths), np.asarray(dv.lengths))


def test_bundle_executes(voice_db, tmp_path):
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.device import execute_plan_jax
    from ctts_tpu.synth.oracle import execute_plan_oracle

    db = VoiceDatabase(voice_db)
    path = str(tmp_path / "voice_bundle.npz")
    save_voice_bundle(db, path)
    bundle = VoiceBundle(path)

    plan = compile_plan(db, "como vai", config_defaults(), None, 1.0)
    ref = execute_plan_oracle(plan, db)
    out = execute_plan_jax(plan, db, voice=bundle)
    assert ref.shape[0] == out.shape[0]
    assert np.abs(ref.astype(np.int32) - out.astype(np.int32)).max() <= 2
