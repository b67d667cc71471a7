"""Device (JAX) executor vs the NumPy oracle.

Budget: the device path re-quantizes on the reference's int16 lattice, so
agreement is ≤2 LSB except where a float near-tie flips a discrete
decision (none in these cases). Runs on CPU with 8 virtual devices
(conftest). Short texts share one compiled bucket to keep CI time down.
"""

import numpy as np
import pytest

from ctts_tpu.config import config_defaults, load_config
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.synth.oracle import execute_plan_oracle


@pytest.fixture(scope="module")
def voice(voice_db):
    from ctts_tpu.synth.device import DeviceVoice

    return DeviceVoice(VoiceDatabase(voice_db))


CASES = [
    ("como vai", 1.0),
    ("que legal!", 1.0),          # exclamatory intonation + energy ramp
    ("como se chama?", 1.0),      # interrogative contour split
    ("bom dia. tudo bem.", 1.0),  # sentence resets
    ("oi xz oi", 1.0),            # unknown-char silence path
    ("a rosa azul", 1.5),         # WSOLA stretch
    ("a rosa azul", 0.5),
    # Regression: near-tie WSOLA offsets on periodic audio flipped under
    # default (bf16) conv precision; exact with Precision.HIGHEST.
    ("a rosa azul", 1.2),
]


@pytest.mark.parametrize("text,speed", CASES)
def test_device_matches_oracle(voice_db, voice, text, speed):
    from ctts_tpu.synth.device import execute_plan_jax

    db = VoiceDatabase(voice_db)
    config = config_defaults()
    plan = compile_plan(db, text, config, None, speed)
    ref = execute_plan_oracle(plan, db)
    out = execute_plan_jax(plan, db, voice)

    assert ref.shape[0] == out.shape[0]
    diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
    assert diff.max() <= 2, f"max diff {diff.max()} at {np.argmax(diff)}"


def test_pallas_compose_matches_oracle(voice_db, voice):
    """The roll-based Pallas compose kernel (interpret mode on CPU) must
    match the oracle like the scan path does."""
    from ctts_tpu.synth.device import execute_plan_jax

    db = VoiceDatabase(voice_db)
    config = config_defaults()
    for text in ("como vai", "como se chama?"):
        plan = compile_plan(db, text, config, None, 1.0)
        ref = execute_plan_oracle(plan, db)
        out = execute_plan_jax(plan, db, voice, pallas_compose=True)
        assert ref.shape[0] == out.shape[0]
        diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
        assert diff.max() <= 2, f"{text}: max diff {diff.max()}"


def test_device_shipped_config(voice_db, voice):
    """Shipped config: 90/140 ms crossfades exercise the margin-spill path
    (units shorter than the next crossfade)."""
    from ctts_tpu.synth.device import execute_plan_jax

    db = VoiceDatabase(voice_db)
    config = load_config("/root/reference/config.yaml")
    plan = compile_plan(db, "olá, como vai você", config, None, 1.0)
    ref = execute_plan_oracle(plan, db)
    out = execute_plan_jax(plan, db, voice)

    assert ref.shape[0] == out.shape[0]
    diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
    assert diff.max() <= 2


def test_batched_sharded_synthesis(voice_db):
    """Batch of sentences vmapped and sharded over the 8-device CPU mesh;
    results must match per-sentence oracle output."""
    import jax

    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.parallel.mesh import make_mesh

    assert len(jax.devices()) == 8, "conftest must force 8 CPU devices"

    db = VoiceDatabase(voice_db)
    config = config_defaults()
    mesh = make_mesh()
    bs = BatchSynthesizer(db, config, mesh=mesh)

    texts = ["como vai", "bom dia", "que legal", "a rosa", "vamos",
             "sim claro", "oi", "nada"]
    outs = bs.synthesize(texts)

    for t, out in zip(texts, outs):
        plan = compile_plan(db, t, config, None, 1.0)
        ref = execute_plan_oracle(plan, db)
        assert ref.shape[0] == out.shape[0], t
        diff = np.abs(ref.astype(np.int32) - out.astype(np.int32))
        assert diff.max() <= 2, f"{t}: max diff {diff.max()}"
