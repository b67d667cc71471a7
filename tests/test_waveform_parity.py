"""End-to-end waveform parity: oracle executor vs the compiled C binary.

Budget: the driver's north star is ≤1e-3 max-abs deviation (≈ ±32 int16
LSB); the oracle targets near-bit-exactness (≤2 LSB, allowing for libm
1-ulp differences in LUT construction that can shift a truncation).
"""

import os
import subprocess

import numpy as np
import pytest

from ctts_tpu.config import load_config
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.synth.oracle import execute_plan_oracle
from ctts_tpu.text.rules import NormalizationRules
from ctts_tpu.utils.wav import read_wav

REFERENCE_CSV = "/root/reference/normalization.csv"

# (text, speed)
CASES = [
    ("oi", 1.0),
    ("como vai", 1.0),
    ("bom dia. como vai. tudo bem.", 1.0),
    ("que legal!", 1.0),
    ("como você se chama?", 1.0),
    ("eu quero café, pão, e manteiga", 1.0),
    ("eu tenho 5 livros", 1.0),
    ("a rosa é vermelha", 1.0),
    ("o rato roeu a roupa do rei de roma", 1.0),
    ("vamos para a praia", 1.0),
    ("o brasil é um país muito bonito", 1.0),
    ("o brasil é um país muito bonito", 0.5),
    ("o brasil é um país muito bonito", 1.5),
    ("o brasil é um país muito bonito", 2.0),
    ("isso é incrível!", 0.7),
]


def _synth_ref(ref_build, db, text, speed, workdir, config_lines=()):
    cfg = os.path.join(workdir, "config.yaml")
    if config_lines:
        with open(cfg, "w") as f:
            f.write("\n".join(config_lines) + "\n")
    out = os.path.join(workdir, "ref.wav")
    subprocess.run(
        [ref_build["ctts"], "synth", db, text, out, str(speed)],
        capture_output=True, cwd=workdir, check=True,
    )
    return read_wav(out)


def _synth_ours(voice_db, text, speed, workdir, rules_path=None):
    db = VoiceDatabase(voice_db)
    config = load_config(os.path.join(workdir, "config.yaml"))
    rules = (
        NormalizationRules.load(rules_path, verbose=False, flavor="glibc")
        if rules_path
        else None
    )
    plan = compile_plan(db, text, config, rules, float(np.float32(speed)))
    return execute_plan_oracle(plan, db)


def _report(ref, ours):
    n = min(ref.shape[0], ours.shape[0])
    if ref.shape[0] != ours.shape[0]:
        return f"length mismatch: ref={ref.shape[0]} ours={ours.shape[0]}"
    diff = np.abs(ref[:n].astype(np.int32) - ours[:n].astype(np.int32))
    return f"max abs diff = {diff.max()} LSB at {np.argmax(diff)}"


@pytest.mark.parametrize("text,speed", CASES)
def test_waveform_parity_default_config(ref_build, voice_db, tmp_path,
                                        text, speed):
    ref = _synth_ref(ref_build, voice_db, text, speed, str(tmp_path))
    ours = _synth_ours(voice_db, text, speed, str(tmp_path))

    assert ref.shape[0] == ours.shape[0], _report(ref, ours)
    diff = np.abs(ref.astype(np.int32) - ours.astype(np.int32))
    # ≤4 LSB: numpy-vs-libm 1-ulp window-table differences can shift a
    # couple of LSB through the WSOLA normalization (budget is 32 LSB).
    assert diff.max() <= 4, _report(ref, ours)
    assert (diff > 2).sum() <= 16, _report(ref, ours)


def test_reference_oob_read_tolerance(ref_build, voice_db, tmp_path):
    """The reference has a heap-buffer-overflow in
    apply_smooth_pitch_contour (ctts.c:2251: `temp[pos + idx]` with
    idx*pitch_factor past the buffer when pitch_factor > 1; confirmed with
    ASan). The garbage it reads leaks into a handful of output samples and
    is inherently unreproducible; our executor substitutes 0. Parity
    contract: outside those few samples the output is bit-near-exact."""
    text = "olá mundo, tudo bem? são 42 graus!"
    ref = _synth_ref(ref_build, voice_db, text, 1.0, str(tmp_path))
    ours = _synth_ours(voice_db, text, 1.0, str(tmp_path))

    assert ref.shape[0] == ours.shape[0], _report(ref, ours)
    diff = np.abs(ref.astype(np.int32) - ours.astype(np.int32))
    # At most a few samples may be poisoned by the reference's OOB read.
    assert (diff > 2).sum() <= 16, _report(ref, ours)
    assert np.median(diff) == 0


@pytest.mark.parametrize("text,speed", [
    ("olá, como vai você", 1.0),
    ("o brasil é um país muito bonito", 1.2),
    ("você fala português?", 1.0),
])
def test_waveform_parity_shipped_config(ref_build, voice_db, tmp_path,
                                        text, speed):
    """With the reference repo's config.yaml (crossfade 90/140ms etc.) and
    its normalization.csv — the full live configuration."""
    import shutil

    shutil.copy(REFERENCE_CSV, tmp_path / "normalization.csv")
    with open("/root/reference/config.yaml") as f:
        cfg_text = f.read()
    (tmp_path / "config.yaml").write_text(cfg_text)

    ref = _synth_ref(ref_build, voice_db, text, speed, str(tmp_path))
    ours = _synth_ours(voice_db, text, speed, str(tmp_path),
                       rules_path=str(tmp_path / "normalization.csv"))

    assert ref.shape[0] == ours.shape[0], _report(ref, ours)
    diff = np.abs(ref.astype(np.int32) - ours.astype(np.int32))
    assert diff.max() <= 2, _report(ref, ours)
