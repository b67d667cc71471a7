"""Unit-selection parity: the matched unit sequence must equal the C
engine's (observed via its print_units debug trace, ctts.c:3795-3796)."""

import os
import re
import subprocess

import pytest

from ctts_tpu.config import load_config
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.text.rules import NormalizationRules

CASES = [
    "como vai",
    "como você se chama?",
    "que legal!",
    "eu quero café, pão, e manteiga",
    "bom dia. como vai. tudo bem.",
    "eu tenho 5 livros",
    "são 42 pessoas",
    "a rosa é vermelha",
    "minha casa é grande",
    "o rato roeu a roupa do rei de roma",
    "vamos para a praia",
    "preciso comprar coisas para casa",
    "quando eu era criança minha família morava em uma casa pequena perto do rio",
    "xyzw qzkj",  # mostly unknown characters
    "brasil",
]


def _ref_unit_trace(ref_build, db_path: str, text: str, workdir: str) -> list[str]:
    """Run the reference binary with print_units enabled; parse stderr."""
    cfg = os.path.join(workdir, "config.yaml")
    with open(cfg, "w") as f:
        f.write("print_units: true\n")
    # No normalization.csv in workdir → no rules (both sides agree).
    out = subprocess.run(
        [ref_build["ctts"], "synth", db_path, text, os.path.join(workdir, "o.wav")],
        capture_output=True,
        cwd=workdir,
        check=True,
    )
    return re.findall(r"\[([^\]]*)\]", out.stderr.decode("utf-8"))


@pytest.mark.parametrize("text", CASES)
def test_unit_sequence_matches_reference(ref_build, voice_db, tmp_path, text):
    ref_units = _ref_unit_trace(ref_build, voice_db, text, str(tmp_path))

    db = VoiceDatabase(voice_db)
    config = load_config(tmp_path / "config.yaml")
    assert config.print_units is True
    plan = compile_plan(db, text, config, rules=None, print_units=False)
    ours = [t.decode("utf-8") for t in plan.unit_texts]

    assert ours == ref_units
