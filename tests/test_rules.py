"""Normalization-rule engine: unit tests + full-pipeline parity vs the
reference harness using the shipped normalization.csv."""

import os
import subprocess

import pytest

from ctts_tpu.text.normalize import normalize_pipeline
from ctts_tpu.text.rules import NormalizationRules, convert_word_boundaries

REFERENCE_CSV = "/root/reference/normalization.csv"


def _rules_from_lines(
    lines: list[bytes], flavor: str = "full"
) -> NormalizationRules:
    import tempfile

    with tempfile.NamedTemporaryFile("wb", suffix=".csv", delete=False) as f:
        f.write(b"\n".join(lines) + b"\n")
        path = f.name
    try:
        return NormalizationRules.load(path, verbose=False, flavor=flavor)
    finally:
        os.unlink(path)


def test_word_boundary_conversion():
    # Following alnum/[( => word start, else word end (ctts.c:294-340).
    assert convert_word_boundaries(rb"\br") == b"[[:<:]]r"
    assert convert_word_boundaries(rb"t\b") == b"t[[:>:]]"
    assert convert_word_boundaries(rb"\bkm\b") == b"[[:<:]]km[[:>:]]"
    assert convert_word_boundaries(rb"\b[ab]") == b"[[:<:]][ab]"
    assert convert_word_boundaries(rb"x") == b"x"


def test_r_word_start_rule():
    rules = _rules_from_lines([rb"\br,rr"])
    assert rules.apply(b"a rosa e o rato") == b"a rrosa e o rrato"
    # Mid-word r untouched.
    assert rules.apply(b"caro") == b"caro"


def test_final_t_rule():
    rules = _rules_from_lines([rb"t\b,ti"])
    assert rules.apply(b"internet boa") == b"interneti boa"
    assert rules.apply(b"ate logo") == b"ate logo"


def test_backreference_rule():
    rules = _rules_from_lines([rb"([a-z])sa,\1za"])
    assert rules.apply(b"casa") == b"caza"
    assert rules.apply(b"sala") == b"sala"  # 'sa' at word start: no prefix


def test_sequential_rules_feed_forward():
    # Rule order matters: output of rule i feeds rule i+1.
    rules = _rules_from_lines([b"a,b", b"b,c"])
    assert rules.apply(b"a") == b"c"


def test_missing_file_is_empty():
    rules = NormalizationRules.load("/nonexistent/x.csv")
    assert rules.apply(b"abc") == b"abc"


def test_invalid_regex_skipped(capsys):
    rules = _rules_from_lines([rb"([a-z,x", b"a,b"])
    assert len(rules.rules) == 1
    assert rules.apply(b"a") == b"b"


CASES = [
    "a rosa é vermelha",
    "o rato roeu a roupa do rei de roma",
    "minha casa é grande",
    "preciso comprar coisas para casa",
    "a internet é rápida",
    "vamos para a praia",
    "nasceu em maio",
    "que boa ideia",
    "Dr. Silva é médico",
    "Sra. Maria chegou",
    "são 5 km de distância",
    "pesa 10 kg",
    "nasceu em jan. de 1990",
    "comprei frutas, legumes, etc.",
    "eu amo música",
    "o brasil é lindo",
    "em maio vou para a praia com a família",
    "Dr. Carlos mora a 3 km daqui",
    "MAIÚSCULAS E Çedilha",
    "tel. é novo, Prof. João",
]


@pytest.mark.parametrize("text", CASES)
def test_pipeline_parity_with_reference(ref_build, text):
    """numbers → normalization.csv rules → lowercase, vs the C harness.

    glibc flavor: the C binary on this host drops all \\b rules because
    glibc rejects [[:<:]]/[[:>:]] (see ctts_tpu.text.rules docstring)."""
    out = subprocess.run(
        [ref_build["harness"], "norm", REFERENCE_CSV, text],
        capture_output=True,
        check=True,
    )
    rules = NormalizationRules.load(REFERENCE_CSV, verbose=False, flavor="glibc")
    assert out.stdout == normalize_pipeline(text.encode(), rules)


def test_glibc_flavor_drops_boundary_rules():
    full = NormalizationRules.load(REFERENCE_CSV, verbose=False, flavor="full")
    glibc = NormalizationRules.load(REFERENCE_CSV, verbose=False, flavor="glibc")
    assert len(full.rules) == 49
    assert len(glibc.rules) == 7


def test_full_flavor_applies_boundary_rules():
    rules = NormalizationRules.load(REFERENCE_CSV, verbose=False, flavor="full")
    # \br → rr, intervocalic s → z, word-final t → ti, hiatus hyphens.
    out = rules.apply(b"a rosa e a internet na praia")
    assert out == b"a rroza e a interneti na pra-i-a"
