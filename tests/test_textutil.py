"""Unit tests for L0 text utilities (hash, UTF-8, lowercase)."""

import subprocess

import pytest

from ctts_tpu.utils.textutil import (
    fnv1a_hash,
    normalize_lowercase,
    unicode_tolower,
    utf8_char_len,
    utf8_next,
    utf8_strlen,
)


def test_fnv1a_known_values():
    # FNV-1a test vectors
    assert fnv1a_hash(b"") == 2166136261
    assert fnv1a_hash(b"a") == 0xE40C292C
    assert fnv1a_hash(b"foobar") == 0xBF9CF968


def test_utf8_strlen():
    assert utf8_strlen(b"") == 0
    assert utf8_strlen(b"abc") == 3
    assert utf8_strlen("ção".encode()) == 3
    assert utf8_strlen("áéíóú".encode()) == 5


def test_utf8_next_roundtrip():
    s = "olá çãõ müsica".encode()
    pos = 0
    cps = []
    while pos < len(s):
        cp, pos = utf8_next(s, pos)
        cps.append(cp)
    assert "".join(chr(c) for c in cps) == "olá çãõ müsica"


def test_utf8_char_len():
    assert utf8_char_len(b"a") == 1
    assert utf8_char_len("é".encode()) == 2
    assert utf8_char_len("€".encode()) == 3


def test_selective_lowercase():
    # Only A-Z, É, Ó, Ô, Ç are lowered (ctts.c:238-246): Á stays Á.
    assert normalize_lowercase("ABC".encode()) == b"abc"
    assert normalize_lowercase("É Ó Ô Ç".encode()) == "é ó ô ç".encode()
    assert normalize_lowercase("Água".encode()) == "Água".encode()
    assert unicode_tolower(ord("Á")) == ord("Á")


@pytest.mark.parametrize("text", ["olá", "música", "ação", "x", "têm"])
def test_hash_parity_with_reference(ref_build, text):
    out = subprocess.run(
        [ref_build["harness"], "hash", text], capture_output=True, check=True
    )
    assert int(out.stdout.strip()) == fnv1a_hash(text.encode())
