"""pt-BR number expansion: unit tests + parity against the reference."""

import subprocess

import pytest

from ctts_tpu.text.numbers import (
    expand_numbers,
    full_number_to_words_pt,
    number_to_words_pt,
)


def test_small_numbers():
    assert number_to_words_pt(0) == "zero"
    assert number_to_words_pt(1) == "um"
    assert number_to_words_pt(15) == "quinze"
    assert number_to_words_pt(21) == "vinte e um"
    assert number_to_words_pt(100) == "cem"
    assert number_to_words_pt(101) == "cento e um"
    assert number_to_words_pt(350) == "trezentos e cinquenta"
    assert number_to_words_pt(999) == "novecentos e noventa e nove"


def test_full_numbers():
    assert full_number_to_words_pt(1000) == "mil"
    # C quirk: "e" after thousands only when the remainder is < 100.
    assert full_number_to_words_pt(2500) == "dois mil quinhentos"
    assert full_number_to_words_pt(2024) == "dois mil e vinte e quatro"
    assert full_number_to_words_pt(1100) == "mil cem"  # C quirk: no "e"
    assert full_number_to_words_pt(12000000) == "doze milhões"
    assert full_number_to_words_pt(1000000) == "um milhão"
    assert full_number_to_words_pt(1000000000) == "um bilhão"
    assert full_number_to_words_pt(-5) == "menos cinco"


def test_expand_in_text():
    assert expand_numbers(b"eu tenho 5 livros") == b"eu tenho cinco livros"
    assert (
        expand_numbers("são 42 pessoas".encode())
        == "são quarenta e dois pessoas".encode()
    )


CASES = [
    "eu tenho 5 livros",
    "ela tem 15 anos",
    "são 42 pessoas",
    "custa 100 reais",
    "são 350 quilômetros",
    "tem 1000 lugares",
    "são 2500 pessoas",
    "estamos em 2024",
    "a cidade tem 12000000 habitantes",
    "eu tenho 3 filhos, 2 cachorros e 1 gato",
    "101 e 1100 e 1000001",
    "0 é zero e -- 007",
    "999999999999 formigas",
]


@pytest.mark.parametrize("text", CASES)
def test_expand_parity_with_reference(ref_build, text):
    out = subprocess.run(
        [ref_build["harness"], "expand", text], capture_output=True, check=True
    )
    assert out.stdout == expand_numbers(text.encode())
