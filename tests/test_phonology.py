"""Unit tests for Portuguese phonotactics, phoneme classes, crossfade
policy, prosody tables, and config parsing."""

import numpy as np
import pytest

from ctts_tpu.config import CTTSConfig, config_defaults, parse_config_line
from ctts_tpu.text.phonology import (
    PhonemeType,
    classify_first_phoneme,
    classify_last_phoneme,
    ends_with_r,
    ends_with_s,
    get_adaptive_crossfade,
    is_pt_digraph,
    is_pt_valid_cluster,
    is_vowel,
    pt_reject_single_consonant,
    pt_syllable_score,
)
from ctts_tpu.text.prosody import (
    PhraseType,
    analyze_prosody,
    get_phrase_intonation_limited,
    get_punctuation_pause_ms,
)


def test_vowels():
    for c in "aeiouAEIOU" + "áàâãéêíóôõúü":
        assert is_vowel(ord(c)), c
    for c in "bcdfghjklmnpqrstvwxyz":
        assert not is_vowel(ord(c)), c


def test_digraphs_and_clusters():
    assert is_pt_digraph(b"ch") and is_pt_digraph(b"lh") and is_pt_digraph(b"qu")
    assert not is_pt_digraph(b"ab")
    assert is_pt_valid_cluster(b"pr") and is_pt_valid_cluster(b"fl")
    assert not is_pt_valid_cluster(b"tl") and not is_pt_valid_cluster(b"rr")


def test_single_consonant_rejection():
    # Lone consonant at word start is rejected (ctts.c:3204).
    assert pt_reject_single_consonant(b"casa", 0, 1, True)
    # Vowel is fine.
    assert not pt_reject_single_consonant(b"a", 0, 1, True)
    # Mid-word consonant that would break a digraph is rejected.
    assert pt_reject_single_consonant(b"nh", 0, 1, False)
    assert not pt_reject_single_consonant(b"nt", 0, 1, False)


def test_syllable_scores():
    # CV at word start: 2*10 + 25 + 10 (open) = 55
    assert pt_syllable_score(b"ca", 2, True) == 55
    # Lone consonant at word start: 10 - 100 = -90
    assert pt_syllable_score(b"c", 1, True) == -90
    # Digraph + open syllable: "chá" = 2 chars? "ch"+vowel = 3 chars
    # chars + digraph + open syllable (no CV bonus: second char is 'h')
    s = pt_syllable_score("cha".encode(), 3, True)
    assert s == 30 + 20 + 10


def test_phoneme_classes():
    assert classify_first_phoneme(b"pa") == PhonemeType.PLOSIVE
    assert classify_first_phoneme(b"sa") == PhonemeType.FRICATIVE
    assert classify_first_phoneme(b"cha") == PhonemeType.FRICATIVE
    assert classify_first_phoneme(b"ma") == PhonemeType.NASAL
    assert classify_first_phoneme(b"la") == PhonemeType.LIQUID
    assert classify_first_phoneme("éa".encode()) == PhonemeType.VOWEL
    assert classify_last_phoneme(b"al") == PhonemeType.LIQUID
    assert classify_last_phoneme(b"anh") == PhonemeType.NASAL
    assert classify_last_phoneme("aí".encode()) == PhonemeType.VOWEL


def test_adaptive_crossfade_policy():
    cfg = config_defaults()
    base = np.float32(cfg.crossfade_ms)
    # plosive next → 20%
    assert get_adaptive_crossfade(PhonemeType.VOWEL, PhonemeType.PLOSIVE, cfg) \
        == pytest.approx(float(base * np.float32(0.2)))
    # vowel→vowel → crossfade_vowel_ms
    assert get_adaptive_crossfade(PhonemeType.VOWEL, PhonemeType.VOWEL, cfg) \
        == pytest.approx(cfg.crossfade_vowel_ms)
    # vowel→consonant → factor
    assert get_adaptive_crossfade(PhonemeType.VOWEL, PhonemeType.OTHER, cfg) \
        == pytest.approx(float(base * np.float32(cfg.vowel_to_consonant_factor)))


def test_suffix_tests():
    assert ends_with_s(b"casas") and not ends_with_s(b"casa")
    assert ends_with_r(b"amor") and not ends_with_r(b"amo")


def test_prosody_phrase_type_from_final_punct():
    assert analyze_prosody(b"tudo bem?", 0.1).phrase_type == PhraseType.INTERROGATIVE
    assert analyze_prosody(b"que legal!", 0.1).phrase_type == PhraseType.EXCLAMATORY
    assert analyze_prosody(b"sim, claro,", 0.1).phrase_type == PhraseType.CONTINUATION
    assert analyze_prosody(b"ola", 0.1).phrase_type == PhraseType.DECLARATIVE
    # Only the LAST non-space byte decides — even for multi-sentence text.
    assert analyze_prosody("você viu? que incrível!".encode(), 0.1).phrase_type \
        == PhraseType.EXCLAMATORY


def test_prosody_word_count_from_raw_text():
    assert analyze_prosody(b"eu tenho 5 livros", 0.1).word_count == 4
    assert analyze_prosody(b"  dois   espacos  ", 0.1).word_count == 2


def test_intonation_scaled_to_limit():
    inton = get_phrase_intonation_limited(PhraseType.EXCLAMATORY, 0.10)
    for v in (inton.pitch_start, inton.pitch_end, inton.pitch_peak):
        assert 0.899 <= v <= 1.101


def test_punctuation_pause_multipliers():
    wp = 120.0
    assert get_punctuation_pause_ms(ord(","), wp) == pytest.approx(216.0)
    assert get_punctuation_pause_ms(ord("."), wp) == pytest.approx(360.0)
    assert get_punctuation_pause_ms(ord("!"), wp) == pytest.approx(384.0)
    assert get_punctuation_pause_ms(ord("-"), wp) == 0.0


def test_config_flat_parser():
    cfg = CTTSConfig()
    parse_config_line(cfg, "  crossfade_ms: 90\n")
    parse_config_line(cfg, "audio:\n")           # section header ignored
    parse_config_line(cfg, "# comment: 5\n")
    parse_config_line(cfg, "remove_dc_offset: true\n")
    parse_config_line(cfg, "print_units: yes\n")  # not "true"/"1" → False
    assert cfg.crossfade_ms == 90.0
    assert cfg.remove_dc_offset is True
    assert cfg.print_units is False
