"""Native (C++) batch lowering vs the Python pipeline (plan/native_lower.py
vs compile_plan → split_plan → walk_plan → derive_dims → fill_device_plan).

The contract is BIT equality: same row spans, same bucket keys, and
every stacked device-plan array identical — so the serving loop can take
the native path with zero numerical consequence. Runs fully on host (no
jit): _lower_batch stops before _enqueue.
"""

import numpy as np
import pytest

from ctts_tpu.config import config_defaults
from ctts_tpu.db.reader import VoiceDatabase

pytest.importorskip("ctypes")


@pytest.fixture(scope="module")
def synths(voice_db):
    from ctts_tpu.plan import native_lower
    from ctts_tpu.parallel.batch import BatchSynthesizer

    if not native_lower.available():
        pytest.skip("libctts.so unavailable")
    db = VoiceDatabase(voice_db)
    config = config_defaults()
    nat = BatchSynthesizer(db, config, native_plans=True, wire=False)
    py = BatchSynthesizer(db, config, native_plans=False, wire=False)
    assert nat._get_native_lowerer() is not None
    assert py._get_native_lowerer() is None
    return nat, py


TEXTS = [
    "como vai?",
    "que legal!",
    "eu quero café, pão, e manteiga",
    "bom dia. como vai. tudo bem.",          # sentence split
    "eu tenho 5 livros",                      # number expansion
    "são 42 pessoas",
    "o rato roeu a roupa do rei de roma",
    "hoje de manhã eu acordei cedo e fui trabalhar",
    "oi xz oi",                               # unknown-char silence
    "guarda-chuva",                           # soft separator
    "(entre parênteses) \"aspas\"",           # skip chars
    "José está; vendo: coisas",
    "a",
    " ",
    "",
    "no dia 15 de março de 2024, a empresa anunciou lucros de "
    "3500000 reais. o diretor disse: isso é incrível! a meta era "
    "2000000, mas superamos. será que vamos crescer 30 por cento?",
]


def _compare_prepared(nat_prep, py_prep):
    n_nat, buckets_nat = nat_prep
    n_py, buckets_py = py_prep
    assert n_nat == n_py
    assert len(buckets_nat) == len(buckets_py)
    for (bd_n, items_n, prep_n, _), (bd_p, items_p, prep_p, _) in zip(
            buckets_nat, buckets_py):
        assert bd_n == bd_p
        assert [i for i, _ in items_n] == [i for i, _ in items_p]
        nn, stacked_n, shared_n = prep_n
        np_, stacked_p, shared_p = prep_p
        assert nn == np_
        assert set(stacked_n) == set(stacked_p)
        for k in stacked_p:
            a, b = stacked_n[k], stacked_p[k]
            assert a.dtype == b.dtype and a.shape == b.shape, k
            assert np.array_equal(a, b), (
                k, np.argwhere(a != b)[:5], a[a != b][:5], b[a != b][:5])
        for k in shared_p:
            assert np.array_equal(np.asarray(shared_n[k]),
                                  np.asarray(shared_p[k])), k


@pytest.mark.parametrize("speed", [1.0, 1.5, 0.5])
@pytest.mark.parametrize("split", [True, False])
def test_lowering_bit_equal_corpus(synths, speed, split):
    nat, py = synths
    nat_prep, nat_spans = nat._lower_batch(TEXTS, speed, split)
    py_prep, py_spans = py._lower_batch(TEXTS, speed, split)
    assert nat_spans == list(py_spans)
    _compare_prepared(nat_prep, py_prep)


def test_lowering_bit_equal_fuzz(synths):
    """Random byte soup over the PT alphabet + digits + punctuation:
    selection/normalization tie-breaks must agree everywhere."""
    nat, py = synths
    rng = np.random.default_rng(11)
    alpha = list("abcdefghijklmnopqrstuvwxyz áéíóúâêôãõç 0123456789"
                 ".,;:!?-()[]\"'` ")
    for trial in range(20):
        n = int(rng.integers(1, 120))
        text = "".join(rng.choice(alpha) for _ in range(n))
        nat_prep, ns = nat._lower_batch([text], 1.0, True)
        py_prep, ps = py._lower_batch([text], 1.0, True)
        assert ns == list(ps), text
        _compare_prepared(nat_prep, py_prep)


def test_synthesize_native_equals_python(synths):
    """End-to-end: the native-lowered serving output is sample-identical
    to the Python-lowered one (same compiled core, same arrays)."""
    nat, py = synths
    texts = ["como vai?", "bom dia. tudo bem.", "são 42 pessoas"]
    a = nat.synthesize(texts)
    b = py.synthesize(texts)
    for t, x, y in zip(texts, a, b):
        assert x.shape == y.shape, t
        assert np.array_equal(x, y), t


@pytest.mark.parametrize("flavor", ["glibc", "full"])
def test_lowering_bit_equal_with_rules(voice_db, flavor):
    """Rule files through the native lowering (ctl_set_rules): the
    reference applies normalization.csv on EVERY synthesis
    (ctts.c:3647-3648), so the fast host path must stay available with
    rules loaded and be byte-equal to the Python pipeline in both
    regex flavors (glibc keeps 7 boundary-free rules; full compiles
    the \\b rules via the GNU \\< \\> word boundaries)."""
    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.text.rules import NormalizationRules

    rules = NormalizationRules.load(
        "/root/reference/normalization.csv", verbose=False, flavor=flavor)
    assert rules.rules, "reference rule file must load"
    db = VoiceDatabase(voice_db)
    config = config_defaults()
    nat = BatchSynthesizer(db, config, rules=rules, native_plans=True,
                           wire=False)
    py = BatchSynthesizer(db, config, rules=rules, native_plans=False,
                          wire=False)
    assert nat._get_native_lowerer() is not None
    # Texts chosen to trip the rules: word-initial r doubling, word-final
    # t, intervocalic s voicing, literal-word rewrites, hiato splits.
    texts = TEXTS + ["o brasil é bonito", "música boa demais",
                     "casa suja rosa", "roupa do rei", "isso é a praia",
                     "o robot", "meia teia"]
    for speed in (1.0, 1.5):
        nat_prep, ns = nat._lower_batch(texts, speed, True)
        py_prep, ps = py._lower_batch(texts, speed, True)
        assert ns == list(ps)
        _compare_prepared(nat_prep, py_prep)


def test_rejected_rule_falls_back_to_python(voice_db):
    """A rule regcomp can't take must disable the native path for the
    whole synthesizer (fallback to Python), never partially apply."""
    import re

    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.text.rules import NormalizationRules, NormRule

    # Python-only construct (non-greedy) that POSIX ERE rejects... most
    # regcomps accept *?; use a backreference in the PATTERN, which
    # POSIX ERE does not support. glibc accepts \1 in patterns as a GNU
    # extension, so also cover the no-posix-form case (posix=None).
    bad = NormalizationRules([NormRule(re.compile(rb"a"), b"b", None)])
    db = VoiceDatabase(voice_db)
    config = config_defaults()
    bs = BatchSynthesizer(db, config, rules=bad, native_plans=True,
                          wire=False)
    assert bs._get_native_lowerer() is None  # constructor raised -> False
    out = bs.synthesize(["a casa"])  # Python path still serves
    assert out[0].size > 0


def test_synthesize_with_rules_native_equals_python(voice_db):
    """End-to-end with the reference rule file loaded: the native-
    lowered serving output must be sample-identical to the Python-
    lowered one, and rules must audibly apply (different output than
    rules=None for a rule-triggering text)."""
    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.text.rules import NormalizationRules

    rules = NormalizationRules.load(
        "/root/reference/normalization.csv", verbose=False, flavor="full")
    db = VoiceDatabase(voice_db)
    config = config_defaults()
    nat = BatchSynthesizer(db, config, rules=rules, native_plans=True,
                           wire=False)
    py = BatchSynthesizer(db, config, rules=rules, native_plans=False,
                          wire=False)
    plain = BatchSynthesizer(db, config, native_plans=False, wire=False)
    texts = ["o brasil é bonito", "música boa", "como vai você"]
    a = nat.synthesize(texts)
    b = py.synthesize(texts)
    c = plain.synthesize(texts)
    for t, x, y in zip(texts, a, b):
        assert x.shape == y.shape, t
        assert np.array_equal(x, y), t
    # "brasil"->"brazil" and "música"->"muzica" change unit selection.
    assert (a[0].shape != c[0].shape or not np.array_equal(a[0], c[0]))
    assert (a[1].shape != c[1].shape or not np.array_equal(a[1], c[1]))
