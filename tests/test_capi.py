"""Drop-in C library (libctts.so) tests.

Drives the reference engine's public C API (ctts_tpu/runtime/include/
ctts.h, implementing /root/reference/ctts.h:160-340) via ctypes and pins
it against the Python frontend + native executor, which are themselves
parity-tested against the reference binary. Proves a C caller of the
reference header can link against libctts.so unchanged.
"""

import ctypes
import os
import subprocess

import numpy as np
import pytest

HERE = os.path.dirname(os.path.abspath(__file__))
RUNTIME = os.path.join(os.path.dirname(HERE), "ctts_tpu", "runtime")
SO = os.path.join(RUNTIME, "libctts.so")


class CConfig(ctypes.Structure):
    _fields_ = [
        ("crossfade_ms", ctypes.c_float),
        ("crossfade_vowel_ms", ctypes.c_float),
        ("crossfade_s_ending_ms", ctypes.c_float),
        ("crossfade_r_ending_ms", ctypes.c_float),
        ("vowel_to_consonant_factor", ctypes.c_float),
        ("word_pause_ms", ctypes.c_float),
        ("unknown_silence_ms", ctypes.c_float),
        ("fade_in_ms", ctypes.c_float),
        ("fade_out_ms", ctypes.c_float),
        ("remove_word_silence", ctypes.c_int),
        ("silence_threshold", ctypes.c_float),
        ("min_silence_ms", ctypes.c_float),
        ("remove_dc_offset", ctypes.c_int),
        ("normalize_level", ctypes.c_float),
        ("compression", ctypes.c_float),
        ("default_speed", ctypes.c_float),
        ("min_speed", ctypes.c_float),
        ("max_speed", ctypes.c_float),
        ("max_pitch_change", ctypes.c_float),
        ("print_units", ctypes.c_int),
        ("print_timing", ctypes.c_int),
    ]


@pytest.fixture(scope="session")
def capi():
    if not os.path.exists(SO):
        r = subprocess.run(["make", "-C", RUNTIME, "libctts.so"],
                           capture_output=True)
        if r.returncode != 0 or not os.path.exists(SO):
            pytest.skip("libctts.so unavailable (no compiler?)")
    lib = ctypes.CDLL(SO)
    lib.ctts_build_database.restype = ctypes.c_int
    lib.ctts_build_database.argtypes = [ctypes.c_char_p] * 5
    lib.ctts_init.restype = ctypes.c_void_p
    lib.ctts_init.argtypes = [ctypes.c_char_p]
    lib.ctts_synthesize.restype = ctypes.c_int
    lib.ctts_synthesize.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p,
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
        ctypes.POINTER(ctypes.c_size_t), ctypes.c_float,
    ]
    lib.ctts_write_wav.restype = ctypes.c_int
    lib.ctts_write_wav.argtypes = [
        ctypes.c_char_p, ctypes.POINTER(ctypes.c_int16),
        ctypes.c_size_t, ctypes.c_int,
    ]
    lib.ctts_free.argtypes = [ctypes.c_void_p]
    lib.ctts_free_samples.argtypes = [ctypes.POINTER(ctypes.c_int16)]
    lib.ctts_load_config.restype = ctypes.c_int
    lib.ctts_load_config.argtypes = [ctypes.POINTER(CConfig),
                                     ctypes.c_char_p]
    lib.ctts_config_defaults.argtypes = [ctypes.POINTER(CConfig)]
    lib.ctts_get_config.restype = ctypes.POINTER(CConfig)
    lib.ctts_get_config.argtypes = [ctypes.c_void_p]
    for name in ("ctts_set_crossfade", "ctts_set_word_pause",
                 "ctts_set_unknown_silence"):
        getattr(lib, name).argtypes = [ctypes.c_void_p, ctypes.c_float]
    lib.ctts_set_fades.argtypes = [ctypes.c_void_p, ctypes.c_float,
                                   ctypes.c_float]
    lib.ctts_units_found.restype = ctypes.c_uint32
    lib.ctts_units_found.argtypes = [ctypes.c_void_p]
    lib.ctts_units_missing.restype = ctypes.c_uint32
    lib.ctts_units_missing.argtypes = [ctypes.c_void_p]
    lib.ctts_utf8_strlen.restype = ctypes.c_size_t
    lib.ctts_utf8_strlen.argtypes = [ctypes.c_char_p]
    lib.ctts_hash.restype = ctypes.c_uint32
    lib.ctts_hash.argtypes = [ctypes.c_char_p, ctypes.c_size_t]
    lib.ctts_normalize.restype = ctypes.c_void_p
    lib.ctts_normalize.argtypes = [ctypes.c_char_p]
    lib.ctts_load_normalization.restype = ctypes.c_int
    lib.ctts_load_normalization.argtypes = [ctypes.c_char_p]
    lib.ctts_apply_normalization.restype = ctypes.c_void_p
    lib.ctts_apply_normalization.argtypes = [ctypes.c_char_p]
    lib.ctts_free_normalization.argtypes = []
    return lib


def _c_synth(capi, engine, text, speed=1.0):
    out = ctypes.POINTER(ctypes.c_int16)()
    count = ctypes.c_size_t()
    rc = capi.ctts_synthesize(engine, text.encode(), ctypes.byref(out),
                              ctypes.byref(count), ctypes.c_float(speed))
    assert rc == 0, f"ctts_synthesize failed: {rc}"
    samples = np.ctypeslib.as_array(out, shape=(count.value,)).copy()
    capi.ctts_free_samples(out)
    return samples.astype(np.int16)


TEXTS = [
    "olá mundo",
    "como vai?",
    "que legal!",
    "eu tenho 5 livros e 42 canetas",
    "bom dia. tudo bem; até logo: sim",
    "guarda-chuva (teste) [aqui] \"aspas\"",
    "o brasil é um país muito bonito",
    "São 1000 razões",
    "xyzw@#",
]


@pytest.mark.parametrize("speed", [1.0, 1.5])
def test_capi_synthesize_matches_python_native(capi, voice_db, tmp_path,
                                               monkeypatch, speed):
    """End-to-end C API output == Python frontend + native executor."""
    from ctts_tpu.config import config_defaults
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.runtime.native import NativeEngine, native_available
    from ctts_tpu.db.reader import VoiceDatabase

    if not native_available():
        pytest.skip("native executor unavailable")
    monkeypatch.chdir(tmp_path)  # no normalization.csv in cwd

    capi.ctts_free_normalization()
    engine = capi.ctts_init(voice_db.encode())
    assert engine

    db = VoiceDatabase(voice_db)
    ne = NativeEngine(voice_db)
    config = config_defaults()
    try:
        for text in TEXTS:
            got = _c_synth(capi, engine, text, speed)
            plan = compile_plan(db, text, config, None, speed)
            want = ne.execute(plan)
            assert got.shape == want.shape, text
            assert np.array_equal(got, want), text
            assert capi.ctts_units_found(engine) == plan.units_found
            assert capi.ctts_units_missing(engine) == plan.units_missing
    finally:
        capi.ctts_free(engine)
        ne.close()


def test_capi_matches_reference_binary(capi, ref_build, voice_db, tmp_path,
                                       monkeypatch):
    """Drop-in proof: C API output == the reference CLI's WAV payload."""
    from ctts_tpu.utils.wav import read_wav

    monkeypatch.chdir(tmp_path)
    capi.ctts_free_normalization()
    engine = capi.ctts_init(voice_db.encode())
    try:
        for text in ["olá mundo", "como vai?", "eu tenho 5 livros"]:
            out = tmp_path / "ref.wav"
            subprocess.run(
                [ref_build["ctts"], "synth", voice_db, text, str(out),
                 "1.0"],
                check=True, capture_output=True, cwd=tmp_path,
            )
            ref = read_wav(str(out))
            got = _c_synth(capi, engine, text, 1.0)
            assert got.shape == ref.shape, text
            # ≤2 LSB tolerance: the reference's own OOB contour read
            # (ctts.c:2251) perturbs isolated samples.
            diff = np.abs(got.astype(np.int32) - ref.astype(np.int32))
            assert float((diff > 2).mean()) < 5e-4, text
    finally:
        capi.ctts_free(engine)


def test_capi_build_database_bit_identical(capi, dataset_dir, voice_db,
                                           tmp_path):
    out = tmp_path / "capi.db"
    rc = capi.ctts_build_database(
        os.path.join(dataset_dir, "letters", "wavs").encode(),
        os.path.join(dataset_dir, "letters", "letters.txt").encode(),
        os.path.join(dataset_dir, "syllables", "wavs").encode(),
        os.path.join(dataset_dir, "syllables", "sillabes.txt").encode(),
        str(out).encode(),
    )
    assert rc == 0
    with open(out, "rb") as f, open(voice_db, "rb") as g:
        assert f.read() == g.read()


def test_capi_utilities(capi):
    from ctts_tpu.utils.textutil import (
        fnv1a_hash, normalize_lowercase, utf8_strlen,
    )

    for s in [b"ola", "coração".encode(), "ÁÉÓÔÇ xyz".encode(), b""]:
        assert capi.ctts_utf8_strlen(s) == utf8_strlen(s)
        assert capi.ctts_hash(s, len(s)) == fnv1a_hash(s)
        p = capi.ctts_normalize(s)
        got = ctypes.string_at(p)
        assert got == normalize_lowercase(s)


def test_capi_config_parsing(capi, tmp_path):
    from ctts_tpu.config import load_config

    cfg_file = tmp_path / "config.yaml"
    cfg_file.write_text(
        "# comment\n"
        "audio:\n"
        "  crossfade_ms: 33.5\n"
        "word_pause_ms: 80\n"
        "remove_dc_offset: false\n"
        "remove_word_silence: 1\n"
        "default_speed: 1.25x\n"
        "nonsense line\n"
        "unknown_key: 9\n"
    )
    c = CConfig()
    assert capi.ctts_load_config(ctypes.byref(c), str(cfg_file).encode()) == 0
    py = load_config(str(cfg_file))
    assert c.crossfade_ms == pytest.approx(py.crossfade_ms)
    assert c.word_pause_ms == pytest.approx(py.word_pause_ms)
    assert bool(c.remove_dc_offset) == py.remove_dc_offset
    assert bool(c.remove_word_silence) == py.remove_word_silence
    assert c.default_speed == pytest.approx(py.default_speed)  # strtof
    # Missing file -> defaults.
    c2 = CConfig()
    assert capi.ctts_load_config(
        ctypes.byref(c2), str(tmp_path / "nope.yaml").encode()) == 0
    assert c2.crossfade_ms == pytest.approx(20.0)


def test_capi_setters_affect_synthesis(capi, voice_db, tmp_path,
                                       monkeypatch):
    from ctts_tpu.config import config_defaults
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.runtime.native import NativeEngine, native_available
    from ctts_tpu.db.reader import VoiceDatabase

    if not native_available():
        pytest.skip("native executor unavailable")
    monkeypatch.chdir(tmp_path)
    capi.ctts_free_normalization()
    engine = capi.ctts_init(voice_db.encode())
    capi.ctts_set_crossfade(engine, ctypes.c_float(35.0))
    capi.ctts_set_word_pause(engine, ctypes.c_float(60.0))
    capi.ctts_set_unknown_silence(engine, ctypes.c_float(10.0))
    capi.ctts_set_fades(engine, ctypes.c_float(5.0), ctypes.c_float(7.0))
    cc = capi.ctts_get_config(engine).contents
    assert cc.crossfade_ms == pytest.approx(35.0)

    config = config_defaults()
    config.crossfade_ms = 35.0
    config.word_pause_ms = 60.0
    config.unknown_silence_ms = 10.0
    config.fade_in_ms = 5.0
    config.fade_out_ms = 7.0
    db = VoiceDatabase(voice_db)
    ne = NativeEngine(voice_db)
    try:
        text = "bola azul @ casa"
        got = _c_synth(capi, engine, text)
        want = ne.execute(compile_plan(db, text, config, None, 1.0))
        assert np.array_equal(got, want)
    finally:
        capi.ctts_free(engine)
        ne.close()


def test_capi_normalization_rules(capi, tmp_path):
    """CSV rules through glibc regcomp: \\b rules dropped (platform
    behavior), plain rules applied with backreferences."""
    from ctts_tpu.text.rules import NormalizationRules

    csv = tmp_path / "normalization.csv"
    csv.write_text(
        "# comment\n"
        "\\bdr\\b,doutor\n"          # dropped on glibc
        "vc,você\n"
        "([0-9]+)%,\\1 por cento\n"
    )
    capi.ctts_free_normalization()
    assert capi.ctts_load_normalization(str(csv).encode()) == 0
    rules = NormalizationRules.load(str(csv), verbose=False, flavor="glibc")
    try:
        for text in [b"vc foi no dr hoje", b"juros de 25% ao ano", b"nada"]:
            p = capi.ctts_apply_normalization(text)
            got = ctypes.string_at(p)
            assert got == rules.apply(text), text
    finally:
        capi.ctts_free_normalization()


def test_capi_rules_feed_synthesis(capi, voice_db, tmp_path, monkeypatch):
    """normalization.csv in the CWD is loaded lazily by ctts_synthesize
    (reference behavior, ctts.c:3647)."""
    from ctts_tpu.config import config_defaults
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.runtime.native import NativeEngine, native_available
    from ctts_tpu.text.rules import NormalizationRules
    from ctts_tpu.db.reader import VoiceDatabase

    if not native_available():
        pytest.skip("native executor unavailable")
    monkeypatch.chdir(tmp_path)
    (tmp_path / "normalization.csv").write_text("vc,você\n")
    capi.ctts_free_normalization()

    engine = capi.ctts_init(voice_db.encode())
    db = VoiceDatabase(voice_db)
    ne = NativeEngine(voice_db)
    rules = NormalizationRules.load(
        str(tmp_path / "normalization.csv"), verbose=False)
    try:
        got = _c_synth(capi, engine, "vc vai bem")
        want = ne.execute(
            compile_plan(db, "vc vai bem", config_defaults(), rules, 1.0))
        assert np.array_equal(got, want)
    finally:
        capi.ctts_free(engine)
        ne.close()
        capi.ctts_free_normalization()


def test_capi_write_wav(capi, tmp_path):
    from ctts_tpu.utils.wav import write_wav

    samples = (np.sin(np.arange(2000) * 0.05) * 12000).astype(np.int16)
    ours = tmp_path / "c.wav"
    theirs = tmp_path / "py.wav"
    arr = samples.ctypes.data_as(ctypes.POINTER(ctypes.c_int16))
    assert capi.ctts_write_wav(str(ours).encode(), arr, len(samples),
                               22050) == 0
    write_wav(str(theirs), samples, 22050)
    assert ours.read_bytes() == theirs.read_bytes()


def test_capi_error_paths(capi, tmp_path):
    assert capi.ctts_init(str(tmp_path / "missing.db").encode()) is None
    out = ctypes.POINTER(ctypes.c_int16)()
    count = ctypes.c_size_t()
    assert capi.ctts_synthesize(None, b"oi", ctypes.byref(out),
                                ctypes.byref(count),
                                ctypes.c_float(1.0)) == -1
    # Unwritable path -> CTTS_ERR_FILE_WRITE (-4).
    assert capi.ctts_write_wav(b"/nonexistent-dir/x.wav", None, 0,
                               22050) == -4


def test_reference_main_compiles_against_our_header(
        ref_build, voice_db, tmp_path):
    """Source compatibility: the reference's own main() (ctts.c:3930-4035,
    extracted verbatim at test time) compiles against ctts_tpu's public
    header, links against libctts.so, and synthesizes the same waveform
    as the reference binary.
    """
    ref_src = os.path.join("/root/reference", "ctts.c")
    with open(ref_src, "r", encoding="utf-8", errors="replace") as f:
        lines = f.read().splitlines(keepends=True)
    start = next(i for i, ln in enumerate(lines)
                 if ln.startswith("static void print_usage"))
    main_src = "".join(lines[start:])

    include_dir = os.path.join(RUNTIME, "include")
    driver = tmp_path / "ref_main.c"
    driver.write_text(
        "#include <stdio.h>\n#include <stdlib.h>\n"
        "#include <string.h>\n#include \"ctts.h\"\n" + main_src)
    exe = tmp_path / "ref_main"
    subprocess.run(
        ["gcc", "-O1", "-std=c99", "-o", str(exe), str(driver),
         "-I", include_dir, "-L", RUNTIME, "-lctts",
         f"-Wl,-rpath,{RUNTIME}", "-lm"],
        check=True, capture_output=True)

    text = "batata frita com sabor"
    ours = tmp_path / "ours.wav"
    theirs = tmp_path / "theirs.wav"
    workdir = tmp_path / "cwd"
    workdir.mkdir()
    r = subprocess.run([str(exe), "synth", voice_db, text, str(ours)],
                       cwd=str(workdir), capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    # main() reads the transparent fields directly; check them in stdout.
    assert "Loaded database with" in r.stdout
    assert "Units found:" in r.stdout
    subprocess.run([ref_build["ctts"], "synth", voice_db, text,
                    str(theirs)], cwd=str(workdir), check=True,
                   capture_output=True)

    from ctts_tpu.utils.wav import read_wav
    a = read_wav(str(ours))
    b = read_wav(str(theirs))
    assert a.shape == b.shape
    assert int(np.abs(a.astype(np.int32) - b.astype(np.int32)).max()) <= 2
