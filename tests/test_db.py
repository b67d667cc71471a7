"""Database build/read: bit-compatibility with the reference builder and
lookup correctness."""

import filecmp

import numpy as np

from ctts_tpu.db.reader import VoiceDatabase


def test_db_bit_identical_to_reference(voice_db, ref_voice_db):
    """Our builder and the C builder must produce byte-identical files from
    the same dataset (format: ctts.h:84-111)."""
    assert filecmp.cmp(voice_db, ref_voice_db, shallow=False), (
        "voice.db layout diverges from the C reference"
    )


def test_reader_header(voice_db):
    db = VoiceDatabase(voice_db)
    assert db.header.sample_rate == 22050
    assert db.header.bits_per_sample == 16
    assert db.unit_count > 100
    assert db.max_unit_chars >= 3
    # Hash table is a power of two with load factor ≤ 0.7.
    size = db.header.hash_table_size
    assert size & (size - 1) == 0
    assert db.unit_count / size <= 0.7


def test_lookup_roundtrip(voice_db):
    db = VoiceDatabase(voice_db)
    for i in range(db.unit_count):
        text = db.unit_text(i)
        assert db.find_unit(text) == i or db.unit_text(db.find_unit(text)) == text
        assert db.find_unit_via_table(text) == db.find_unit(text)
    assert db.find_unit(b"zzzz-not-a-unit") == -1
    assert db.find_unit_via_table(b"zzzz-not-a-unit") == -1


def test_sorted_by_char_count_desc(voice_db):
    db = VoiceDatabase(voice_db)
    counts = db.index["char_count"]
    assert (np.diff(counts.astype(np.int32)) <= 0).all()


def test_unit_audio_view(voice_db):
    db = VoiceDatabase(voice_db)
    total = sum(int(db.index[i]["sample_count"]) for i in range(db.unit_count))
    assert total == db.header.total_samples
    s = db.unit_samples(0)
    assert s.dtype == np.int16
    assert s.shape[0] == int(db.index[0]["sample_count"])


def test_device_arrays(voice_db):
    db = VoiceDatabase(voice_db)
    units, lengths = db.to_device_arrays()
    assert units.shape[0] == db.unit_count
    assert units.shape[1] % 128 == 0
    i = int(np.argmax(lengths))
    np.testing.assert_array_equal(
        units[i, : lengths[i]], db.unit_samples(i)
    )
    assert (units[i, lengths[i] :] == 0).all()
