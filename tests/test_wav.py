"""WAV I/O: chunk walking, stereo averaging with C int semantics, writer
byte layout."""

import struct

import numpy as np
import pytest

from ctts_tpu.utils.wav import WavError, read_wav, write_wav


def _wav_bytes(payload: bytes, channels: int = 1, extra_chunk: bytes = b"",
               fmt_size: int = 16, audio_format: int = 1, bits: int = 16):
    fmt = struct.pack("<HHIIHH", audio_format, channels, 22050,
                      22050 * 2 * channels, 2 * channels, bits)
    fmt += b"\x00" * (fmt_size - 16)
    body = b"fmt " + struct.pack("<I", fmt_size) + fmt
    body += extra_chunk
    body += b"data" + struct.pack("<I", len(payload)) + payload
    return b"RIFF" + struct.pack("<I", 4 + len(body)) + b"WAVE" + body


def test_roundtrip(tmp_path):
    samples = (np.sin(np.arange(1000) * 0.05) * 12000).astype(np.int16)
    p = tmp_path / "x.wav"
    write_wav(str(p), samples, 22050)
    assert p.stat().st_size == 44 + 2000
    np.testing.assert_array_equal(read_wav(str(p)), samples)


def test_stereo_averaging_truncates_toward_zero(tmp_path):
    # C: (int16_t)((left + right) / 2) — integer division truncates toward
    # zero, so (-3 + 0)/2 = -1, (3 + 0)/2 = 1 (ctts.c:801).
    frames = np.array([[-3, 0], [3, 0], [-5, -4], [7, 8]], dtype="<i2")
    p = tmp_path / "st.wav"
    p.write_bytes(_wav_bytes(frames.tobytes(), channels=2))
    out = read_wav(str(p))
    np.testing.assert_array_equal(out, np.array([-1, 1, -4, 7], np.int16))


def test_unknown_chunks_skipped(tmp_path):
    payload = np.arange(10, dtype="<i2").tobytes()
    junk = b"LIST" + struct.pack("<I", 6) + b"junk12"
    p = tmp_path / "c.wav"
    p.write_bytes(_wav_bytes(payload, extra_chunk=junk))
    np.testing.assert_array_equal(
        read_wav(str(p)), np.arange(10, dtype=np.int16)
    )


def test_oversized_fmt_chunk(tmp_path):
    payload = np.arange(4, dtype="<i2").tobytes()
    p = tmp_path / "f.wav"
    p.write_bytes(_wav_bytes(payload, fmt_size=18))
    np.testing.assert_array_equal(
        read_wav(str(p)), np.arange(4, dtype=np.int16)
    )


def test_rejects_non_pcm_and_non16bit(tmp_path):
    payload = b"\x00\x00" * 4
    p = tmp_path / "bad.wav"
    p.write_bytes(_wav_bytes(payload, audio_format=3))
    with pytest.raises(WavError):
        read_wav(str(p))
    p.write_bytes(_wav_bytes(payload, bits=8))
    with pytest.raises(WavError):
        read_wav(str(p))


def test_rejects_not_riff(tmp_path):
    p = tmp_path / "nr.wav"
    p.write_bytes(b"NOTAWAVFILE" * 10)
    with pytest.raises(WavError):
        read_wav(str(p))
