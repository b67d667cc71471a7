"""ctypes bindings for the C++ native runtime (libctts_native.so).

The native engine executes SynthesisPlans with exact reference semantics
at C speed — the low-latency single-stream host path (the TPU path is for
batch throughput). Built on demand with `make` in ctts_tpu/runtime/.
"""

from __future__ import annotations

import ctypes
import os
import subprocess

import numpy as np

from ctts_tpu.plan.compiler import OpKind, SynthesisPlan

_HERE = os.path.dirname(os.path.abspath(__file__))
_SO = os.path.join(_HERE, "libctts_native.so")

_lib = None


class _CtnPlan(ctypes.Structure):
    _fields_ = [
        ("n_ops", ctypes.c_int32),
        ("kind", ctypes.POINTER(ctypes.c_int32)),
        ("arg0", ctypes.POINTER(ctypes.c_int32)),
        ("arg1", ctypes.POINTER(ctypes.c_int32)),
        ("flags", ctypes.POINTER(ctypes.c_int32)),
        ("speed", ctypes.c_float),
        ("target_rms", ctypes.c_float),
        ("silence_threshold", ctypes.c_float),
        ("max_pitch_change", ctypes.c_float),
        ("min_silence_samples", ctypes.c_int32),
        ("fade_in_samples", ctypes.c_int32),
        ("remove_dc_offset", ctypes.c_int32),
        ("remove_word_silence", ctypes.c_int32),
        ("word_count", ctypes.c_int32),
        ("phrase_type", ctypes.c_int32),
        ("pitch_start", ctypes.c_float),
        ("pitch_end", ctypes.c_float),
        ("pitch_peak", ctypes.c_float),
        ("peak_position", ctypes.c_float),
        ("energy_factor", ctypes.c_float),
    ]


def _build() -> bool:
    try:
        subprocess.run(["make", "-C", _HERE], check=True, capture_output=True)
        return os.path.exists(_SO)
    except Exception:
        return False


def _load():
    global _lib
    if _lib is not None:
        return _lib
    if not os.path.exists(_SO) and not _build():
        return None
    lib = ctypes.CDLL(_SO)
    lib.ctn_db_open.restype = ctypes.c_void_p
    lib.ctn_db_open.argtypes = [ctypes.c_char_p]
    lib.ctn_db_close.argtypes = [ctypes.c_void_p]
    lib.ctn_db_unit_count.restype = ctypes.c_uint32
    lib.ctn_db_unit_count.argtypes = [ctypes.c_void_p]
    lib.ctn_db_max_unit_chars.restype = ctypes.c_uint32
    lib.ctn_db_max_unit_chars.argtypes = [ctypes.c_void_p]
    lib.ctn_db_find_unit.restype = ctypes.c_int32
    lib.ctn_db_find_unit.argtypes = [
        ctypes.c_void_p, ctypes.c_char_p, ctypes.c_size_t
    ]
    lib.ctn_execute_plan.restype = ctypes.c_int64
    lib.ctn_execute_plan.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(_CtnPlan),
        ctypes.POINTER(ctypes.POINTER(ctypes.c_int16)),
    ]
    lib.ctn_free.argtypes = [ctypes.POINTER(ctypes.c_int16)]
    _lib = lib
    return lib


def native_available() -> bool:
    return _load() is not None


def pack_plan(plan: SynthesisPlan) -> tuple:
    """Pack a SynthesisPlan into the flat arrays the C ABI consumes."""
    n = len(plan.ops)
    kind = np.zeros(n, np.int32)
    arg0 = np.zeros(n, np.int32)
    arg1 = np.zeros(n, np.int32)
    flags = np.zeros(n, np.int32)
    for i, op in enumerate(plan.ops):
        kind[i] = int(op.kind)
        if op.kind == OpKind.UNIT:
            arg0[i] = op.unit_idx
            arg1[i] = op.crossfade_samples
            flags[i] = (1 if op.after_word_boundary else 0) | (
                2 if op.smooth_boundary else 0
            )
        elif op.kind == OpKind.SILENCE:
            arg0[i] = op.n_samples
        elif op.kind == OpKind.WORD_DSP:
            arg0[i] = op.word_index
        elif op.kind == OpKind.FADE_TAIL:
            arg0[i] = op.fade_samples
    return kind, arg0, arg1, flags


class NativeEngine:
    """Native database handle + plan executor."""

    def __init__(self, database_file: str):
        lib = _load()
        if lib is None:
            raise RuntimeError("libctts_native.so unavailable (no compiler?)")
        self._lib = lib
        self._db = lib.ctn_db_open(database_file.encode())
        if not self._db:
            raise RuntimeError(f"failed to open database {database_file}")

    @property
    def unit_count(self) -> int:
        return self._lib.ctn_db_unit_count(self._db)

    def find_unit(self, text: bytes) -> int:
        return self._lib.ctn_db_find_unit(self._db, text, len(text))

    def execute(self, plan: SynthesisPlan) -> np.ndarray:
        kind, arg0, arg1, flags = pack_plan(plan)
        cfg = plan.config
        inton = plan.prosody.intonation
        cplan = _CtnPlan(
            n_ops=len(plan.ops),
            kind=kind.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            arg0=arg0.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            arg1=arg1.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            flags=flags.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
            speed=np.float32(plan.speed),
            target_rms=np.float32(plan.target_rms),
            silence_threshold=np.float32(cfg.silence_threshold),
            max_pitch_change=np.float32(cfg.max_pitch_change),
            min_silence_samples=plan.min_silence_samples,
            fade_in_samples=plan.fade_in_samples,
            remove_dc_offset=1 if cfg.remove_dc_offset else 0,
            remove_word_silence=1 if cfg.remove_word_silence else 0,
            word_count=plan.prosody.word_count,
            phrase_type=int(inton.type),
            pitch_start=np.float32(inton.pitch_start),
            pitch_end=np.float32(inton.pitch_end),
            pitch_peak=np.float32(inton.pitch_peak),
            peak_position=np.float32(inton.peak_position),
            energy_factor=np.float32(inton.energy_factor),
        )
        out = ctypes.POINTER(ctypes.c_int16)()
        count = self._lib.ctn_execute_plan(self._db, ctypes.byref(cplan),
                                           ctypes.byref(out))
        if count < 0:
            raise RuntimeError("native synthesis failed")
        result = np.ctypeslib.as_array(out, shape=(count,)).copy()
        self._lib.ctn_free(out)
        return result.astype(np.int16)

    def close(self) -> None:
        if self._db:
            self._lib.ctn_db_close(self._db)
            self._db = None

    def __del__(self):
        try:
            self.close()
        except Exception:
            pass
