"""Fade lookup tables as device constants (parity: ctts.c:52-101)."""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ctts_tpu.constants import FADE_LUT_SIZE
from ctts_tpu.synth.dsp_np import FADE_IN_LUT, FADE_OUT_LUT, HANNING_256, SINE_FADE_LUT


def _lut_lookup(lut: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """fast_fade_* LUT lookup with linear interpolation (ctts.c:76-101)."""
    t = t.astype(jnp.float32)
    idx_f = t * jnp.float32(FADE_LUT_SIZE - 1)
    idx = idx_f.astype(jnp.int32)
    hi = idx >= FADE_LUT_SIZE - 1
    lo = idx < 0
    idx_c = jnp.clip(idx, 0, FADE_LUT_SIZE - 2)
    frac = idx_f - idx_c.astype(jnp.float32)
    val = lut[idx_c] * (1.0 - frac) + lut[idx_c + 1] * frac
    val = jnp.where(hi, lut[FADE_LUT_SIZE - 1], val)
    val = jnp.where(lo, lut[0], val)
    return val


def fade_out_gain(t: jnp.ndarray) -> jnp.ndarray:
    return _lut_lookup(jnp.asarray(FADE_OUT_LUT), t)


def fade_in_gain(t: jnp.ndarray) -> jnp.ndarray:
    return _lut_lookup(jnp.asarray(FADE_IN_LUT), t)


def sine_fade_gain(t: jnp.ndarray) -> jnp.ndarray:
    return _lut_lookup(jnp.asarray(SINE_FADE_LUT), t)


HANN256 = jnp.asarray(HANNING_256)


def hann(n: int) -> jnp.ndarray:
    i = np.arange(n, dtype=np.float32)
    w = np.float32(0.5) * (
        np.float32(1.0)
        - np.cos(np.float32(2.0) * np.float32(np.pi) * i / np.float32(n),
                 dtype=np.float32)
    )
    return jnp.asarray(w.astype(np.float32))
