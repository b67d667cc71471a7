"""Pitch-search backends must agree bit-for-bit.

The batched conv path, the per-row conv path (the round-2 baseline,
still used by the exact_compose scan), and the Pallas VPU kernel (run
in interpreter mode here — compiled on real TPU, where
tools/microbench_pitch.py asserts the same equality) all compute the
same exact integers, so the resulting pitches are identical floats.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from ctts_tpu.ops import device_ops as dops


@pytest.fixture(scope="module")
def seg_data():
    rng = np.random.default_rng(7)
    n = 48
    segs = rng.integers(-5000, 5000,
                        (n, dops._PITCH_SPAN)).astype(np.float32)
    # Mix of unvoiced noise and strongly periodic rows (argmax near-tie
    # pressure), plus degenerate counts.
    t = np.arange(dops._PITCH_SPAN)
    for r in range(0, n, 3):
        lag = 55 + (r * 7) % 200
        segs[r] = np.round(3000 * np.sin(2 * np.pi * t / lag)).astype(
            np.float32)
    counts = rng.integers(0, 450, n).astype(np.int32)
    counts[:4] = [0, 100, 200, 449]
    return jnp.asarray(segs), jnp.asarray(counts)


def test_batched_conv_matches_per_row(seg_data):
    segs, counts = seg_data
    batched = dops.estimate_pitch_batch(segs, counts, backend="conv")
    per_row = jax.vmap(dops._pitch_from_segment)(segs, counts)
    assert np.array_equal(np.asarray(batched), np.asarray(per_row))


def test_pallas_interpret_matches_conv(seg_data):
    segs, counts = seg_data
    conv = dops.estimate_pitch_batch(segs, counts, backend="conv")
    pal = dops.estimate_pitch_batch(segs, counts,
                                    backend="pallas_interpret")
    assert np.array_equal(np.asarray(conv), np.asarray(pal))
