"""The Pallas WSOLA frame-chain kernel must match the XLA scan bit-for-bit.

time_stretch_device is run twice per case — once with the XLA scan
lowering, once with the Pallas kernel in interpreter mode — and the
full (result, out_len) pair must be identical: offsets are decision
arithmetic, so a single different bit in any correlation would show as
a large localized diff. Compiled-mode equality is asserted on real TPU
by tools/microbench_wsola.py and the device parity suite.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ctts_tpu.ops.wsola_jax import (
    FRAME,
    synthesis_hop_for_speed,
    time_stretch_device,
)

F32 = jnp.float32
S = 4096


def _signal(rng, n, kind):
    t = np.arange(n, dtype=np.float32)
    if kind == "tonal":
        x = (6000 * np.sin(2 * np.pi * 137.3 * t / 22050)
             + 2500 * np.sin(2 * np.pi * 291.7 * t / 22050)
             + rng.normal(0, 300, n))
    elif kind == "noise":
        x = rng.normal(0, 5000, n)
    else:  # periodic near-ties: the tie-break stressor
        x = 8000 * np.sin(2 * np.pi * 128 * t / 22050)
    return np.trunc(np.clip(x, -32768, 32767)).astype(np.float32)


CASES = [
    ("tonal", 3000, 1.5),
    ("tonal", 3000, 0.5),
    ("noise", 4096, 1.25),
    ("periodic", 2500, 0.75),
    ("tonal", 600, 2.0),     # barely more than one frame
    ("tonal", 400, 1.5),     # input < FRAME: no frame runs
]


@pytest.mark.parametrize("kind,count,speed", CASES)
def test_pallas_matches_scan(monkeypatch, kind, count, speed):
    rng = np.random.default_rng(hash((kind, count)) % 2**32)
    buf = np.zeros(S, np.float32)
    buf[:count] = _signal(rng, count, kind)
    inp = jnp.asarray(buf)
    hop = synthesis_hop_for_speed(speed)
    out_size = 2 * S + 2048

    outs = {}
    for backend in ("xla", "pallas"):
        monkeypatch.setenv("CTTS_WSOLA_BACKEND", backend)
        monkeypatch.setenv("CTTS_PALLAS_INTERPRET", "1")
        out, out_len = time_stretch_device(
            inp, jnp.int32(count), F32(speed), out_size, hop
        )
        outs[backend] = (np.asarray(out), int(out_len))

    assert outs["xla"][1] == outs["pallas"][1]
    assert np.array_equal(outs["xla"][0], outs["pallas"][0])
