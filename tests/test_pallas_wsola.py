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


def test_batch_kernel_parity(monkeypatch):
    """The S-interleaved batch kernel (production lowering under vmap)
    must match per-sentence wsola_frames bit-for-bit, including ragged
    per-sentence run counts (masked tail frames), an all-masked padding
    row (nrun = 0), and the B % S != 0 padding path."""
    import jax

    from ctts_tpu.ops.pallas.wsola import wsola_frames, wsola_frames_batch
    from ctts_tpu.ops.wsola_jax import AHOP, _wsola_planes

    monkeypatch.setenv("CTTS_PALLAS_INTERPRET", "1")

    speed = 1.5
    hop = synthesis_hop_for_speed(speed)
    out_size = 2 * S + 2048
    max_steps = min((S - FRAME) // AHOP + 2, (out_size - FRAME) // hop + 1)

    rng = np.random.default_rng(23)
    counts = [3000, 4096, 400, 1800, 0]          # ragged; one empty
    kinds = ["tonal", "noise", "tonal", "periodic", "tonal"]
    planes = []
    for count, kind in zip(counts, kinds):
        buf = np.zeros(S, np.float32)
        if count:
            buf[:count] = _signal(rng, count, kind)
        inp = jnp.asarray(buf)
        ks = np.arange(max_steps)
        alloc_frames = max(count - FRAME, 0) // AHOP + 1 if count > FRAME \
            else (1 if count else 0)
        alloc = alloc_frames * hop + FRAME + 1024
        run_all = jnp.asarray(
            (ks * AHOP + FRAME <= count) & (ks * hop + FRAME <= alloc)
            & (ks * hop + FRAME <= out_size))
        planes.append(_wsola_planes(inp, run_all, max_steps)
                      + (jnp.int32(count),))

    refs = [
        wsola_frames(iv, sqs, sq4, cnt, nrun, hop=hop,
                     out_size=out_size, interpret=True)
        for iv, sqs, sq4, nrun, cnt in planes
    ]
    stack = [jnp.stack([p[i] for p in planes]) for i in range(3)]
    nruns = jnp.stack([p[3] for p in planes])
    cnts = jnp.stack([p[4] for p in planes])
    from ctts_tpu.parallel.batch import _no_persistent_cache

    for Sgrp in (2, 5):  # 5 rows: S=2 exercises padding, S=5 one program
        with _no_persistent_cache():
            # Serializing the interpret-mode batch-kernel executable
            # segfaults XLA:CPU's cache writer (put_executable_and_time
            # — same CHECK as the mesh cores, parallel/batch.py:115).
            acc_b, norm_b = wsola_frames_batch(
                stack[0], stack[1], stack[2], cnts, nruns,
                hop=hop, out_size=out_size, S=Sgrp, interpret=True)
        for i, (acc_r, norm_r) in enumerate(refs):
            assert np.array_equal(np.asarray(acc_b[i]),
                                  np.asarray(acc_r)), (Sgrp, i)
            assert np.array_equal(np.asarray(norm_b[i]),
                                  np.asarray(norm_r)), (Sgrp, i)
