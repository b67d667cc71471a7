"""Microbenchmark + on-chip equality: Pallas WSOLA kernel vs XLA scan.

Bench-like dims (B=64, S=131072, ~2.5 s of audio per sentence, speed
1.5) through the full time_stretch_device with each backend. Asserts
bit-equality of (out, out_len) across the batch, then times both.
"""

from __future__ import annotations

import os
import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp

F32 = jnp.float32
B, S = 64, 131072
SPEED = 1.5


def make_inputs():
    rng = np.random.default_rng(0)
    t = np.arange(S, dtype=np.float32)
    inp = np.zeros((B, S), np.float32)
    counts = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(40000, 70000))
        f0 = float(rng.uniform(90, 260))
        x = (6000 * np.sin(2 * np.pi * f0 * t[:n] / 22050)
             + 2000 * np.sin(2 * np.pi * 2.3 * f0 * t[:n] / 22050)
             + rng.normal(0, 400, n))
        inp[b, :n] = np.trunc(np.clip(x, -32768, 32767))
        counts[b] = n
    return jnp.asarray(inp), jnp.asarray(counts)


def run(backend, inp, counts, hop, out_size):
    os.environ["CTTS_WSOLA_BACKEND"] = backend
    from ctts_tpu.ops import wsola_jax

    def one(x, c):
        return wsola_jax.time_stretch_device(
            x, c, F32(SPEED), out_size, hop)

    return jax.jit(jax.vmap(one))(inp, counts)


def main():
    from ctts_tpu.ops.wsola_jax import FRAME, synthesis_hop_for_speed
    from tools.microbench_place import bench

    hop = synthesis_hop_for_speed(SPEED)
    max_frames = (S - FRAME) // 128 + 2
    out_size = -(-(max_frames * hop + FRAME + 1024) // 1024) * 1024
    inp, counts = make_inputs()

    print("equality check...", flush=True)
    ox, lx = run("xla", inp, counts, hop, out_size)
    op, lp = run("pallas", inp, counts, hop, out_size)
    ox, lx, op, lp = (np.asarray(v) for v in (ox, lx, op, lp))
    print("lens equal:", np.array_equal(lx, lp),
          "out equal:", np.array_equal(ox, op), flush=True)
    if not np.array_equal(ox, op):
        bad = np.argwhere(ox != op)
        print("first diffs:", bad[:5], ox[tuple(bad[0])], op[tuple(bad[0])])
    assert np.array_equal(lx, lp) and np.array_equal(ox, op)

    audio_s = float(np.sum(lp)) / 22050.0
    for backend in ("xla", "pallas"):
        os.environ["CTTS_WSOLA_BACKEND"] = backend
        from ctts_tpu.ops import wsola_jax

        def one(x, c):
            return wsola_jax.time_stretch_device(
                x, c, F32(SPEED), out_size, hop)

        bench(lambda i, c: jax.vmap(one)(i, c)[0], (inp, counts),
              f"wsola[{backend}] ({audio_s:.0f} audio-s/batch)")


if __name__ == "__main__":
    main()
