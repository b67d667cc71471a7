"""The Pallas compact kernel must match move_segments bit-for-bit.

Interpret mode against dops.move_segments on fuzzed segment tables with
the seg_table invariants (ascending starts, dst[s] ≤ starts[s], packed
destinations). Compiled-mode equality is asserted on real TPU by the
device parity suite; the full-pipeline pallas-vs-xla test covers the
integrated path.
"""

import numpy as np

import jax
import jax.numpy as jnp

from ctts_tpu.ops import device_ops as dops
from ctts_tpu.ops.pallas.compact import compact_units

R, WREG, MARGIN, CONTW = 4, 8192, 2048, 4096
NBLK = dops.NBLK


def make_tables(rng):
    starts = np.zeros((R, NBLK), np.int32)
    dst = np.zeros((R, NBLK), np.int32)
    seg_len = np.zeros((R, NBLK), np.int32)
    for r in range(R):
        nseg = int(rng.integers(0, 6))
        pos = MARGIN
        out = MARGIN
        for s in range(nseg):
            pos += int(rng.integers(0, 400))       # removed silence gap
            ln = int(rng.integers(1, 700))
            if pos + ln > MARGIN + CONTW:
                break
            starts[r, s] = pos
            dst[r, s] = out
            seg_len[r, s] = ln
            pos += ln
            out += ln
    return starts, dst, seg_len


def test_compact_matches_move_segments():
    rng = np.random.default_rng(11)
    for trial in range(6):
        bufs = np.trunc(
            rng.uniform(-30000, 30000, (R, WREG))).astype(np.float32)
        starts, dst, seg_len = make_tables(rng)

        ref = jax.vmap(
            lambda b, s, d, sl: dops.move_segments(b, s, d, sl,
                                                   win_w=CONTW)
        )(jnp.asarray(bufs), jnp.asarray(starts), jnp.asarray(dst),
          jnp.asarray(seg_len))

        got = compact_units(
            jnp.asarray(bufs).reshape(-1), jnp.asarray(starts),
            jnp.asarray(dst), jnp.asarray(seg_len),
            R=R, WREG=WREG, NBLK=NBLK, MW=CONTW, interpret=True,
        ).reshape(R, WREG)

        assert np.array_equal(np.asarray(ref), np.asarray(got)), trial
