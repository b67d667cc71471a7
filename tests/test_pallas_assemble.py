"""The Pallas assemble kernel must match the XLA region overlap-add.

Interpret mode against the unrolled dynamic-slice/update loop it
replaces (synth/device.py assemble stage) on fuzzed region tables —
including inactive regions, zero-length regions, and margin overlap
into the previous pause. Compiled-mode equality is asserted on real
TPU by the device parity suite.
"""

import numpy as np

import jax.numpy as jnp
from jax import lax

from ctts_tpu.ops.pallas.assemble import assemble_regions

F32 = jnp.float32
R, WREG, MARGIN, SMAX = 4, 8192, 2048, 16384


def xla_assemble(bufs, offsets, new_lens, active):
    sent = jnp.zeros(MARGIN + SMAX + WREG, F32)
    iw = jnp.arange(WREG)
    for r in range(R):
        row = jnp.where(iw < MARGIN + new_lens[r], bufs[r], F32(0.0))
        row = jnp.where(active[r], row, F32(0.0))
        seg = lax.dynamic_slice(sent, (offsets[r],), (WREG,))
        sent = lax.dynamic_update_slice(sent, seg + row, (offsets[r],))
    return sent[MARGIN: MARGIN + SMAX]


def test_assemble_matches_xla_loop():
    rng = np.random.default_rng(13)
    for trial in range(6):
        bufs = np.trunc(
            rng.uniform(-30000, 30000, (R, WREG))).astype(np.float32)
        active = rng.integers(0, 2, R).astype(bool)
        if trial == 0:
            active[:] = True
        # Bounded so offsets stay ≤ SMAX - WREG (the production plan
        # invariant: total assembled length fits SMAX).
        new_lens = rng.integers(0, 2000, R).astype(np.int32)
        new_lens[~active] = 0
        pauses = rng.integers(0, 1000, R).astype(np.int32)
        pauses[~active] = 0
        seg = new_lens + pauses
        offsets = np.concatenate(
            [np.zeros(1, np.int32), np.cumsum(seg)[:-1].astype(np.int32)])

        ref = xla_assemble(jnp.asarray(bufs), jnp.asarray(offsets),
                           jnp.asarray(new_lens), jnp.asarray(active))

        live = jnp.where(jnp.asarray(active),
                         MARGIN + jnp.asarray(new_lens), 0)
        got = assemble_regions(
            jnp.asarray(bufs).reshape(-1), jnp.asarray(offsets), live,
            R=R, WREG=WREG, SMAX=SMAX, MARGIN=MARGIN, interpret=True,
        )[MARGIN:]

        assert np.array_equal(np.asarray(ref), np.asarray(got)), trial
