"""The Pallas compose kernel must match the XLA compose scan bit-for-bit.

Runs the kernel in interpreter mode (compiled-mode equality is asserted
on real TPU by the device parity suite and tools/microbench_compose.py)
against a direct NumPy transcription of the XLA step body
(synth/device.py compose_scan): same op order, same masks. The kernel
additionally emits the boundary-DSP exports already carved — the
pre-merge pitch segment [off+cf-ana, +512) and the crossfade energy
tail [off+cf-CFMAX, off+cf) — which the XLA path slices out of its raw
[U, 2*CFMAX+512] window export outside the scan.
"""

import numpy as np
import pytest

import jax.numpy as jnp

from ctts_tpu.ops.pallas.compose import SEGW, compose_units

U, UBUF, CFMAX, TOT = 12, 2048, 1024, 16384
MARGIN = 2 * CFMAX


def ref_compose(base_off, cf_in, n_eff, ana, contrib, fo):
    flat = np.zeros(TOT, np.float32)
    segs = np.zeros((U, SEGW), np.float32)
    tails = np.zeros((U, CFMAX), np.float32)
    iu = np.arange(UBUF)
    for k in range(U):
        off, cf, n = int(base_off[k]), int(cf_in[k]), int(n_eff[k])
        if n == 0:
            off = MARGIN          # inactive slots are parked at PRE
        a = int(ana[k])
        segs[k] = flat[off + cf - a: off + cf - a + SEGW]
        tails[k] = flat[off + cf - CFMAX: off + cf]
        cur = flat[off: off + UBUF].copy()
        x = contrib[k].copy()
        mixed = np.trunc(np.clip(
            np.trunc(cur[:CFMAX] * fo[k] + x[:CFMAX]),
            -32768.0, 32767.0)).astype(np.float32)
        x[:CFMAX] = np.where(iu[:CFMAX] < cf, mixed, x[:CFMAX])
        flat[off: off + UBUF] = np.where(iu < n, x, cur)
    return flat, segs, tails


@pytest.fixture(scope="module")
def data():
    rng = np.random.default_rng(3)
    # Ascending offsets with overlap (crossfades), incl. an inactive
    # slot and offsets exercising every rem alignment class.
    base_off = np.zeros(U, np.int32)
    cur = MARGIN
    for k in range(U):
        base_off[k] = cur + int(rng.integers(0, 96))  # odd remainders
        cur += int(rng.integers(700, 1100))
    cf_in = rng.integers(0, CFMAX + 1, U).astype(np.int32)
    cf_in[0] = 0
    n_eff = rng.integers(CFMAX + 1, UBUF + 1, U).astype(np.int32)
    n_eff[5] = 0                                      # inactive slot
    base_off[5] = 0                                   # unplaced, like the plan
    ana = rng.integers(0, 2 * CFMAX + 1, U).astype(np.int32)
    contrib = np.trunc(rng.uniform(-8000, 8000, (U, UBUF))
                       ).astype(np.float32)
    fo = rng.uniform(0.0, 1.0, (U, CFMAX)).astype(np.float32)
    return base_off, cf_in, n_eff, ana, contrib, fo


def test_kernel_matches_reference(data):
    base_off, cf_in, n_eff, ana, contrib, fo = data
    flat_ref, segs_ref, tails_ref = ref_compose(*data)
    buf, seg, tail = compose_units(
        jnp.asarray(base_off), jnp.asarray(cf_in), jnp.asarray(n_eff),
        jnp.asarray(ana), jnp.asarray(contrib), jnp.asarray(fo),
        U=U, UBUF=UBUF, CFMAX=CFMAX, TOT=TOT, export=True,
        interpret=True)
    assert np.array_equal(np.asarray(buf), flat_ref)
    assert np.array_equal(np.asarray(seg), segs_ref)
    assert np.array_equal(np.asarray(tail), tails_ref)


def test_full_pipeline_pallas_vs_xla(voice_db, monkeypatch):
    """The whole synthesis core with the Pallas compose backend
    (interpret mode on CPU) must produce bit-identical audio to the XLA
    scan backend — proving the backend swap is transparent at the
    product level, not just at the isolated-kernel level."""
    import jax
    import jax.numpy as jnp

    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth import device as dev

    db = VoiceDatabase(voice_db)
    config = config_defaults()
    voice = dev.DeviceVoice(db)

    outs = {}
    for backend in ("xla", "pallas"):
        monkeypatch.setenv("CTTS_COMPOSE_BACKEND", backend)
        monkeypatch.setenv("CTTS_PALLAS_INTERPRET", "1")
        for text in ("como se chama?", "bom dia. tudo bem."):
            plan = compile_plan(db, text, config, None, 1.0)
            w = dev.walk_plan(plan, db)
            dims = dev.bucket_dims(dev.derive_dims(w, db))
            assert dims.CFMAX % 1024 == 0 and dims.MARGIN >= 2 * dims.CFMAX
            dplan = dev.build_device_plan(plan, db, dims)
            core = jax.jit(dev.build_core.__wrapped__(dims, voice.ubuf))
            arrays = {k: jnp.asarray(v) for k, v in dplan.arrays.items()}
            out, out_len, _ = core(voice.bank, voice.lengths, voice.gains,
                                   arrays)
            outs[(backend, text)] = np.asarray(out[: int(out_len)])

    for text in ("como se chama?", "bom dia. tudo bem."):
        a, b = outs[("xla", text)], outs[("pallas", text)]
        assert a.shape == b.shape, text
        assert np.array_equal(a, b), text


def test_kernel_no_export(data):
    base_off, cf_in, n_eff, ana, contrib, fo = data
    flat_ref, _, _ = ref_compose(*data)
    buf, _, _ = compose_units(
        jnp.asarray(base_off), jnp.asarray(cf_in), jnp.asarray(n_eff),
        jnp.asarray(ana), jnp.asarray(contrib), jnp.asarray(fo),
        U=U, UBUF=UBUF, CFMAX=CFMAX, TOT=TOT, export=False,
        interpret=True)
    assert np.array_equal(np.asarray(buf), flat_ref)
