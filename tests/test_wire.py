"""Wire codec (ops/wire.py): lossless device→host audio transfer.

The encoder runs on device (here XLA:CPU — identical program to the TPU
lowering except the MXU), the decoders on host. Round-trip must be
bit-exact for arbitrary int16 content, including pathological residuals
(full-range alternation exercises the 5-plane class), and the serving
integration must be sample-identical to the plain packed path.
"""

import numpy as np
import pytest

from ctts_tpu.ops.wire import (
    WIRE_BLOCK,
    WIRE_CHUNK_W,
    decode_host,
    decode_np,
    encode_device,
    wire_valid_words,
)


def _signals():
    rng = np.random.default_rng(7)
    # Speech-like: band-limited random walk (small order-2 residual).
    walk = np.cumsum(rng.integers(-40, 41, 4096)).astype(np.int16)
    # Onset spikes: large residuals at random positions.
    spikes = np.zeros(2048, np.int16)
    spikes[rng.integers(0, 2048, 50)] = rng.integers(
        -32768, 32768, 50).astype(np.int16)
    # Worst case: full-range alternation (max second difference ±131070
    # — the 5-nibble-plane class).
    alt = np.tile(np.array([32767, -32768], np.int16), 1024)
    # Uniform noise and all-zero blocks mixed.
    noise = rng.integers(-32768, 32768, 3 * WIRE_BLOCK).astype(np.int16)
    noise[WIRE_BLOCK: 2 * WIRE_BLOCK] = 0
    return {"walk": walk, "spikes": spikes, "alt": alt, "noise": noise,
            "zeros": np.zeros(WIRE_BLOCK, np.int16)}


@pytest.mark.parametrize("name", list(_signals().keys()))
def test_roundtrip_bit_exact(name):
    import jax.numpy as jnp

    x = _signals()[name]
    wire, classes = encode_device(jnp.asarray(x))
    wire = np.asarray(wire)
    classes = np.asarray(classes)
    assert classes.min() >= 1 and classes.max() <= 5
    for dec in (decode_np, decode_host):
        got = dec(wire, classes, len(x))
        assert got.dtype == np.int16
        assert np.array_equal(got, x), (name, dec.__name__)


def test_prefix_decode_and_valid_words():
    """Decoding the first n samples must need (and read) only the wire
    words wire_valid_words reports — the trim path slices exactly that
    prefix off the device buffer."""
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    x = np.cumsum(rng.integers(-200, 201, 8 * WIRE_BLOCK)).astype(np.int16)
    wire, classes = encode_device(jnp.asarray(x))
    wire = np.asarray(wire)
    classes = np.asarray(classes)
    for n in (0, 1, WIRE_BLOCK - 1, WIRE_BLOCK, 3 * WIRE_BLOCK + 17,
              len(x)):
        need = wire_valid_words(classes, n)
        assert need % WIRE_CHUNK_W == 0
        got = decode_np(wire[:need], classes, n)
        assert np.array_equal(got, x[:n]), n
        got_c = decode_host(wire[:need].copy(), classes, n)
        assert np.array_equal(got_c, x[:n]), n


def test_native_decoder_rejects_bad_class():
    """A class outside 1..5 must fail closed (the ctypes wrapper then
    falls back to NumPy — which would misdecode, so the wrapper only
    falls back on the native lib's explicit -1)."""
    from ctts_tpu.ops.wire import _load_native

    lib = _load_native()
    if not lib:
        pytest.skip("native lib unavailable")
    import ctypes

    wire = np.zeros(WIRE_CHUNK_W, np.int32)
    cls = np.array([7], np.int32)
    out = np.empty(WIRE_BLOCK, np.int16)
    got = lib.ctn_wire_decode(
        wire.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        1, WIRE_BLOCK,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    assert got == -1


def test_wire_serving_matches_plain(voice_db):
    """BatchSynthesizer(wire=True) must produce sample-identical output
    to the plain packed path across execute() and the pipelined
    stream() — the codec is transport, never semantics."""
    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.parallel.batch import BatchSynthesizer

    db = VoiceDatabase(voice_db)
    config = config_defaults()
    bs_plain = BatchSynthesizer(db, config, wire=False)
    bs_wire = BatchSynthesizer(db, config, wire=True)
    assert bs_wire.wire and not bs_plain.wire

    texts = ["como vai", "que legal!", "bom dia. tudo bem.", "a rosa"]
    want = bs_plain.synthesize(texts)
    got = bs_wire.synthesize(texts)
    for t, w, g in zip(texts, want, got):
        assert w.shape == g.shape, t
        assert np.array_equal(w, g), t

    batches = [texts[:2], texts[2:]]
    for outs, ref in zip(bs_wire.stream(iter(batches)),
                         [want[:2], want[2:]]):
        for w, g in zip(ref, outs):
            assert np.array_equal(w, g)


def test_wire_serving_matches_plain_on_mesh(voice_db):
    """Wire codec under the 8-device mesh: the shard_map body encodes
    each shard's rows independently (the codec is block-local — no
    collectives), and the per-shard trim/decode must reassemble the
    exact same samples as the plain packed mesh path and the no-mesh
    path. Non-divisible batch (9 rows over 8 devices) exercises the
    padded-slot masking through the per-shard valid-word math."""
    import jax

    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.parallel.mesh import make_mesh

    if jax.device_count() < 8:
        import pytest

        pytest.skip("needs the 8-device mesh")

    db = VoiceDatabase(voice_db)
    config = config_defaults()
    mesh = make_mesh()
    bs_wire = BatchSynthesizer(db, config, mesh=mesh, wire=True)
    bs_plain = BatchSynthesizer(db, config, mesh=mesh, wire=False)
    bs_nomesh = BatchSynthesizer(db, config, wire=False)

    texts = ["como vai", "bom dia. tudo bem.", "que legal", "a rosa",
             "vamos", "oi", "nada", "sim claro", "mais um"]
    want = bs_nomesh.synthesize(texts)
    plain = bs_plain.synthesize(texts)
    got = bs_wire.synthesize(texts)
    for t, w, p, g in zip(texts, want, plain, got):
        assert w.shape == p.shape == g.shape, t
        assert np.array_equal(w, p), t
        assert np.array_equal(w, g), t

    # And through the pipelined stream() loop.
    for outs in bs_wire.stream([texts]):
        for t, w, g in zip(texts, want, outs):
            assert np.array_equal(w, g), t
