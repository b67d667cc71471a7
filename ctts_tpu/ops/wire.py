"""Lossless wire codec for the device→host audio transfer.

The serving loop's end-to-end rate on a slow host link (the tunnel here
runs at ~30-50 MB/s; even PCIe matters at pod scale) is capped by the
packed int16 payload. This codec cuts the wire bytes ~1.5x losslessly:

  1. second-order delta over the flat packed buffer (FLAC's fixed
     order-2 predictor — speech PCM residuals are small except at
     onsets), zigzag-mapped to non-negative;
  2. per 512-sample block, the residuals are stored as 1-5 nibble
     planes — the class (plane count) is the block's max residual
     width rounded up to 4 bits;
  3. selected (block, plane) chunks — 512 nibbles = 64 int32 words
     each — are compacted block-major into one dense stream.

Everything is gather-free TPU-native: deltas/planes are elementwise,
classes are reshaped max-reductions, and the compaction rides the
exact one-hot MXU matmul pattern (byte values ≤ 255 are bf16-exact,
one nonzero product per output — see ops/exact.py) over a lax.scan of
output tiles. Plane 0 is always present, so 256 output chunks span at
most 1280 input rows — the static window bound that makes each tile a
dynamic_slice + matmul instead of a gather.

The host decodes with one streaming C pass (ctn_wire_decode in
runtime/csrc/ctts_native.cpp) or the vectorized NumPy fallback here:
nibble planes OR together, zigzag-undo, and two int32 cumsums invert
the order-2 predictor exactly (wraparound semantics match).

Measured on the bench corpus (tools/microbench_wire.py): 0.66x wire
bytes at class histogram {1: 22%, 3: 68%, 4: 9%}.
"""

from __future__ import annotations

import numpy as np

WIRE_BLOCK = 512     # samples per block
WIRE_PLANES = 5      # max nibble planes: |r| < 2^18 -> zigzag < 2^19? no:
#                      r in [-131072, 131070] -> z <= 262143 < 2^18 -> 4.5
#                      nibbles -> 5 planes
WIRE_CHUNK_W = WIRE_BLOCK // 8   # int32 words per chunk (8 nibbles/word)
WIRE_TILE = 256      # compaction tile: output chunks per scan step
# Window span bound: >=1 selected row (plane 0) per 5 consecutive rows,
# so WIRE_TILE outputs span <= 5*WIRE_TILE + 4 input rows.
WIRE_WIN = 5 * WIRE_TILE + 256


def encode_device(p):
    """Encode an int16 device buffer [L] -> (wire int32 [cap], classes
    int32 [nblk]). L must be a multiple of WIRE_BLOCK (the packed
    serving buffer is B*OMAX with OMAX a power of two; asserted).

    The wire stream's valid prefix is `64 * sum(classes[:ceil(valid
    samples / 512)])` words — computed host-side by wire_valid_words
    after the tiny classes sync."""
    import jax.numpy as jnp
    from jax import lax

    L = p.shape[0]
    assert L % WIRE_BLOCK == 0, L
    nblk = L // WIRE_BLOCK
    x = p.astype(jnp.int32)
    xm1 = jnp.concatenate([jnp.zeros(1, jnp.int32), x[:-1]])
    xm2 = jnp.concatenate([jnp.zeros(2, jnp.int32), x[:-2]])
    r = x - 2 * xm1 + xm2
    z = (r << 1) ^ (r >> 31)                       # zigzag, < 2^18

    zb = z.reshape(nblk, WIRE_BLOCK)
    mx = jnp.max(zb, axis=1)
    classes = (
        1
        + (mx > 0xF).astype(jnp.int32)
        + (mx > 0xFF).astype(jnp.int32)
        + (mx > 0xFFF).astype(jnp.int32)
        + (mx > 0xFFFF).astype(jnp.int32)
    )

    # Nibble planes -> byte rows: chunk row b*5+p holds plane p of
    # block b as 256 byte values (lo nibble = even sample).
    planes = [(zb >> (4 * pl)) & 0xF for pl in range(WIRE_PLANES)]
    by = [pn[:, 0::2] | (pn[:, 1::2] << 4) for pn in planes]
    chunks = jnp.stack(by, axis=1).reshape(nblk * WIRE_PLANES,
                                           WIRE_BLOCK // 2)
    rows = nblk * WIRE_PLANES
    mask = (jnp.arange(WIRE_PLANES)[None, :]
            < classes[:, None]).reshape(rows)
    cs = jnp.cumsum(mask.astype(jnp.int32))        # rank of each row

    # Tile window starts: s[t] = #rows with rank <= t*TILE (the row
    # index of the (t*TILE+1)-th selected row). Gather-free compare-sum.
    pad_rows = max(WIRE_WIN - rows, 0)
    if pad_rows:
        chunks = jnp.concatenate(
            [chunks, jnp.zeros((pad_rows, WIRE_BLOCK // 2), jnp.int32)])
        cs = jnp.concatenate(
            [cs, jnp.full(pad_rows, rows + 1, jnp.int32)])
        mask = jnp.concatenate([mask, jnp.zeros(pad_rows, bool)])
    ntiles = -(-rows // WIRE_TILE)
    j0s = jnp.arange(ntiles, dtype=jnp.int32) * WIRE_TILE
    s_all = jnp.sum(
        (cs[None, :] <= j0s[:, None]).astype(jnp.int32), axis=1)
    s_all = jnp.clip(s_all, 0, rows + pad_rows - WIRE_WIN)

    chunks_bf = chunks.astype(jnp.bfloat16)
    mask_i = mask.astype(jnp.int32)
    tl = jnp.arange(WIRE_TILE, dtype=jnp.int32)

    def tile(carry, inp):
        s, j0 = inp
        win = lax.dynamic_slice(chunks_bf, (s, 0),
                                (WIRE_WIN, WIRE_BLOCK // 2))
        csw = lax.dynamic_slice(cs, (s,), (WIRE_WIN,))
        mw = lax.dynamic_slice(mask_i, (s,), (WIRE_WIN,))
        jj = j0 + 1 + tl                           # target ranks
        oh = ((csw[None, :] == jj[:, None]) & (mw[None, :] > 0))
        out = jnp.matmul(oh.astype(jnp.bfloat16), win,
                         preferred_element_type=jnp.float32)
        return carry, out.astype(jnp.int32)

    _, sel = lax.scan(tile, 0, (s_all, j0s))
    sel = sel.reshape(ntiles * WIRE_TILE, WIRE_BLOCK // 2)

    # Pack 4 byte lanes -> one int32 word (little-endian byte order;
    # 255<<24 wraps negative — the host reads the words as uint32).
    b4 = sel.reshape(-1, WIRE_CHUNK_W, 4)
    wire = (b4[..., 0] | (b4[..., 1] << 8) | (b4[..., 2] << 16)
            | (b4[..., 3] << 24))
    return wire.reshape(-1), classes


def wire_valid_words(classes: np.ndarray, valid_samples: int) -> int:
    """Host: int32 words covering the first `valid_samples` samples."""
    nblk_v = -(-int(valid_samples) // WIRE_BLOCK)
    return int(classes[:nblk_v].sum()) * WIRE_CHUNK_W


def decode_np(wire: np.ndarray, classes: np.ndarray,
              nsamples: int) -> np.ndarray:
    """NumPy reference decoder: wire int32 words + per-block classes ->
    int16 [nsamples]. Bit-exact inverse of encode_device."""
    if nsamples == 0:
        return np.zeros(0, np.int16)
    K = WIRE_BLOCK
    nblk = -(-nsamples // K)
    cls = np.asarray(classes[:nblk], np.int64)
    total = int(cls.sum())
    w = np.asarray(wire[: total * WIRE_CHUNK_W]).view(np.uint32)
    w = w.reshape(total, WIRE_CHUNK_W)
    ends = np.cumsum(cls)
    sel_b = np.repeat(np.arange(nblk), cls)
    sel_p = np.arange(total) - np.repeat(ends - cls, cls)

    widx = np.arange(K) // 8
    shifts = (4 * (np.arange(K) % 8)).astype(np.uint32)
    nib = ((w[:, widx] >> shifts[None, :]) & 0xF).astype(np.int32)

    z = np.zeros((nblk, K), np.int32)
    for pl in range(WIRE_PLANES):
        rows = sel_p == pl
        if rows.any():
            z[sel_b[rows]] |= nib[rows] << (4 * pl)
    z = z.reshape(-1)
    r = (z >> 1) ^ -(z & 1)
    with np.errstate(over="ignore"):
        x = np.cumsum(np.cumsum(r, dtype=np.int32), dtype=np.int32)
    return x[:nsamples].astype(np.int16)


_native_decode = None


def _load_native():
    global _native_decode
    if _native_decode is not None:
        return _native_decode
    try:
        import ctypes

        from ctts_tpu.runtime.native import _load

        lib = _load()
        if lib is None or not hasattr(lib, "ctn_wire_decode"):
            _native_decode = False
            return False
        lib.ctn_wire_decode.restype = ctypes.c_int64
        lib.ctn_wire_decode.argtypes = [
            ctypes.POINTER(ctypes.c_uint32),
            ctypes.POINTER(ctypes.c_int32),
            ctypes.c_int64, ctypes.c_int64,
            ctypes.POINTER(ctypes.c_int16),
        ]
        _native_decode = lib
    except Exception:
        _native_decode = False
    return _native_decode


def decode_host(wire: np.ndarray, classes: np.ndarray,
                nsamples: int) -> np.ndarray:
    """Decode with the native C pass when available (one streaming
    loop, releases the GIL — the serving drain thread calls this), the
    NumPy path otherwise."""
    lib = _load_native()
    if not lib or nsamples == 0:
        return decode_np(wire, classes, nsamples)
    import ctypes

    nblk = -(-int(nsamples) // WIRE_BLOCK)
    cls = np.ascontiguousarray(classes[:nblk], np.int32)
    need = wire_valid_words(cls, nsamples)
    w = np.ascontiguousarray(wire[:need], np.int32)
    out = np.empty(nsamples, np.int16)
    got = lib.ctn_wire_decode(
        w.ctypes.data_as(ctypes.POINTER(ctypes.c_uint32)),
        cls.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        nblk, nsamples,
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int16)),
    )
    if got != nsamples:
        return decode_np(wire, classes, nsamples)
    return out
