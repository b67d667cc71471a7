"""Host-side sweep of the wire codec's design parameters.

Synthesizes the bench corpus with the NumPy oracle (no device), then
for each (predictor order, block size) computes the exact wire size
the nibble-plane codec would produce: avg planes/sample -> bytes vs
raw int16. Run before touching ops/wire.py — the codec's constants
are only worth changing if this shows a real byte cut on actual
synthesized speech (not test tones).

Usage: python tools/microbench_wire_params.py

Result on the bench corpus (2026-08-19): order/block are both nearly
flat — best (o2, b128) = 0.630x vs the shipped (o2, b512) = 0.659x, a
4.4% byte cut that would cost 4x the chunk rows in the device-side
compaction (and more encode ms). Not taken: the codec's nibble
granularity, not the predictor or block size, is the binding term,
and bit-granular packing is gather-shaped on TPU.
"""
import json
import os
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def plane_bytes(x: np.ndarray, order: int, block: int) -> int:
    """Exact wire bytes for one utterance under (order, block)."""
    r = x.astype(np.int64)
    for _ in range(order):
        r = np.diff(r, prepend=0)
    z = ((r << 1) ^ (r >> 63)).astype(np.int64)
    pad = -len(z) % block
    if pad:
        z = np.concatenate([z, np.zeros(pad, np.int64)])
    mx = z.reshape(-1, block).max(axis=1)
    # planes = nibbles needed for the block max (>=1)
    planes = np.ones(len(mx), np.int64)
    for thr in (0xF, 0xFF, 0xFFF, 0xFFFF, 0xFFFFF):
        planes += mx > thr
    return int((planes * block).sum()) // 2  # nibbles -> bytes


def main():
    from bench import TEXTS, build_db
    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.oracle import execute_plan_oracle

    root = tempfile.mkdtemp(prefix="ctts_wirep_")
    db = VoiceDatabase(build_db(root))
    config = config_defaults()
    auds = []
    for t in TEXTS:
        plan = compile_plan(db, t, config, None, 1.0)
        auds.append(execute_plan_oracle(plan, db))
    raw = sum(2 * len(a) for a in auds)
    out = {"raw_bytes": raw}
    for order in (1, 2, 3):
        for block in (128, 256, 512):
            wb = sum(plane_bytes(a, order, block) for a in auds)
            out[f"o{order}_b{block}"] = round(wb / raw, 4)
    print(json.dumps(out, indent=1))


if __name__ == "__main__":
    main()
