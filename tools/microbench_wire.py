"""Wire codec measurement on the bench corpus (ops/wire.py).

Reports the wire-size ratio vs raw int16, the block-class histogram,
the device encode cost (as part of the packed serving core: wire core
period minus plain core period), and the host decode throughput of
both decoders. Run with the TPU backend for real numbers; any backend
round-trips bit-exactly.

Usage: timeout 1200 python tools/microbench_wire.py [iters]
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 6
    import jax

    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import TEXTS, build_db
    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.ops.wire import WIRE_BLOCK, decode_host, decode_np, \
        wire_valid_words
    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.plan.split import split_plan

    root = tempfile.mkdtemp(prefix="ctts_wire_")
    dbp = build_db(root)
    db = VoiceDatabase(dbp)
    config = config_defaults()
    floor = {"U": 32, "R": 16, "FD": 8, "WREG": 32768, "SMAX": 114688,
             "CONTW": 28672, "WIN": 2048, "CFMAX": 1024}
    texts = TEXTS * 4

    res = {}
    for mode in ("plain", "wire"):
        bs = BatchSynthesizer(db, config, dims_floor=floor,
                              wire=(mode == "wire"))
        rows = []
        for pl in bs.compile_plans(texts, 1.0):
            rows.extend(split_plan(pl, db))
        bs.execute(rows)  # warm compile
        # Compute-only period (one out_lens sync for K pipelined calls).
        periods = []
        for _ in range(iters):
            t0 = time.perf_counter()
            hs = [bs._dispatch(rows) for _ in range(4)]
            for h in hs:
                for _, items, hd in h[1]:
                    np.asarray(hd[3])
            periods.append((time.perf_counter() - t0) / 4)
        res[f"{mode}_core_ms"] = round(
            float(np.median(periods)) * 1e3, 1)
        # End-to-end collect of the last dispatch (includes D2H + decode).
        t0 = time.perf_counter()
        outs = bs._collect(hs[-1])
        res[f"{mode}_collect_ms"] = round(
            (time.perf_counter() - t0) * 1e3, 1)
        if mode == "wire":
            _, per_bucket = hs[-1]
            raw = wire_b = 0
            hist = {}
            for _, items, hd in per_bucket:
                lens = np.asarray(hd[3])
                classes = np.asarray(hd[2][1])
                tot = int(lens[: hd[0]].sum())
                raw += tot * 2
                wire_b += wire_valid_words(classes, tot) * 4
                nblk = -(-tot // WIRE_BLOCK)
                for c, k in zip(*np.unique(classes[:nblk],
                                           return_counts=True)):
                    hist[int(c)] = hist.get(int(c), 0) + int(k)
                # Host decode throughput on this payload.
                ww = np.asarray(hd[2][0])[: wire_valid_words(classes, tot)]
                for name, dec in (("c", decode_host), ("np", decode_np)):
                    t0 = time.perf_counter()
                    flat = dec(ww, classes, tot)
                    res[f"decode_{name}_msps"] = round(
                        tot / (time.perf_counter() - t0) / 1e6, 1)
                break
            res["wire_ratio"] = round(wire_b / max(raw, 1), 3)
            tot_blk = sum(hist.values())
            res["class_hist"] = {
                c: round(k / tot_blk, 3) for c, k in sorted(hist.items())}
            res["roundtrip_exact"] = bool(all(
                np.array_equal(a, b) for a, b in zip(
                    outs, BatchSynthesizer(
                        db, config, dims_floor=floor, wire=False
                    ).execute(rows))))
    print(json.dumps(res))


if __name__ == "__main__":
    main()
