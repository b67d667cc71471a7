"""Per-phase timing of BatchSynthesizer.stream's steady state.

The pipelined serving loop's period is max(transfer, host work + sync
gaps); this decomposes one iteration into its host-visible phases so
the binding term is attributable:

  lower    _lower_batch: text -> stacked arrays (host CPU; native C++
           when available, Python pipeline otherwise)
  trim     out_lens sync + slice enqueue       (device round-trip)
  enqueue  jnp.asarray + core dispatch         (host + transfer H2D)
  wait     pending.result() (drain N-1)        (D2H bound)

Usage: timeout 1200 python tools/microbench_stream_phases.py [iters] [mult]

mult scales the batch (TEXTS * mult, default 4 = 64 sentences): the
period's fixed per-batch terms (tunnel RTT sync ~24 ms + host dispatch)
amortize with batch size until HBM or the link bind.
"""
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    iters = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    if iters < 3:
        sys.exit("need iters >= 3: medians skip the first 2 "
                 "(cold/pipeline-fill) samples")
    import jax

    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import TEXTS, build_db
    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.parallel.batch import BatchSynthesizer

    root = tempfile.mkdtemp(prefix="ctts_phases_")
    dbp = build_db(root)
    db = VoiceDatabase(dbp)
    config = config_defaults()
    floor = {"U": 32, "R": 16, "FD": 8, "WREG": 32768, "SMAX": 114688,
             "CONTW": 28672, "WIN": 2048, "CFMAX": 1024}
    # CTTS_PHASES_RULES=1 loads the reference rule file (glibc flavor):
    # the host `lower` phase must stay native-C-fast with rules on —
    # the reference applies normalization.csv on every synthesis.
    rules = None
    if os.environ.get("CTTS_PHASES_RULES") == "1":
        from ctts_tpu.text.rules import NormalizationRules

        rules = NormalizationRules.load(
            "/root/reference/normalization.csv", verbose=False)
    bs = BatchSynthesizer(db, config, rules=rules, dims_floor=floor)
    if rules is not None:
        assert bs._get_native_lowerer() is not None, \
            "rules must go through the native lowering"
    texts = TEXTS * (int(sys.argv[2]) if len(sys.argv) > 2 else 4)

    # Warm compile via the stream path.
    for _ in bs.stream([texts]):
        pass

    from concurrent.futures import ThreadPoolExecutor

    phases = {k: [] for k in
              ("lower", "trim", "enqueue", "wait", "period")}
    pool = ThreadPoolExecutor(max_workers=1)
    prev = None
    pending = None
    audio_s = []
    t_iter = time.perf_counter()
    for it in range(iters):
        t0 = time.perf_counter()
        prepped, spans = bs._lower_batch(texts, 1.0, True)
        t2 = time.perf_counter()
        if prev is not None:
            trimmed, pspans = bs._trim(prev[0]), prev[1]
        t3 = time.perf_counter()
        handles = bs._enqueue(prepped)
        t4 = time.perf_counter()
        if prev is not None:
            fut = pool.submit(bs._finish_stream, trimmed, pspans)
            if pending is not None:
                outs = pending.result()
                audio_s.append(sum(o.shape[0] for o in outs) / 22050.0)
            pending = fut
        t5 = time.perf_counter()
        prev = (handles, spans)
        phases["lower"].append(t2 - t0)
        phases["trim"].append(t3 - t2)
        phases["enqueue"].append(t4 - t3)
        phases["wait"].append(t5 - t4)
        phases["period"].append(time.perf_counter() - t_iter)
        t_iter = time.perf_counter()
    # Flush the tail.
    trimmed, pspans = bs._trim(prev[0]), prev[1]
    if pending is not None:
        pending.result()
    bs._finish_stream(trimmed, pspans)
    pool.shutdown()

    med = {k: round(float(np.median(v[2:])), 4) for k, v in phases.items()}
    med["audio_s_per_batch"] = round(float(np.median(audio_s)), 2)
    med["e2e_x_rt"] = round(med["audio_s_per_batch"] / med["period"], 1)
    print(json.dumps(med))


if __name__ == "__main__":
    main()
