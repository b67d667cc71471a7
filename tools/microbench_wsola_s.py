"""Sweep the WSOLA batch kernel's interleave factor S on the real chip.

The S-interleaved kernel advances S sentences' frame chains in lockstep
to hide the per-frame dependency latency; S was capped by a stale 12 MB
VMEM budget written when the kernels ran under Mosaic's default 16 MB
scoped VMEM. v5e cores have 128 MB and the kernels already run with a
100 MB cap (ops/pallas/__init__.py), so this sweep measures where the
latency-hiding actually saturates.

Usage: timeout 1800 python tools/microbench_wsola_s.py [B] [S...]
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import jax
import jax.numpy as jnp

F32 = jnp.float32
SPEED = 1.5


def main():
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
    svals = [int(v) for v in sys.argv[2:]] or [1, 2, 4, 8, 16]
    SLEN = 131072

    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from ctts_tpu.ops.wsola_jax import (
        FRAME,
        _sliding_sumsq,
        _wsola_planes,
        synthesis_hop_for_speed,
    )
    from ctts_tpu.ops.pallas.wsola import wsola_frames_batch

    hop = synthesis_hop_for_speed(SPEED)
    max_steps = (SLEN - FRAME) // 128 + 2
    out_size = -(-(max_steps * hop + FRAME + 1024) // 1024) * 1024

    rng = np.random.default_rng(0)
    t = np.arange(SLEN, dtype=np.float32)
    inp = np.zeros((B, SLEN), np.float32)
    counts = np.zeros(B, np.int32)
    for b in range(B):
        n = int(rng.integers(40000, 70000))
        f0 = float(rng.uniform(90, 260))
        x = (6000 * np.sin(2 * np.pi * f0 * t[:n] / 22050)
             + 2000 * np.sin(2 * np.pi * 2.3 * f0 * t[:n] / 22050)
             + rng.normal(0, 400, n))
        inp[b, :n] = np.trunc(np.clip(x, -32768, 32767))
        counts[b] = n
    if os.environ.get("SORTED", "1") == "1":
        # Production batches arrive length-sorted (batch.py
        # _length_order); group-of-S lockstep waste ~0.
        order = np.argsort(-counts, kind="stable")
        inp, counts = inp[order], counts[order]

    # Planes once (vmapped host-side build).
    def planes(x, c):
        steps = jnp.arange(max_steps, dtype=jnp.int32)
        run_all = steps * 128 + FRAME <= c
        return _wsola_planes(x, run_all, max_steps)

    iv, sqs, sq4, nrun = jax.jit(jax.vmap(planes))(
        jnp.asarray(inp), jnp.asarray(counts))
    ic = jnp.asarray(counts)
    iv, sqs, sq4, nrun = jax.block_until_ready((iv, sqs, sq4, nrun))
    frames_total = int(np.asarray(nrun).sum())

    ref = None
    for S in svals:
        try:
            f = jax.jit(lambda *a: wsola_frames_batch(
                *a, hop=hop, out_size=out_size, S=S))
            acc, norm = f(iv, sqs, sq4, ic, nrun)
            acc, norm = jax.block_until_ready((acc, norm))
            accn = np.asarray(acc)
            if ref is None:
                ref = accn
            equal = bool(np.array_equal(ref, accn))
            ts = []
            for _ in range(4):
                t0 = time.perf_counter()
                r = f(iv, sqs, sq4, ic, nrun)
                jax.block_until_ready(r)
                ts.append(time.perf_counter() - t0)
            ms = float(np.median(ts)) * 1e3
            print(json.dumps({
                "S": S, "ms": round(ms, 2),
                "us_per_frame": round(ms * 1e3 / frames_total, 3),
                "equal": equal, "B": B, "frames": frames_total,
            }), flush=True)
        except Exception as e:
            print(json.dumps({"S": S, "error": str(e)[:200]}), flush=True)


if __name__ == "__main__":
    main()
