"""Microbench the contour shifted-select resample on the live backend.

Sweeps the column-block grain (CTTS_CONTOUR_GRAIN is a trace-time knob,
so the sweep passes it explicitly through the env before each build) at
the bench-bucket shape: batch 64 sentences x [K_slots=1060, 512]
windows resampled to 256 columns with drift bound D=28
(synth/device.py stage "contour_sel" measured 21.9 ms/batch on v5e).

Usage: python tools/microbench_resample.py [--iters 5]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--grains", type=str, default="32,64,128,256")
    ap.add_argument("--batch", type=int, default=64)
    ap.add_argument("--stack", type=int, default=2)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)

    from ctts_tpu.ops import device_ops as dops

    # STACK batches per dispatch so the ~25 ms tunnel round-trip is
    # amortized out of the per-batch figure.
    STACK = args.stack
    B, K, FR, D = args.batch * STACK, 1060, 256, 28
    W = D + 2 * FR                      # wpad width as built in device.py
    rng = np.random.default_rng(0)
    wpad = jnp.asarray(
        rng.integers(-32768, 32767, (B, K, W)).astype(np.float32))
    # Drift respecting the triangular bound |drift[k,i]| <= i*(D-2)/256+1.
    ic = np.arange(FR)
    pf = rng.uniform(1 - (D - 2) / 256, 1 + (D - 2) / 256, (B, K, 1))
    drift = (np.floor(ic[None, None, :] * pf) - ic[None, None, :]
             ).astype(np.int32)
    drift = np.clip(drift, -D, D)
    driftj = jnp.asarray(drift)

    results = {}
    for g in (int(x) for x in args.grains.split(",")):
        os.environ["CTTS_CONTOUR_GRAIN"] = str(g)

        def run(wp, dr):
            a, b = jax.vmap(
                lambda w_, d_: dops.shifted_select_resample(w_, d_, D, FR)
            )(wp, dr)
            return a.sum() + b.sum()

        f = jax.jit(run)
        t_c0 = time.perf_counter()
        out = f(wpad, driftj)
        _ = np.asarray(out)
        compile_s = time.perf_counter() - t_c0
        best = 1e9
        for _ in range(args.iters):
            t0 = time.perf_counter()
            _ = np.asarray(f(wpad, driftj))
            best = min(best, time.perf_counter() - t0)
        per_batch = best / STACK
        results[g] = (round(per_batch, 5), round(compile_s, 1))
        print(f"# grain {g}: {per_batch * 1e3:.2f} ms/batch-{args.batch} "
              f"(compile {compile_s:.1f}s)", file=sys.stderr)
    print({"backend": jax.default_backend(),
           "shape": [B, K, FR], "D": D,
           "per_grain_s": {str(k): v for k, v in results.items()}})


if __name__ == "__main__":
    main()
