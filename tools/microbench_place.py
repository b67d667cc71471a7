"""Microbenchmark: sequential window-write patterns for the compose.

Patterns (per batch of B=64 sentences, R=16 regions, WREG=32768):
  scan32   — lax.scan over 32 unit slots, one ubuf-wide read-merge-write
             per step on the flat [R*WREG] buffer (round-2 baseline).
  unroll64 — 32 body writes + 32 head read-mix-writes, unrolled
             (the failed fastpath variant).
  grid8    — [J=8, R] grid: 8 scan steps, each step does a vmapped
             per-region window write on [R, WREG] rows (region offsets
             batch-varying over rows AND lanes).
Prints best wall times; checksums printed for rough sanity.
"""

from __future__ import annotations

import sys
import time

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32
B, R, WREG, UBUF, CFMAX, U, J = 64, 16, 32768, 7168, 1024, 32, 8


def make_inputs():
    rng = np.random.default_rng(0)
    contrib = rng.normal(size=(B, U, UBUF)).astype(np.float32)
    offs = np.zeros((B, U), np.int32)
    regions = np.zeros((B, U), np.int32)
    for b in range(B):
        cur = np.zeros(R, np.int32)
        for k in range(U):
            r = k % R
            regions[b, k] = r
            offs[b, k] = cur[r]
            cur[r] += rng.integers(2000, 5000)
    n = rng.integers(2000, UBUF, (B, U)).astype(np.int32)
    return (jnp.asarray(contrib), jnp.asarray(offs),
            jnp.asarray(regions), jnp.asarray(n))


def scan32(contrib, offs, regions, n):
    def per_b(contrib, offs, regions, n):
        iu = jnp.arange(UBUF)

        def step(flat, k):
            boff = regions[k] * WREG + offs[k]
            cur = lax.dynamic_slice(flat, (boff,), (UBUF,))
            neww = jnp.where(iu < n[k], contrib[k], cur)
            return lax.dynamic_update_slice(flat, neww, (boff,)), None

        flat, _ = lax.scan(step, jnp.zeros(R * WREG, F32),
                           jnp.arange(U))
        return flat

    return jax.vmap(per_b)(contrib, offs, regions, n)


def unroll64(contrib, offs, regions, n):
    def per_b(contrib, offs, regions, n):
        ib = jnp.arange(UBUF - CFMAX)
        ih = jnp.arange(CFMAX)
        flat = jnp.zeros(R * WREG, F32)
        for k in range(U):
            boff = regions[k] * WREG + offs[k] + CFMAX
            cur = lax.dynamic_slice(flat, (boff,), (UBUF - CFMAX,))
            neww = jnp.where(ib < n[k] - CFMAX, contrib[k, CFMAX:], cur)
            flat = lax.dynamic_update_slice(flat, neww, (boff,))
        for k in range(U):
            boff = regions[k] * WREG + offs[k]
            cur = lax.dynamic_slice(flat, (boff,), (CFMAX,))
            neww = jnp.where(ih < jnp.minimum(n[k], CFMAX),
                             contrib[k, :CFMAX] + cur * F32(0.5), cur)
            flat = lax.dynamic_update_slice(flat, neww, (boff,))
        return flat

    return jax.vmap(per_b)(contrib, offs, regions, n)


def grid8(contrib, offs, regions, n):
    # Host-side remap U slots -> [J, R] is free; here slot k -> (k//R, k%R)
    def per_b(contrib, offs, n):
        # contrib [J, R, UBUF], offs [J, R], n [J, R]
        iu = jnp.arange(UBUF)

        def step(bufs, j):
            def write_row(row, off_r, c_r, n_r):
                cur = lax.dynamic_slice(row, (off_r,), (UBUF,))
                neww = jnp.where(iu < n_r, c_r + cur * F32(0.5), cur)
                return lax.dynamic_update_slice(row, neww, (off_r,))

            return jax.vmap(write_row)(bufs, offs[j], contrib[j],
                                       n[j]), None

        bufs, _ = lax.scan(step, jnp.zeros((R, WREG), F32),
                           jnp.arange(J))
        return bufs

    # Slot k -> (j = k // R, r = k % R); U=32, R=16 -> J_real=2, pad to 8.
    c = contrib.reshape(B, U // R, R, UBUF)
    c = jnp.concatenate([c] * (J // (U // R)), axis=1)       # [B,J,R,UBUF]
    o = offs.reshape(B, U // R, R)
    o = jnp.concatenate([o + 256 * j for j in range(J // (U // R))],
                        axis=1)
    nn = jnp.concatenate([n.reshape(B, U // R, R)] * (J // (U // R)),
                         axis=1)
    return jax.vmap(per_b)(c, o, nn)


def bench(fn, args, name, iters=3, pipeline=8):
    """Time via `pipeline` back-to-back dispatches + ONE sync, so the
    ~29 ms tunnel round-trip (measured: a null program costs that much
    and 8 pipelined calls share one) amortizes out of the per-call
    number — matching both production PCIe and the serving loop."""
    jfn = jax.jit(lambda *a: jnp.sum(fn(*a)))
    t0 = time.perf_counter()
    np.asarray(jfn(*args))
    compile_s = time.perf_counter() - t0
    ts = []
    for _ in range(iters):
        t0 = time.perf_counter()
        rs = [jfn(*args) for _ in range(pipeline)]
        np.asarray(rs[-1])
        ts.append((time.perf_counter() - t0) / pipeline)
    print(f"{name}: best {min(ts)*1e3:.2f} ms/call "
          f"(pipelined x{pipeline}, compile {compile_s:.1f}s)",
          flush=True)


def main():
    contrib, offs, regions, n = make_inputs()
    bench(scan32, (contrib, offs, regions, n), "scan32")
    bench(unroll64, (contrib, offs, regions, n), "unroll64")
    bench(grid8, (contrib, offs, regions, n), "grid8")


if __name__ == "__main__":
    main()
