"""Measure whether device→host transfer overlaps device compute on axon.

Round-4 question: the serving loop's D2H drain (~0.3 s/batch at the
tunnel's 20-45 MB/s) does not overlap compute today because the packed
trim op FIFO-queues behind the next batch's compute (batch.py stream
docstring). If a *materialized* device array's transfer can proceed
while an independent compute program runs, reordering the loop (trim N
→ dispatch N+1 → drain N) hides the transfer behind compute.

Protocol (real TPU):
  A. transfer-alone: np.asarray of a ready 8 MB int16 array.
  B. compute-alone: a matmul chain sized to ~0.3-0.5 s, synced.
  C. overlap: dispatch compute, then immediately np.asarray the ready
     array. If total ≈ max(A, B) → overlap works; ≈ A+B → serialized.
  D. same as C but with copy_to_host_async() issued before dispatch.
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np


def timed(fn, n=3):
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        fn()
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    dev = jax.devices()[0]
    print("device:", dev)

    nbytes = 8 << 20
    n16 = nbytes // 2

    # The array MUST be produced on device (a jit output): device_put
    # arrays keep a cached host copy on axon and np.asarray is free.
    # Vary a seed per iteration so no host-side caching can kick in.
    @jax.jit
    def produce(seed):
        return (jnp.arange(n16, dtype=jnp.int32) + seed).astype(jnp.int16)

    seed = [0]

    def fresh():
        seed[0] += 1
        a = produce(jnp.int32(seed[0]))
        a.block_until_ready()
        return a

    big = fresh()

    # Compute program ~0.3-0.5 s: iterated matmul on a [2048,2048] f32.
    m = jnp.ones((2048, 2048), jnp.float32)

    import functools

    @functools.partial(jax.jit, static_argnums=1)
    def chain(m, k):
        def body(c, _):
            c = (c @ m) * 1e-3
            return c, ()
        c, _ = jax.lax.scan(body, m, None, length=k)
        return c[0, 0]

    # Calibrate k so compute ≈ 0.4 s.
    k = 64
    while True:
        t = timed(lambda: np.asarray(chain(m, k)), n=2)
        print(f"compute k={k}: {t*1e3:.1f} ms")
        if t > 0.35 or k >= 4096:
            break
        k *= 2
    compute_t = t

    def xfer_alone():
        a = fresh()              # produced + synced, not in timing? no:
        t0 = time.perf_counter()
        np.asarray(a)
        return time.perf_counter() - t0

    ta = min(xfer_alone() for _ in range(4))
    print(f"A transfer-alone: {ta*1e3:.1f} ms ({nbytes/ta/1e6:.1f} MB/s)")

    def overlap_plain():
        a = fresh()
        t0 = time.perf_counter()
        h = chain(m, k)          # async dispatch
        _ = np.asarray(a)        # transfer a ready array
        np.asarray(h)            # sync compute
        return time.perf_counter() - t0

    tc = min(overlap_plain() for _ in range(3))
    print(f"C dispatch-then-drain: {tc*1e3:.1f} ms "
          f"(A+B={1e3*(ta+compute_t):.1f}, max={1e3*max(ta,compute_t):.1f})")

    def overlap_async():
        a = fresh()
        t0 = time.perf_counter()
        try:
            a.copy_to_host_async()
        except Exception as e:
            print("copy_to_host_async unsupported:", e)
        h = chain(m, k)
        _ = np.asarray(a)
        np.asarray(h)
        return time.perf_counter() - t0

    td = min(overlap_async() for _ in range(3))
    print(f"D async-copy-then-dispatch: {td*1e3:.1f} ms")

    # E: does a dependent trim (dynamic_slice) enqueued BEFORE the
    # compute let the transfer overlap? Mirrors the real loop where the
    # trim op must run on-device first (output NOT yet materialized at
    # drain time — the drain must wait for the trim, which is queued
    # ahead of the compute).
    @jax.jit
    def trim(x):
        return jax.lax.dynamic_slice(x, (0,), (n16 - 1024,))

    def overlap_trim_first():
        a = fresh()
        t0 = time.perf_counter()
        tr = trim(a)             # enqueued first, fast
        h = chain(m, k)          # compute behind the trim
        _ = np.asarray(tr)       # transfer of trim result
        np.asarray(h)
        return time.perf_counter() - t0

    te = min(overlap_trim_first() for _ in range(3))
    print(f"E trim→compute→drain: {te*1e3:.1f} ms")

    # F: background-thread drain of a materialized array while the main
    # thread dispatches + syncs compute (mirrors a drain-thread design).
    import threading

    def overlap_thread():
        a = fresh()
        t0 = time.perf_counter()
        out = {}
        th = threading.Thread(target=lambda: out.__setitem__("x", np.asarray(a)))
        th.start()
        h = chain(m, k)
        np.asarray(h)
        th.join()
        return time.perf_counter() - t0

    tf = min(overlap_thread() for _ in range(3))
    print(f"F thread-drain+compute: {tf*1e3:.1f} ms")


if __name__ == "__main__":
    main()
