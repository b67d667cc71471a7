"""Is the axon tunnel's D2H path bandwidth-bound or round-trip-bound?

If a single np.asarray of an 8 MB device array runs at ~26-45 MB/s but
P concurrent transfers of 8/P MB each aggregate faster, the tunnel is
per-stream-limited and the serving drain should split the packed buffer
into P contiguous device slices (enqueued at trim time) and pull them
from P threads.

Protocol (real TPU): produce a fresh device array per trial (jit output
— device_put arrays keep a cached host copy and np.asarray is free),
then time:
  A. one full-buffer np.asarray
  B. P sequential chunk transfers (chunks pre-sliced on device)
  C. P thread-parallel chunk transfers
for P in {2, 4, 8}.
"""

from __future__ import annotations

import threading
import time

import jax
import jax.numpy as jnp
import numpy as np

NBYTES = 8 << 20
N16 = NBYTES // 2


@jax.jit
def _produce(seed):
    return (jnp.arange(N16, dtype=jnp.int32) + seed).astype(jnp.int16)


_seed = [0]


def fresh():
    _seed[0] += 1
    a = _produce(jnp.int32(_seed[0]))
    a.block_until_ready()
    return a


def chunks_of(a, p):
    n = a.shape[0] // p
    cs = [a[i * n:(i + 1) * n] for i in range(p)]
    for c in cs:
        c.block_until_ready()
    return cs


def main():
    print("device:", jax.devices()[0])

    def t_full():
        a = fresh()
        t0 = time.perf_counter()
        np.asarray(a)
        return time.perf_counter() - t0

    ta = min(t_full() for _ in range(4))
    print(f"A full 8MB: {ta*1e3:.1f} ms ({NBYTES/ta/1e6:.1f} MB/s)")

    for p in (2, 4, 8):
        def t_seq():
            cs = chunks_of(fresh(), p)
            t0 = time.perf_counter()
            for c in cs:
                np.asarray(c)
            return time.perf_counter() - t0

        def t_par():
            cs = chunks_of(fresh(), p)
            t0 = time.perf_counter()
            ts = [threading.Thread(target=np.asarray, args=(c,))
                  for c in cs]
            for t in ts:
                t.start()
            for t in ts:
                t.join()
            return time.perf_counter() - t0

        tb = min(t_seq() for _ in range(3))
        tc = min(t_par() for _ in range(3))
        print(f"B seq {p}x{NBYTES//p>>20}MB: {tb*1e3:.1f} ms "
              f"({NBYTES/tb/1e6:.1f} MB/s)   "
              f"C par: {tc*1e3:.1f} ms ({NBYTES/tc/1e6:.1f} MB/s)")


if __name__ == "__main__":
    main()
