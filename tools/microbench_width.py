"""Microbenchmark: compose-scan step cost vs carry-buffer width.

Hypothesis (round-3): inside a vmapped lax.scan, each dynamic
slice/update on the carry costs time proportional to the FULL carry
size (XLA copies the buffer per step rather than updating in place),
so a compact region layout (buffer sized by actual audio, not
R * WREG padding) would cut the placement-scan cost by the padding
ratio (~4x at the bench bucket).

The unit workload (contribution widths, write offsets) is IDENTICAL
across widths — offsets are laid out compactly so they fit the
smallest buffer; only the flat carry width varies. Any ms/call delta
is therefore the pure buffer-size effect.
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

F32 = jnp.float32
B, UBUF, CFMAX, U = 64, 7168, 1024, 32


def make_inputs():
    rng = np.random.default_rng(0)
    contrib = rng.normal(size=(B, U, UBUF)).astype(np.float32)
    offs = np.zeros((B, U), np.int32)
    for b in range(B):
        cur = 0
        for k in range(U):
            offs[b, k] = cur
            cur += rng.integers(1400, 1800)  # ~56k total content
    n = rng.integers(2000, UBUF, (B, U)).astype(np.int32)
    return jnp.asarray(contrib), jnp.asarray(offs), jnp.asarray(n)


def make_scan(tot, unroll):
    def scan32(contrib, offs, n):
        def per_b(contrib, offs, n):
            iu = jnp.arange(UBUF)

            def step(flat, k):
                boff = offs[k]
                cur = lax.dynamic_slice(flat, (boff,), (UBUF,))
                mixed = jnp.trunc(cur[:CFMAX] * F32(0.5)
                                  + contrib[k, :CFMAX])
                x = jnp.where(iu < CFMAX,
                              jnp.pad(mixed, (0, UBUF - CFMAX)),
                              contrib[k])
                neww = jnp.where(iu < n[k], x, cur)
                return lax.dynamic_update_slice(flat, neww, (boff,)), None

            flat, _ = lax.scan(step, jnp.zeros(tot, F32),
                               jnp.arange(U), unroll=unroll)
            return flat

        return jax.vmap(per_b)(contrib, offs, n)

    return scan32


def main():
    from tools.microbench_place import bench

    args = make_inputs()
    for tot in (524288, 131072, 65536):
        for unroll in (1,):
            bench(make_scan(tot, unroll), args,
                  f"scan32[tot={tot},unroll={unroll}]")


def probe_floor():
    """What sets the ~0.5 ms/step floor? Bodies with (a) elementwise
    only, (b) batch-invariant dynamic ops, (c) 1 vs 2 dynamic ops."""
    from tools.microbench_place import bench

    contrib, offs, n = make_inputs()
    tot = 131072

    def elementwise(contrib, offs, n):
        def per_b(contrib, offs, n):
            def step(flat, k):
                return flat * F32(0.999) + F32(1e-6) * contrib[k, 0], None
            flat, _ = lax.scan(step, jnp.zeros(tot, F32), jnp.arange(U))
            return flat
        return jax.vmap(per_b)(contrib, offs, n)

    def invariant(contrib, offs, n):
        def per_b(contrib, offs, n):
            iu = jnp.arange(UBUF)
            def step(flat, k):
                boff = k * 1536  # batch-invariant offset
                cur = lax.dynamic_slice(flat, (boff,), (UBUF,))
                neww = jnp.where(iu < n[k], contrib[k], cur)
                return lax.dynamic_update_slice(flat, neww, (boff,)), None
            flat, _ = lax.scan(step, jnp.zeros(tot, F32), jnp.arange(U))
            return flat
        return jax.vmap(per_b)(contrib, offs, n)

    def one_op(contrib, offs, n):
        def per_b(contrib, offs, n):
            def step(flat, k):
                neww = contrib[k] + flat[:UBUF] * F32(0.5)
                return lax.dynamic_update_slice(flat, neww, (offs[k],)), None
            flat, _ = lax.scan(step, jnp.zeros(tot, F32), jnp.arange(U))
            return flat
        return jax.vmap(per_b)(contrib, offs, n)

    bench(elementwise, (contrib, offs, n), "elementwise32")
    bench(invariant, (contrib, offs, n), "invariant32")
    bench(one_op, (contrib, offs, n), "one_dynamic_op32")


if __name__ == "__main__":
    import sys as _s
    probe_floor() if "--probe" in _s.argv else main()
