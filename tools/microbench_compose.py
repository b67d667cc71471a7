"""Microbenchmark + on-chip equality: Pallas compose kernel vs XLA scan.

Bench-bucket dims (B=64, U=32, UBUF=7168, CFMAX=1024, TOT=R*WREG) with
batch-varying offsets. Asserts bit-equality of buffers and the carved
boundary exports (pitch segment, energy tail), then times both
(pipelined sync, see microbench_place.bench).
"""

from __future__ import annotations

import sys

import numpy as np

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
from jax import lax

from ctts_tpu.ops.pallas.compose import SEGW, compose_units

F32 = jnp.float32
B, R, WREG, UBUF, CFMAX, U = 64, 16, 32768, 7168, 1024, 32
TOT = R * WREG
MARGIN = 3072
EXPW = 2 * CFMAX + 512
PITCH_SPAN = 495


def make_inputs():
    rng = np.random.default_rng(0)
    contrib = np.trunc(rng.uniform(-8000, 8000, (B, U, UBUF))
                       ).astype(np.float32)
    fo = rng.uniform(0.0, 1.0, (B, U, CFMAX)).astype(np.float32)
    offs = np.zeros((B, U), np.int32)
    for b in range(B):
        cur = np.zeros(R, np.int32)
        for k in range(U):
            r = k % R
            offs[b, k] = r * WREG + MARGIN + cur[r]
            cur[r] += rng.integers(1400, 1800)
    cf = rng.integers(0, CFMAX + 1, (B, U)).astype(np.int32)
    n = rng.integers(CFMAX + 1, UBUF + 1, (B, U)).astype(np.int32)
    ana = rng.integers(0, 2 * CFMAX + 1, (B, U)).astype(np.int32)
    return (jnp.asarray(contrib), jnp.asarray(fo), jnp.asarray(offs),
            jnp.asarray(cf), jnp.asarray(n), jnp.asarray(ana))


def xla_scan(contrib, fo, offs, cf_a, n_a, ana_a):
    def per_b(contrib, fo, offs, cf_a, n_a, ana_a):
        iu = jnp.arange(UBUF)

        def step(flat, k):
            boff = offs[k]
            cf = cf_a[k]
            n = n_a[k]
            x = contrib[k]
            win = lax.dynamic_slice(flat, (boff + cf - 2 * CFMAX,),
                                    (EXPW,))
            cur = lax.dynamic_slice(flat, (boff,), (UBUF,))
            mixed = jnp.trunc(jnp.clip(
                jnp.trunc(cur[:CFMAX] * fo[k] + x[:CFMAX]),
                -32768.0, 32767.0))
            x = jnp.where(iu < cf, jnp.pad(mixed, (0, UBUF - CFMAX)), x)
            neww = jnp.where(iu < n, x, cur)
            return lax.dynamic_update_slice(flat, neww, (boff,)), win

        flat, wins = lax.scan(step, jnp.zeros(TOT, F32), jnp.arange(U))
        segs = jax.vmap(
            lambda w, a: lax.dynamic_slice(w, (2 * CFMAX - a,),
                                           (PITCH_SPAN,))
        )(wins, ana_a)
        tails = wins[:, CFMAX:2 * CFMAX]
        return flat, segs, tails

    return jax.vmap(per_b)(contrib, fo, offs, cf_a, n_a, ana_a)


def pallas_compose(contrib, fo, offs, cf_a, n_a, ana_a, export=True):
    def per_b(contrib, fo, offs, cf_a, n_a, ana_a):
        buf, seg, tail = compose_units(offs, cf_a, n_a, ana_a, contrib, fo,
                                       U=U, UBUF=UBUF, CFMAX=CFMAX,
                                       TOT=TOT, export=export)
        return buf, seg[:, :PITCH_SPAN], tail

    return jax.vmap(per_b)(contrib, fo, offs, cf_a, n_a, ana_a)


def main():
    from tools.microbench_place import bench

    args = make_inputs()

    print("equality check...", flush=True)
    fx, sx, tx = jax.jit(xla_scan)(*args)
    fp, sp, tp = jax.jit(pallas_compose)(*args)
    fx, sx, tx, fp, sp, tp = (np.asarray(v)
                              for v in (fx, sx, tx, fp, sp, tp))
    print("buf equal:", np.array_equal(fx, fp),
          "seg equal:", np.array_equal(sx, sp),
          "tail equal:", np.array_equal(tx, tp), flush=True)
    assert np.array_equal(fx, fp) and np.array_equal(sx, sp) \
        and np.array_equal(tx, tp)

    bench(lambda *a: xla_scan(*a)[0], args, "xla_scan[export]")
    bench(lambda *a: pallas_compose(*a)[0], args, "pallas[export]")
    bench(lambda *a: pallas_compose(*a, export=False)[0], args,
          "pallas[no-export]")


if __name__ == "__main__":
    main()
