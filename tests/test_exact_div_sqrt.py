"""Correctly-rounded f32 division/sqrt primitives (ops/exact.py).

XLA:TPU's f32 divide and sqrt are ~1 ULP off IEEE round-to-nearest on a
large fraction of inputs (measured 25% / 40%), while the C reference,
the NumPy oracle, and XLA:CPU round correctly. div_rn/sqrt_rn recover
correct rounding with an exact-residual Newton step; on-chip validation
lives in the repro harness (0 mismatches over 4M/8.1M adversarial
values). These CPU tests pin the semantics: bit-equality with NumPy,
plus the golden-TPU regression case (96_decl_very_long: pitch ratio
157.5/185.294... straddles the 0.85 jump threshold by 1 ULP —
ctts.c:1899-1943 pitch estimate feeding the ctts.c smoothing jump test).
"""

import numpy as np
import jax
import jax.numpy as jnp

from ctts_tpu.ops.exact import div_rn, sqrt_rn

F32 = np.float32


def test_div_rn_matches_numpy():
    rng = np.random.default_rng(7)
    a1 = (22050.0 / rng.integers(30, 300, 200_000)).astype(F32)
    b1 = (22050.0 / rng.integers(30, 300, 200_000)).astype(F32)
    a2 = rng.uniform(-1e6, 1e6, 200_000).astype(F32)
    b2 = rng.uniform(1e-3, 1e6, 200_000).astype(F32)
    a = np.concatenate([a1, a2])
    b = np.concatenate([b1, b2])
    got = np.asarray(jax.jit(div_rn)(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, a / b)


def test_sqrt_rn_matches_numpy():
    rng = np.random.default_rng(8)
    x = np.concatenate([
        rng.uniform(0, 1e12, 400_000).astype(F32),
        (rng.integers(0, 2**30, 100_000)).astype(F32),
        np.array([0.0, 1.0, 2.0, 4.0], F32),
    ])
    got = np.asarray(jax.jit(sqrt_rn)(jnp.asarray(x)))
    assert np.array_equal(got, np.sqrt(x))


def test_div_rn_golden_tpu_regression_case():
    # next_p/prev_p for integer pitch lags whose true ratio is
    # 0.85 - 1e-9: the 1-ULP direction decides the jump test.
    prev_p = F32(22050.0) / F32(119.0)   # 185.29411...
    next_p = F32(157.5)
    want = next_p / prev_p               # NumPy: correctly rounded
    got = float(jax.jit(div_rn)(jnp.float32(next_p), jnp.float32(prev_p)))
    assert np.float32(got) == want
    assert not (want < np.float32(0.85))  # the C side: NOT a jump


def test_div_rn_ties_stay_fixed():
    # Exactly representable quotients and halfway ties must round to
    # the hardware (correct) result unchanged on CPU.
    a = np.array([1.0, 3.0, 10.0, 157.5, 0.0, -157.5], F32)
    b = np.array([2.0, 4.0, 8.0, 0.5, 3.0, 0.5], F32)
    got = np.asarray(jax.jit(div_rn)(jnp.asarray(a), jnp.asarray(b)))
    assert np.array_equal(got, a / b)
