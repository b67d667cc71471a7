"""Exact integer dot products on TPU via hi/lo splitting.

All decision-bearing correlations in the pipeline (pitch lag argmax, the
voiced threshold, WSOLA offset search) take int16-valued f32 inputs. An
f32 accumulation of their products is order-dependent (XLA trees, the C
sums sequentially), which flips discrete decisions on near-ties — the
round-1 parity gap. These helpers compute the mathematically EXACT
integer correlation, correctly rounded to f32 once at the end, so device
and oracle agree bit-for-bit (the oracle computes the same integer in
f64 — see dsp_np.exact_corr_f32).

Scheme: split x = 256·xh + xl with xh, xl ∈ [-128, 128]. Both halves are
exact in bf16 (≤ 8 significand bits), so even the MXU's default bf16
pass computes their products exactly, and partial sums of ≤ 2^9 products
stay below 2^24 — exact in f32 in ANY accumulation order. The three
component sums are then combined into the correctly rounded f32 of the
exact integer with a TwoSum (the exact value can reach ~2^39, beyond f32
integer range, so naive adds would double-round).

Bounds: |x|,|y| ≤ 32768 and n ≤ 512 terms per dot product keeps every
component sum ≤ n·2^14 ≤ 2^23 and the total < 2^40 — inside the scheme's
validity range.
"""

from __future__ import annotations

import jax.numpy as jnp

F32 = jnp.float32


def split_hi_lo(x: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """x (int16-valued f32) -> (xh, xl) with x = 256*xh + xl, both in
    [-128, 128] — exactly representable in bf16."""
    xh = jnp.round(x * F32(1.0 / 256.0))
    return xh, x - F32(256.0) * xh


def two_sum(a: jnp.ndarray, b: jnp.ndarray):
    """Knuth TwoSum: s = fl(a+b), e exact error (a+b = s+e)."""
    s = a + b
    bv = s - a
    av = s - bv
    br = b - bv
    ar = a - av
    return s, ar + br


def combine_exact(hh: jnp.ndarray, mid: jnp.ndarray,
                  ll: jnp.ndarray, mid_scale: float) -> jnp.ndarray:
    """Correctly rounded f32 of the exact integer
    65536*hh + mid_scale*mid + ll, where hh/mid/ll are exact integer
    component sums (each ≤ ~2^23) and mid_scale ∈ {256, 512}.

    65536*hh and mid_scale*mid are exact (power-of-two scalings); their
    TwoSum error is an exact small integer that combines exactly with ll,
    so the final add is the single correct rounding of the true value."""
    a = F32(65536.0) * hh
    b = F32(mid_scale) * mid
    s, e = two_sum(a, b)
    return s + (e + ll)


def exact_dot_components(xh, xl, yh, yl, contract):
    """Exact dot of split operands: `contract(a, b)` must compute the
    (any-order) sum of elementwise products — e.g. an einsum, a conv, or
    jnp.sum(a*b). Returns the correctly rounded f32 of the exact
    integer Σ x·y."""
    hh = contract(xh, yh)
    mid = contract(xh, yl) + contract(xl, yh)  # ≤ 2^24, exact
    ll = contract(xl, yl)
    return combine_exact(hh, mid, ll, 256.0)


def two_prod(a: jnp.ndarray, b: jnp.ndarray):
    """Dekker two-product without FMA: p = fl(a*b), e the exact error
    (a*b = p + e). Veltkamp 12-bit splitting; valid away from overflow
    (|a*b| < ~2^126) and denormal underflow — the parity chains here
    stay in [2^-60, 2^50]."""
    SPLIT = F32(4097.0)  # 2^12 + 1
    ca = SPLIT * a
    ah = ca - (ca - a)
    al = a - ah
    cb = SPLIT * b
    bh = cb - (cb - b)
    bl = b - bh
    p = a * b
    e = ((ah * bh - p) + ah * bl + al * bh) + al * bl
    return p, e


def div_rn(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Correctly rounded f32 division a/b on ANY backend.

    XLA:TPU lowers f32 division to a reciprocal approximation plus
    refinement that is ~1 ULP off IEEE round-to-nearest on ~25% of
    values (measured) — while the C reference, NumPy oracle, and
    XLA:CPU divide correctly rounded. A 1-ULP flip at a decision
    threshold (pitch jump ratio at exactly 0.85, floor() of a resample
    position) diverges the waveform structurally (the golden-TPU
    96_decl_very_long failure). Markstein recovery: one Newton step
    with an EXACT residual (two_prod) makes the hardware quotient
    correctly rounded. b must be nonzero (callers guard)."""
    a = jnp.asarray(a, F32)
    b = jnp.asarray(b, F32)
    q0 = a / b
    p, e = two_prod(q0, b)
    # p ≈ a within 2 ULP ⇒ a - p exact (Sterbenz); e is tiny.
    r = (a - p) - e
    return q0 + r / b


def sqrt_rn(x: jnp.ndarray) -> jnp.ndarray:
    """Correctly rounded f32 sqrt on ANY backend (XLA:TPU's sqrt is
    ~1 ULP off on ~40% of values — measured; same recovery scheme as
    div_rn). Negative inputs propagate the hardware NaN."""
    x = jnp.asarray(x, F32)
    s0 = jnp.sqrt(x)
    p, e = two_prod(s0, s0)
    r = (x - p) - e
    s = s0 + r / (s0 + s0)
    return jnp.where(x > 0, s, s0)


def exact_sumsq_components(xh, xl, contract):
    """Correctly rounded f32 of the exact Σ x², given split halves and a
    `contract(a, b)` sum-of-products. x² = 65536·xh² + 512·xh·xl + xl²."""
    hh = contract(xh, xh)
    mid = contract(xh, xl)
    ll = contract(xl, xl)
    return combine_exact(hh, mid, ll, 512.0)
