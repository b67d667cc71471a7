"""int16 quantization semantics on device.

The reference pipeline stores int16 at every stage boundary with C cast
semantics: clamp to [-32768, 32767] then truncate toward zero. The device
path computes in float32 but *re-quantizes at the same points* so that
values stay on the reference's integer lattice; truncation (not rounding)
matters because gains < 1 bias toward zero.
"""

from __future__ import annotations

import jax.numpy as jnp

I16_MIN = -32768.0
I16_MAX = 32767.0


def q16(x: jnp.ndarray) -> jnp.ndarray:
    """Clamp + truncate toward zero; stays float32 but integer-valued."""
    return jnp.trunc(jnp.clip(x, I16_MIN, I16_MAX))


def trunc16(x: jnp.ndarray) -> jnp.ndarray:
    """Truncate toward zero without clamping (for in-range casts)."""
    return jnp.trunc(x)


def wrap16(x: jnp.ndarray) -> jnp.ndarray:
    """Two's-complement int16 wraparound of integer-valued floats
    (emulates gcc's int16_t overflow in OLA accumulators)."""
    return jnp.mod(x + 32768.0, 65536.0) - 32768.0
