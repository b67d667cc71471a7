"""Pallas TPU kernels (XLA fallbacks live in ops/device_ops.py).

Shared Mosaic compiler parameters: the sentence-scale kernels keep the
whole [R*WREG] sentence resident (input + output + apron, double-
buffered), which exceeds Mosaic's default 16 MB scoped-VMEM budget at
acceptance-bucket sizes (R=16, WREG=65536 needs 16.27 MB). v5e cores
have 128 MB of VMEM; raising the per-kernel limit is the intended
mechanism. 100 MB leaves headroom for Mosaic's own scratch while
keeping every gated bucket (synth/device.py:_pallas_sent_fits) safe.
"""


def vmem_params(interpret: bool = False):
    """CompilerParams raising the scoped-VMEM cap (None in interpret
    mode, where Mosaic is not involved and the param is rejected)."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
