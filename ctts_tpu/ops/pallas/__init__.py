"""Pallas TPU kernels (XLA fallbacks live in ops/device_ops.py).

Shared Mosaic compiler parameters: the sentence-scale kernels keep the
whole [R*WREG] sentence resident (input + output + apron, double-
buffered), which exceeds Mosaic's default 16 MB scoped-VMEM budget at
acceptance-bucket sizes (R=16, WREG=65536 needs 16.27 MB). v5e cores
have 128 MB of VMEM; raising the per-kernel limit is the intended
mechanism. 100 MB leaves headroom for Mosaic's own scratch while
keeping every gated bucket (synth/device.py:_pallas_sent_fits) safe.
"""


def out_struct(shape, dtype, *likes):
    """ShapeDtypeStruct for a pallas_call output, carrying the union of
    the inputs' varying-manual-axes sets. Inside a shard_map body with
    check_vma=True (the production mesh core, parallel/batch.py) jax
    requires pallas outputs to DECLARE how they vary across mesh axes;
    a per-shard kernel's output varies exactly like its data inputs.
    Outside shard_map every vma is empty and this is a plain struct."""
    import jax

    vma = frozenset()
    for a in likes:
        vma = vma | getattr(jax.typeof(a), "vma", frozenset())
    if vma:
        return jax.ShapeDtypeStruct(shape, dtype, vma=vma)
    return jax.ShapeDtypeStruct(shape, dtype)


def vmem_params(interpret: bool = False):
    """CompilerParams raising the scoped-VMEM cap (None in interpret
    mode, where Mosaic is not involved and the param is rejected)."""
    if interpret:
        return None
    from jax.experimental.pallas import tpu as pltpu

    return pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)
