"""Batched, sharded synthesis: the TPU production path.

Sentences are compiled to plans on host, lowered to dense arrays, grouped
into buckets of identical static dimensions, stacked, and executed as a
vmapped jitted core — sharded over a 1-D device mesh on the batch axis
when a mesh is supplied. One XLA compilation per (bucket dims, batch
size); both are coarsely quantized to keep the cache small.
"""

from __future__ import annotations

import functools
from collections import defaultdict
from typing import Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from ctts_tpu.config import CTTSConfig
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.parallel.mesh import batch_sharding, replicated
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.synth.device import (
    DeviceVoice,
    PlanDims,
    bucket_dims,
    build_core,
    build_device_plan,
)
from ctts_tpu.text.rules import NormalizationRules


@functools.lru_cache(maxsize=64)
def _compiled_batch_core(dims: PlanDims, ubuf: int):
    """Jitted vmapped core: batch axis on the plan arrays, bank shared."""
    core = build_core(dims, ubuf)
    return jax.jit(jax.vmap(core, in_axes=(None, None, None, 0)))


def _next_batch_size(n: int, multiple: int) -> int:
    b = multiple
    while b < n:
        b *= 2
    return b


class BatchSynthesizer:
    """High-throughput batched synthesis over an optional device mesh."""

    def __init__(
        self,
        db: VoiceDatabase,
        config: CTTSConfig,
        rules: Optional[NormalizationRules] = None,
        mesh=None,
        target_rms: float = 3000.0,
        dims_floor: Optional[dict] = None,
        pallas_compose: bool = False,
    ):
        self.db = db
        self.config = config
        self.rules = rules
        self.mesh = mesh
        self.dims_floor = dims_floor
        self.pallas_compose = pallas_compose
        self.voice = DeviceVoice(db, target_rms)
        if mesh is not None:
            bs = replicated(mesh)
            self.voice.bank = jax.device_put(self.voice.bank, bs)
            self.voice.lengths = jax.device_put(self.voice.lengths, bs)
            self.voice.gains = jax.device_put(self.voice.gains, bs)

    # -- plan side ---------------------------------------------------------

    def compile_plans(self, texts: Sequence[str], speed: float = 1.0):
        return [
            compile_plan(self.db, t, self.config, self.rules, speed)
            for t in texts
        ]

    # -- execution ---------------------------------------------------------

    def synthesize(self, texts: Sequence[str], speed: float = 1.0):
        """Synthesize a batch; returns list of int16 arrays (input order)."""
        plans = self.compile_plans(texts, speed)
        return self.execute(plans)

    def execute(self, plans):
        dplans = [build_device_plan(p, self.db) for p in plans]
        # Re-lower each into its bucket.
        buckets = defaultdict(list)
        import dataclasses

        for i, (p, dp) in enumerate(zip(plans, dplans)):
            bd = bucket_dims(dp.dims, self.dims_floor)
            bd = dataclasses.replace(bd, pallas_compose=self.pallas_compose)
            buckets[bd].append((i, p))

        results: list[Optional[np.ndarray]] = [None] * len(plans)
        for bd, items in buckets.items():
            outs = self._run_bucket(bd, items)
            for (i, _), out in zip(items, outs):
                results[i] = out
        return results

    def _run_bucket(self, dims: PlanDims, items):
        n = len(items)
        multiple = self.mesh.devices.size if self.mesh is not None else 1
        bsz = _next_batch_size(max(n, 1), multiple)

        stacked = None
        for slot, (_, plan) in enumerate(items):
            dp = build_device_plan(plan, self.db, dims)
            if stacked is None:
                stacked = {
                    k: np.zeros((bsz,) + np.asarray(v).shape,
                                np.asarray(v).dtype)
                    for k, v in dp.arrays.items()
                }
            for k, v in dp.arrays.items():
                stacked[k][slot] = v
        # Pad slots replicate the last plan (masked out on return).
        for slot in range(n, bsz):
            for k in stacked:
                stacked[k][slot] = stacked[k][n - 1]

        arrays = {k: jnp.asarray(v) for k, v in stacked.items()}
        if self.mesh is not None:
            sh = batch_sharding(self.mesh)
            arrays = {k: jax.device_put(v, sh) for k, v in arrays.items()}

        core = _compiled_batch_core(dims, self.voice.ubuf)
        out, out_lens = core(self.voice.bank, self.voice.lengths,
                             self.voice.gains, arrays)
        out = np.asarray(out)
        out_lens = np.asarray(out_lens)
        return [
            out[i, : int(out_lens[i])].astype(np.int16) for i in range(n)
        ]
