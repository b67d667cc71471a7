"""Batched, sharded synthesis: the TPU production path.

Sentences are compiled to plans on host, lowered to dense arrays, grouped
into buckets of identical static dimensions, stacked, and executed as a
vmapped jitted core — sharded over a 1-D device mesh on the batch axis
when a mesh is supplied. One XLA compilation per (bucket dims, batch
size); both are coarsely quantized to keep the cache small.
"""

from __future__ import annotations

import functools
import os
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
    derive_dims,
    fill_device_plan,
    walk_plan,
)
from ctts_tpu.text.rules import NormalizationRules


@functools.lru_cache(maxsize=64)
def _compiled_batch_core(dims: PlanDims, ubuf: int, packed: bool = False,
                         mesh=None, wire: bool = False):
    """Jitted vmapped core: batch axis on the plan arrays, bank shared.

    With `packed`, the valid prefix of every sentence is compacted into
    one flat int16 buffer on device (a short scan of window moves at
    cumsum offsets), so the host transfer is sum(out_len) samples instead
    of B·OMAX — the device→host tunnel runs at ~30 MB/s, and the unpacked
    transfer was 0.52 s/batch in the round-1 profile. Under a mesh the
    packing runs per shard via shard_map (each device compacts its own
    rows — no cross-device cumsum, no collectives) and the collector
    pulls only each shard's valid prefix.

    With `wire` (packed only), the packed buffer is further encoded on
    device with the lossless nibble-plane codec (ops/wire.py): ~0.66x
    the int16 bytes on speech, which moves the serving ceiling on a
    slow device→host link. The core then returns (wire_words, classes,
    out_len, ovf) and the host decodes with one native C pass on the
    drain thread. Under a mesh the codec runs per shard inside the
    shard_map body — it is block-local by construction (deltas, plane
    classes, and tile compaction never cross rows), so sharding adds no
    collectives and every chip's host link gets the same byte cut."""
    core = build_core(dims, ubuf)

    def with_shared(bank, lens, gains, arrays, shared):
        ar = dict(arrays)
        ar.update(shared)
        return core(bank, lens, gains, ar)

    # `shared` carries the batch-global distinct-value tables
    # (shared_plan_values) — unbatched, replicated under a mesh.
    vc = jax.vmap(with_shared, in_axes=(None, None, None, 0, None))
    if not packed:
        return jax.jit(vc)

    from jax import lax

    def run(bank, lens, gains, arrays, shared):
        out, out_len, ovf = vc(bank, lens, gains, arrays, shared)
        b_n, om = out.shape
        offs = jnp.concatenate(
            [jnp.zeros(1, jnp.int32), jnp.cumsum(out_len)[:-1]]
        )
        iw = jnp.arange(om)

        def place(p, b):
            cur = lax.dynamic_slice(p, (offs[b],), (om,))
            merged = jnp.where(iw < out_len[b], out[b], cur)
            return lax.dynamic_update_slice(p, merged, (offs[b],)), None

        from ctts_tpu.ops.device_ops import _vary

        p0 = _vary(jnp.zeros(b_n * om, jnp.int16))
        p, _ = lax.scan(place, p0, jnp.arange(b_n))
        if wire:
            from ctts_tpu.ops.wire import WIRE_BLOCK, encode_device

            pad = -p.shape[0] % WIRE_BLOCK
            if pad:
                p = jnp.concatenate([p, jnp.zeros(pad, jnp.int16)])
            ww, classes = encode_device(p)
            return ww, classes, out_len, jnp.sum(ovf)[None]
        return p, out_len, jnp.sum(ovf)[None]

    if mesh is None:
        return jax.jit(run)

    from jax.sharding import PartitionSpec as P

    from ctts_tpu.parallel.mesh import DATA_AXIS
    from ctts_tpu.synth.device import _compose_backend

    # The varying-manual-axes checker stays ON wherever it can run:
    # with the XLA lowerings (CPU — the always-run test suite) the
    # whole mesh core typechecks. The Mosaic (Pallas) kernels cannot
    # be vma-traced in jax 0.9: pallas_call strips vma from
    # kernel-internal avals incompletely, and a fori_loop whose bounds
    # load from a ref fails its carry typecheck with "pass
    # check_vma=False to jax.shard_map" as jax's own suggested
    # workaround. So the checker is disabled exactly when the compiled
    # core will contain Mosaic kernels; the mesh/no-mesh sample
    # equality is pinned on real hardware by bench.py's 1-device-mesh
    # section instead.
    check_vma = _compose_backend() != "pallas"

    def run_varying(bank, lens, gains, arrays, shared):
        # Cast the replicated inputs to device-varying up front (a
        # type-level no-op — no data moves, no collectives). The body
        # then computes on uniformly-varying values, so the
        # varying-manual-axes checker can stay ON: it would otherwise
        # reject the core's internal scans, whose carries mix
        # replicated-initialized state with varying row data.
        cast = lambda t: jax.tree.map(
            lambda x: lax.pcast(x, DATA_AXIS, to="varying"), t)
        return run(cast(bank), cast(lens), cast(gains), arrays,
                   cast(shared))

    n_out = 4 if wire else 3
    sm = jax.shard_map(
        run_varying if check_vma else run,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(DATA_AXIS), P()),
        out_specs=(P(DATA_AXIS),) * n_out,
        check_vma=check_vma,
    )
    return jax.jit(sm)


from contextlib import contextmanager


@contextmanager
def _no_persistent_cache():
    """Disable the persistent compilation cache for the enclosed calls.

    Serializing the large mesh (shard_map) synthesis executable on the
    CPU backend aborts inside XLA (put_executable_and_time — a CHECK,
    not an exception; trivial shard_map programs serialize fine), so
    mesh-core compiles must not be persisted.

    Clearing jax_compilation_cache_dir is NOT enough on its own: jax
    memoizes both the cache object (compilation_cache._cache) and the
    is_cache_used decision at first use, so once any compile in the
    process has touched the cache, later compiles still reach
    executable.serialize() — the crash point. The min-compile-time
    threshold IS read live in _cache_write before serialization, so
    raising it is the reliable kill switch; the dir clear still covers
    the wraps-the-first-compile case."""
    prev = jax.config.jax_compilation_cache_dir
    prev_min = jax.config.jax_persistent_cache_min_compile_time_secs
    try:
        jax.config.update("jax_compilation_cache_dir", None)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          1e18)
        yield
    finally:
        jax.config.update("jax_compilation_cache_dir", prev)
        jax.config.update("jax_persistent_cache_min_compile_time_secs",
                          prev_min)


def release_compiled() -> None:
    """Drop every compiled executable this process holds (the batch-core
    cache, the single-sentence core cache, and jax's live caches).

    XLA:CPU segfaults once too many large synthesis executables stay
    resident in one process — observed deterministically while compiling
    (or persisting) the 6th-or-so big bucket of a multi-speed corpus run;
    each bucket compiles fine in a fresh process. Long-lived multi-bucket
    processes (the golden acceptance suite, serving hosts that cycle many
    dims buckets on CPU) should call this between bucket groups; with a
    persistent compilation cache the re-warm is a fast deserialization,
    not a recompile."""
    import gc

    from ctts_tpu.synth.device import _compiled_core, build_core

    _compiled_batch_core.cache_clear()
    _compiled_core.cache_clear()
    build_core.cache_clear()
    jax.clear_caches()
    gc.collect()


def _next_batch_size(n: int, multiple: int) -> int:
    """Round up to a multiple of 8 (and of the mesh size). Power-of-two
    rounding padded a 72-row batch to 128 — 44% wasted compute; serving
    batch sizes recur, so one cached compile per size is the better
    trade (the persistent XLA cache holds them across runs)."""
    g = int(8 * multiple // np.gcd(8, multiple))  # lcm: mesh-divisible, x8
    return max(-(-n // g) * g, g)


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
        wire: Optional[bool] = None,
        native_plans: Optional[bool] = None,
    ):
        self.db = db
        self.config = config
        self.rules = rules
        self.mesh = mesh
        self.dims_floor = dims_floor
        # Native (C++) text→arrays lowering (plan/native_lower.py):
        # default ON when the lib builds; rule files are applied
        # natively (host regcomp via ctl_set_rules — a rejected pattern
        # falls back to the Python lowering at first use).
        # CTTS_NATIVE_PLANS=0/1 overrides.
        if native_plans is None:
            env = os.environ.get("CTTS_NATIVE_PLANS", "")
            native_plans = env == "1" if env in ("0", "1") else True
        self._native_plans = bool(native_plans)
        self._nl = None  # lazily-created NativeLowerer (False = failed)
        # Wire-codec D2H (ops/wire.py): default ON on real accelerators
        # (where the host link is the serving ceiling), with or without
        # a mesh — per-shard encode is collective-free and aggregate
        # D2H bytes are unchanged by sharding, so every chip's link
        # pays full price without it. OFF on CPU (no transfer to
        # save). CTTS_WIRE=0/1 overrides the auto choice.
        if wire is None:
            env = os.environ.get("CTTS_WIRE", "")
            if env in ("0", "1"):
                wire = env == "1"
            else:
                wire = jax.default_backend() != "cpu"
        self.wire = bool(wire)
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

    def synthesize(self, texts: Sequence[str], speed: float = 1.0,
                   split: bool = True):
        """Synthesize a batch; returns list of int16 arrays (input order).

        With `split` (default), long inputs are partitioned at sentence
        boundaries into independent batch rows sharing the standard
        bucket (byte-equal to the unsplit path — plan.split docstring);
        outputs are concatenated per input. Stretch plans never split.
        """
        prepared, spans = self._lower_batch(texts, speed, split)
        outs = self._drain(self._trim(self._enqueue(prepared)))
        return [
            outs[s] if e == s + 1 else np.concatenate(outs[s:e])
            for s, e in spans
        ]

    # -- host lowering -------------------------------------------------------

    def _get_native_lowerer(self):
        if self._nl is False or not self._native_plans:
            return None
        if self._nl is None:
            try:
                from ctts_tpu.plan.native_lower import NativeLowerer

                self._nl = NativeLowerer(self.db.path, self.config,
                                         self.rules)
            except Exception:
                self._nl = False
                return None
        return self._nl

    def _lower_batch(self, texts, speed: float, split: bool):
        """Host lowering of a text batch: (prepared, spans).

        Takes the native C++ path (plan/native_lower.py — the binding
        host term of the serving loop on 1-core hosts) when available;
        the Python pipeline otherwise. Both produce bit-identical
        arrays (tests/test_native_lower.py)."""
        nl = self._get_native_lowerer()
        if nl is not None:
            return self._prepare_native(nl, texts, speed, split)
        plans = self.compile_plans(texts, speed)
        if split:
            from ctts_tpu.plan.split import split_plan

            rows, spans = [], []
            for p in plans:
                r = split_plan(p, self.db)
                spans.append((len(rows), len(rows) + len(r)))
                rows.extend(r)
        else:
            rows = plans
            spans = [(i, i + 1) for i in range(len(plans))]
        return self._prepare(rows), spans

    def _prepare_native(self, nl, texts, speed: float, split: bool):
        """Native twin of compile+split+_prepare: rows are lowered and
        filled straight into the stacked arrays by libctts.so."""
        spans, dims_list, trips = nl.lower(texts, speed, split)
        buckets = defaultdict(list)
        for i, d in enumerate(dims_list):
            buckets[bucket_dims(d, self.dims_floor)].append(i)

        from ctts_tpu.synth.device import shared_plan_values

        multiple = self.mesh.devices.size if self.mesh is not None else 1
        thr = np.float32(self.config.silence_threshold)
        per_bucket = []
        for bd, idxs in buckets.items():
            n = len(idxs)
            bsz = _next_batch_size(max(n, 1), multiple)
            stacked = nl.alloc_stacked(bd, bsz)
            for slot, ri in enumerate(idxs):
                nl.fill_into(ri, bd, stacked, slot)
            stacked["threshold"][:] = thr
            stacked["speed"][:] = np.float32(speed)
            stacked["refine_trips"][:n] = [trips[ri] for ri in idxs]
            order = self._length_order(stacked, n)
            for k in stacked:
                stacked[k][:n] = stacked[k][order]
            idxs = [idxs[int(p)] for p in order]
            for k in stacked:  # pad slots replicate the last row
                stacked[k][n:] = stacked[k][n - 1]
            shared = shared_plan_values(stacked, self.voice.lengths, bd)
            per_bucket.append(
                (bd, [(ri, None) for ri in idxs], (n, stacked, shared),
                 True))
        return (len(dims_list), per_bucket), spans

    def execute(self, plans):
        return self._collect(self._dispatch(plans))

    def stream(self, text_batches, speed: float = 1.0, split: bool = True):
        """Pipelined synthesis over an iterable of text batches.

        Per-batch phase order is chosen so every expensive term overlaps
        device compute (tools/microbench_overlap.py, real v5e-1):

          1. host-prep batch N+1 (plan walk + array stacking) — overlaps
             batch N's device compute;
          2. trim batch N: sync its tiny `out_lens`, then enqueue the
             valid-prefix slice. Device programs are FIFO-serial, so the
             sync costs no device time — and the slice MUST be enqueued
             *before* batch N+1's core, or it queues behind ~0.1 s of
             compute and serializes the drain (the round-2 "transfers
             don't overlap" finding was exactly this ordering artifact);
          3. enqueue batch N+1's core (behind the trim);
          4. submit batch N's drain to a background worker — a
             materialized array's D2H proceeds concurrently with an
             independent compute program (measured max(A,B), not A+B),
             and draining off-thread keeps the main thread free to prep
             and dispatch batch N+2 during the ~0.25 s transfer, so the
             steady-state period is max(transfer, compute + host prep)
             rather than their sum.

        Yields one list of int16 arrays per input batch, in input order.
        """
        from concurrent.futures import ThreadPoolExecutor

        prev = None      # dispatched-but-untrimmed batch N
        pending = None   # drain future for batch N-1
        pool = ThreadPoolExecutor(max_workers=1)
        try:
            for texts in text_batches:
                prepped, spans = self._lower_batch(texts, speed, split)
                if prev is not None:
                    trimmed, pspans = self._trim(prev[0]), prev[1]
                handles = self._enqueue(prepped)
                if prev is not None:
                    fut = pool.submit(self._finish_stream, trimmed, pspans)
                    if pending is not None:
                        yield pending.result()
                    pending = fut
                prev = (handles, spans)
            if prev is not None:
                trimmed, pspans = self._trim(prev[0]), prev[1]
                if pending is not None:
                    yield pending.result()
                yield self._finish_stream(trimmed, pspans)
            elif pending is not None:
                yield pending.result()
        finally:
            pool.shutdown(wait=True)

    def _finish_stream(self, trimmed, spans):
        outs = self._drain(trimmed)
        return [
            outs[s] if e == s + 1 else np.concatenate(outs[s:e])
            for s, e in spans
        ]

    def _dispatch(self, plans, pack: bool = True):
        """Bucket + lower + enqueue device work (async); returns handles."""
        return self._enqueue(self._prepare(plans, pack))

    def _collect(self, dispatched):
        return self._drain(self._trim(dispatched))

    def _prepare(self, plans, pack: bool = True):
        """Host-only lowering: walk plans, bucket, stack numpy arrays.

        Split from _enqueue so the serving loop can do this heavy host
        work while the previous batch still computes on device."""
        walked = [walk_plan(p, self.db) for p in plans]
        buckets = defaultdict(list)
        for i, w in enumerate(walked):
            bd = bucket_dims(derive_dims(w, self.db), self.dims_floor)
            buckets[bd].append((i, w))
        per_bucket = []
        for bd, items in buckets.items():
            items, prep = self._prep_bucket(bd, items)
            per_bucket.append((bd, items, prep, pack))
        return len(plans), per_bucket

    def _enqueue(self, prepared):
        n_plans, per_bucket = prepared
        return (
            n_plans,
            [(bd, items, self._enqueue_bucket(bd, prep, pack))
             for bd, items, prep, pack in per_bucket],
        )

    def _trim(self, dispatched):
        n_plans, per_bucket = dispatched
        return (
            n_plans,
            [(items, self._trim_bucket(handle))
             for bd, items, handle in per_bucket],
        )

    def _drain(self, trimmed):
        n_plans, per_bucket = trimmed
        results: list[Optional[np.ndarray]] = [None] * n_plans
        for items, tr in per_bucket:
            outs = self._drain_bucket(tr)
            for (i, _), out in zip(items, outs):
                results[i] = out
        return results

    @staticmethod
    def _length_order(stacked, n):
        """Descending per-row output-length order (stable).

        Rows are grouped S-consecutive per WSOLA lockstep program
        (ops/pallas/wsola.py _make_batch_kernel), and each group runs
        to its LONGEST member's frame count — unsorted serving batches
        measured ~25% masked lockstep waste. Sorting is pure host-side
        slot renumbering: rows are independent under vmap and every
        output is mapped back by item index, so bits are unchanged.
        Descending, so the replicated pad rows clone the SHORTEST row."""
        key = (stacked["region_len"][:n].sum(axis=1)
               + stacked["region_pause"][:n].sum(axis=1))
        return np.argsort(-key, kind="stable")

    def _prep_bucket(self, dims: PlanDims, items):
        n = len(items)
        multiple = self.mesh.devices.size if self.mesh is not None else 1
        bsz = _next_batch_size(max(n, 1), multiple)

        stacked = None
        for slot, (_, w) in enumerate(items):
            dp = fill_device_plan(w, self.db, dims)
            if stacked is None:
                stacked = {
                    k: np.zeros((bsz,) + np.asarray(v).shape,
                                np.asarray(v).dtype)
                    for k, v in dp.arrays.items()
                }
            for k, v in dp.arrays.items():
                stacked[k][slot] = v
        order = self._length_order(stacked, n)
        for k in stacked:
            stacked[k][:n] = stacked[k][order]
        items = [items[int(p)] for p in order]
        # Pad slots replicate the last plan (masked out on return).
        for slot in range(n, bsz):
            for k in stacked:
                stacked[k][slot] = stacked[k][n - 1]

        from ctts_tpu.synth.device import shared_plan_values

        shared = shared_plan_values(stacked, self.voice.lengths, dims)
        return items, (n, stacked, shared)

    def _enqueue_bucket(self, dims: PlanDims, prep, pack: bool = True):
        n, stacked, shared_np = prep
        arrays = {k: jnp.asarray(v) for k, v in stacked.items()}
        shared = {k: jnp.asarray(v) for k, v in shared_np.items()}
        if self.mesh is not None:
            sh = batch_sharding(self.mesh)
            arrays = {k: jax.device_put(v, sh) for k, v in arrays.items()}
            rep = replicated(self.mesh)
            shared = {k: jax.device_put(v, rep) for k, v in shared.items()}

        wire = self.wire and pack
        core = _compiled_batch_core(dims, self.voice.ubuf, pack, self.mesh,
                                    wire)
        # The persistent-cache workaround is an XLA:CPU serialization
        # crash (see _no_persistent_cache); scoping it to the CPU
        # backend keeps real-TPU mesh serving from recompiling its
        # cores in every fresh process.
        from contextlib import nullcontext

        ctx = (_no_persistent_cache()
               if self.mesh is not None and jax.default_backend() == "cpu"
               else nullcontext())
        with ctx:
            res = core(self.voice.bank, self.voice.lengths,
                       self.voice.gains, arrays, shared)
        if wire:
            ww, classes, out_lens, ovf = res
            return n, "wire", (ww, classes), out_lens, ovf
        out, out_lens, ovf = res
        return n, pack, out, out_lens, ovf

    # Valid-prefix trim lengths round up to this grain so the number of
    # distinct tiny slice programs stays bounded (one compile per grain
    # step instead of one per batch total); the over-read tail is ≤128 KB
    # (~3 ms on the tunnel) and is never handed out (per-row ends bound).
    _TRIM_GRAIN = 65536

    def _trim_bucket(self, handle):
        """Sync the tiny per-row lengths, then ENQUEUE the valid-prefix
        slice of the packed buffer. Called before the next batch's core
        is enqueued: device programs execute FIFO, so a slice queued here
        runs as soon as this batch's core finishes, and its result can
        then transfer concurrently with the next core's compute
        (tools/microbench_overlap.py variant E). Queued after the next
        core instead, the same slice waits out that compute and the
        drain serializes.

        The out_lens sync here looks like a stall but is NOT worth
        speculating away (measured, real v5e-1, interleaved A/B): the
        tunnel serializes ALL transfers, so at steady state this wait
        rides the same link the previous batch's chunk pulls occupy —
        the loop period already sits at max(link time, compute).
        Guessing the slice length from the bucket's last batch and
        resolving out_lens later measured 873x e2e with the resolve on
        the drain thread (delays every chunk pull queued behind it)
        and 638-1000x with it on the main thread after the next core's
        enqueue (contends with in-flight chunk pulls), vs 1015-1133x
        for this synchronous order."""
        n, packed, out, out_lens, ovf = handle
        # ONE round trip for all the tiny scalars: device_get issues
        # copy_to_host_async on every leaf before converting, so the
        # lens/classes/ovf pulls overlap — each separate np.asarray
        # would cost a full ~25 ms tunnel round trip.
        classes = None
        if packed == "wire":
            out_lens, classes, ovf = jax.device_get(
                [out_lens, out[1], ovf])
        else:
            out_lens, ovf = jax.device_get([out_lens, ovf])
        n_ovf = int(ovf.sum())
        if n_ovf > 0:
            import sys

            print(f"ctts_tpu: {n_ovf} region(s) exceeded the silence "
                  "segment table; remainder kept uncompacted",
                  file=sys.stderr)
        if packed == "wire" and self.mesh is not None:
            return ("wire_sharded", n,
                    *self._trim_wire_sharded(out[0], out_lens, classes))
        if packed == "wire":
            from ctts_tpu.ops.wire import wire_valid_words

            ww = out[0]
            ends = np.cumsum(out_lens)
            need = wire_valid_words(classes, int(ends[-1]))
            g = self._TRIM_GRAIN // 2  # int32 words; same 128 KB grain
            bufn = int(ww.shape[0])
            k = min(bufn, -(-need // g) * g)
            if k >= 2 * g:
                s = ((k + 1) // 2 + g - 1) // g * g
                chunks = [ww[:s], ww[s:min(2 * s, bufn)]]
            else:
                chunks = [ww[:k]]
            return ("wire", n, chunks, (ends, classes))
        if packed and self.mesh is not None:
            return ("sharded", n, self._trim_packed_sharded(out, out_lens),
                    out_lens)
        if packed:
            ends = np.cumsum(out_lens)
            g = self._TRIM_GRAIN
            bufn = int(out.shape[0])
            k = min(bufn, -(-int(ends[-1]) // g) * g)
            # Two equal-shaped chunks when the prefix is big enough: two
            # concurrent host pulls aggregate ~1.2x one stream's D2H
            # bandwidth on the tunnel (tools/microbench_d2h.py — flat
            # beyond 2 streams). Equal chunk sizes keep the compile key
            # one-dimensional (s alone, not (s, k) pairs).
            if k >= 2 * g:
                s = ((k + 1) // 2 + g - 1) // g * g  # grain-ceil(k/2)
                chunks = [out[:s], out[s:min(2 * s, bufn)]]
            else:
                chunks = [out[:k]]
            return ("packed", n, chunks, ends)
        return ("unpacked", n, out, out_lens)

    @staticmethod
    def _pull_chunks(payload):
        """Device→host copy of the trim's chunk list. Concurrent pulls
        (threads release the GIL during the copy) aggregate ~1.2x one
        stream's D2H bandwidth on the tunnel."""
        if len(payload) == 1:
            return np.asarray(payload[0])
        import threading

        hosts: list = [None] * len(payload)

        def pull(i, c):
            hosts[i] = np.asarray(c)

        ts = [threading.Thread(target=pull, args=(i, c))
              for i, c in enumerate(payload)]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        return np.concatenate(hosts)

    def _drain_bucket(self, trimmed):
        kind, n, payload, meta = trimmed
        if kind == "sharded":
            return self._drain_packed_sharded(n, payload, meta)
        if kind == "wire_sharded":
            from ctts_tpu.ops.wire import decode_host

            results = []
            for part, (lens_d, cls_d, tot_d) in zip(payload, meta):
                flat = decode_host(np.asarray(part), cls_d, tot_d)
                ends = np.cumsum(lens_d)
                for j in range(len(lens_d)):
                    if len(results) == n:
                        return results
                    results.append(
                        flat[int(ends[j] - lens_d[j]): int(ends[j])])
            return results
        if kind == "wire":
            from ctts_tpu.ops.wire import decode_host

            ends, classes = meta
            flat = decode_host(self._pull_chunks(payload), classes,
                               int(ends[-1]))
            return [
                flat[int(ends[i - 1]) if i else 0: int(ends[i])]
                for i in range(n)
            ]
        if kind == "packed":
            ends = meta
            flat = self._pull_chunks(payload)  # transfer valid prefix
            return [
                flat[int(ends[i - 1]) if i else 0: int(ends[i])]
                for i in range(n)
            ]
        out_lens = meta
        out = np.asarray(payload)
        return [
            out[i, : int(out_lens[i])].astype(np.int16) for i in range(n)
        ]

    def _trim_wire_sharded(self, ww, out_lens, classes):
        """Per-shard wire trim: each device's shard of the wire stream
        holds that shard's independently-encoded blocks (the codec is
        block-local; the shard_map body encodes its own rows), so the
        valid prefix is computable per shard from its classes slice.
        Slice lengths round up to the trim grain so distinct tiny slice
        programs stay bounded, as in the unsharded path."""
        from ctts_tpu.ops.wire import wire_valid_words

        ndev = self.mesh.devices.size
        bsz = out_lens.shape[0]
        rows_per = bsz // ndev
        nblk_s = classes.shape[0] // ndev
        g = self._TRIM_GRAIN // 2  # int32 words; same 128 KB grain
        parts: list = [None] * ndev
        metas: list = [None] * ndev
        for shard in ww.addressable_shards:
            cap = shard.data.shape[0]
            d = (shard.index[0].start or 0) // cap
            lens_d = out_lens[d * rows_per:(d + 1) * rows_per]
            tot_d = int(lens_d.sum())
            cls_d = classes[d * nblk_s:(d + 1) * nblk_s]
            need = wire_valid_words(cls_d, tot_d)
            k = min(cap, -(-need // g) * g)
            parts[d] = shard.data[:k]
            metas[d] = (lens_d, cls_d, tot_d)
        return parts, metas

    def _trim_packed_sharded(self, out, out_lens):
        """Enqueue each device shard's valid-prefix slice of the per-shard
        packed buffer; rows are block-partitioned in input order by the
        batch sharding, so concatenating shard extractions (in _drain)
        preserves order."""
        bsz = out_lens.shape[0]
        ndev = self.mesh.devices.size
        rows_per = bsz // ndev
        om = out.shape[0] // bsz
        parts: list = [None] * ndev
        for shard in out.addressable_shards:
            start = shard.index[0].start or 0
            d = start // (rows_per * om)
            lens_d = out_lens[d * rows_per:(d + 1) * rows_per]
            tot = int(lens_d.sum())
            parts[d] = shard.data[:tot] if tot else np.zeros(0, np.int16)
        return parts

    def _drain_packed_sharded(self, n, parts, out_lens):
        ndev = self.mesh.devices.size
        rows_per = out_lens.shape[0] // ndev
        results = []
        for d in range(ndev):
            lens_d = out_lens[d * rows_per:(d + 1) * rows_per]
            ends = np.cumsum(lens_d)
            flat = np.asarray(parts[d])
            for j in range(rows_per):
                if len(results) == n:
                    return results
                results.append(
                    flat[int(ends[j] - lens_d[j]): int(ends[j])])
        return results
