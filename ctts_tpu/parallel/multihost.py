"""Multi-host (DCN) batch dispatch.

Production story (SURVEY.md §5.8): synthesis is embarrassingly parallel
over sentences, so multi-host scaling is plain data dispatch — each host
plans and executes its slice of the corpus on its local chips over ICI;
the only cross-host (DCN) communication is the final all-gather of
output lengths/bytes for whoever writes the WAVs. There is no gradient
or activation traffic to overlap, so DCN bandwidth is irrelevant to the
hot path (compare the reference: single-threaded, single-process —
ctts.c has no parallelism at all; this module is a design addition).

`initialize()` wraps jax.distributed for the coordinator handshake;
`synthesize_across_hosts()` round-robins texts across processes,
synthesizes the local slice with the local mesh, and all-gathers the
per-sentence outputs so every process returns the full corpus (callers
that only need the local shard can skip the gather).

Tested on CPU via two spawned processes (tests/test_multihost.py) —
the same code path a real multi-host TPU pod would take.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: Optional[int] = None) -> None:
    """Join the jax.distributed coordination service (DCN control plane).

    CAVEAT: must run before the XLA backend initializes. Importing
    ctts_tpu builds device LUT constants (ops/luts.py), which initializes
    the backend — so call jax.distributed.initialize() (or this, imported
    via `importlib` without the package parent) BEFORE importing
    ctts_tpu. tests/test_multihost.py shows the ordering."""
    import jax

    kw = {}
    if local_device_count is not None:
        kw["num_local_devices"] = local_device_count
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=num_processes,
        process_id=process_id,
        **kw,
    )


def local_slice(n_items: int, num_processes: int, process_id: int) -> range:
    """Contiguous block partition of [0, n_items) for this process."""
    base = n_items // num_processes
    extra = n_items % num_processes
    start = process_id * base + min(process_id, extra)
    return range(start, start + base + (1 if process_id < extra else 0))


def synthesize_across_hosts(batcher, texts: Sequence[str],
                            speed: float = 1.0,
                            return_local: bool = False):
    """Synthesize `texts` across all processes.

    `batcher` is a BatchSynthesizer built over the LOCAL mesh (or None
    mesh for single-device hosts). By default the per-sentence outputs
    are exchanged over DCN so every process returns the full corpus
    (input order). With `return_local=True` the gather is skipped
    entirely — returns `(indices, outputs)` for this process's slice,
    zero cross-host traffic — for callers that write their own shard
    (e.g. per-host WAV writers).

    The exchange packs each process's outputs into one flat int16 buffer
    (concatenated valid samples, no per-sentence padding) padded only to
    the largest *process total*, so with the balanced block partition the
    all-gather moves O(total audio) bytes — not O(processes × global max
    sentence) as a per-sentence padded gather would.
    """
    import jax
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    pid = jax.process_index()
    mine = local_slice(len(texts), nproc, pid)

    outs = batcher.synthesize([texts[i] for i in mine], speed=speed)
    if return_local:
        return list(mine), outs

    # Meta round: per-process sentence count + flat sample total (tiny).
    n_local = len(outs)
    total_local = int(sum(int(o.shape[0]) for o in outs))
    meta = multihost_utils.process_allgather(
        np.asarray([n_local, total_local], np.int64))       # [P, 2]
    max_count = int(meta[:, 0].max())
    max_total = int(meta[:, 1].max())

    lens = np.zeros(max_count, np.int32)
    flat = np.zeros(max(max_total, 1), np.int16)
    off = 0
    for j, o in enumerate(outs):
        lens[j] = o.shape[0]
        flat[off: off + o.shape[0]] = o
        off += o.shape[0]

    all_lens = multihost_utils.process_allgather(lens)      # [P, max_count]
    all_flat = multihost_utils.process_allgather(flat)      # [P, max_total]

    results = [None] * len(texts)
    for p in range(nproc):
        sl = local_slice(len(texts), nproc, p)
        off = 0
        for j, i in enumerate(sl):
            ln = int(all_lens[p, j])
            results[i] = all_flat[p, off: off + ln]
            off += ln
    return results
