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
                            speed: float = 1.0):
    """Synthesize `texts` across all processes; returns the full list of
    int16 arrays on every process (input order).

    `batcher` is a BatchSynthesizer built over the LOCAL mesh (or None
    mesh for single-device hosts). Outputs are exchanged over DCN with a
    fixed-width int32 all-gather (lengths) + padded int16 all-gather
    (samples) via jax.experimental.multihost_utils.
    """
    import jax
    from jax.experimental import multihost_utils

    nproc = jax.process_count()
    pid = jax.process_index()
    mine = local_slice(len(texts), nproc, pid)

    outs = batcher.synthesize([texts[i] for i in mine], speed=speed)

    # Fixed-width exchange: every process contributes the same-shaped
    # buffers (all-gather needs static shapes).
    max_per_proc = (len(texts) + nproc - 1) // nproc
    width = 1
    for o in outs:
        width = max(width, int(o.shape[0]))
    width = int(
        multihost_utils.process_allgather(np.asarray([width])).max()
    )

    lens = np.zeros(max_per_proc, np.int32)
    buf = np.zeros((max_per_proc, width), np.int16)
    for j, o in enumerate(outs):
        lens[j] = o.shape[0]
        buf[j, : o.shape[0]] = o

    all_lens = multihost_utils.process_allgather(lens)    # [P, max_per]
    all_buf = multihost_utils.process_allgather(buf)      # [P, max_per, W]

    results = [None] * len(texts)
    for p in range(nproc):
        sl = local_slice(len(texts), nproc, p)
        for j, i in enumerate(sl):
            results[i] = all_buf[p, j, : int(all_lens[p, j])]
    return results
