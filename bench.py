"""Benchmark: aggregate synthesis throughput on the available device(s).

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "...", "vs_baseline": N, ...}

Headline metric: audio-seconds synthesized per wall-second per chip
(real-time factor, end-to-end: text → plan → device → int16). The
reference publishes no numbers (BASELINE.md); `vs_baseline` compares
against the C binary's single-core RTF measured on this host when the
reference tree and gcc are available, else 0.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import tempfile
import time

import numpy as np

SAMPLE_RATE = 22050

TEXTS = [
    "como vai?",
    "que legal!",
    "eu quero café, pão, e manteiga",
    "bom dia. como vai. tudo bem.",
    "eu tenho 5 livros",
    "são 42 pessoas",
    "a rosa é vermelha",
    "minha casa é grande",
    "o rato roeu a roupa do rei de roma",
    "vamos para a praia",
    "o brasil é um país muito bonito",
    "quando chegar em casa, me liga",
    "preciso comprar coisas para casa",
    "hoje de manhã eu acordei cedo e fui trabalhar",
    "isso é incrível!",
    "onde fica o banco?",
]


def build_db(root: str) -> str:
    from ctts_tpu.db.builder import build_database
    from ctts_tpu.db.dataset import generate_dataset

    ds = os.path.join(root, "dataset")
    generate_dataset(ds)
    dbp = os.path.join(root, "voice.db")
    build_database(
        os.path.join(ds, "letters", "wavs"),
        os.path.join(ds, "letters", "letters.txt"),
        os.path.join(ds, "syllables", "wavs"),
        os.path.join(ds, "syllables", "sillabes.txt"),
        dbp,
        verbose=False,
    )
    return dbp


def compile_c_reference(root: str) -> str | None:
    """Compile the reference C binary once, up front (compile time must
    stay out of the measurement window). None if unavailable."""
    ref = "/root/reference/ctts.c"
    if not os.path.exists(ref) or shutil.which("gcc") is None:
        return None
    binpath = os.path.join(root, "ctts_ref")
    try:
        subprocess.run(
            ["gcc", "-O3", "-std=c99", "-o", binpath, ref, "-lm"],
            check=True, capture_output=True, timeout=120,
        )
    except Exception:
        return None
    return binpath


def c_reference_pass(binpath: str, root: str, dbp: str) -> float:
    """One full corpus pass of the C binary; its single-pass RTF.

    The C binary swings ~3x run-to-run on this shared host (292-960x
    observed), so vs_baseline is computed from passes INTERLEAVED with
    the JAX stream blocks — same link/host weather on both sides —
    with the median taken per side (VERDICT r4 weak #5)."""
    total_audio = 0.0
    t0 = time.perf_counter()
    for i, text in enumerate(TEXTS):
        out = os.path.join(root, f"ref_{i}.wav")
        r = subprocess.run(
            [binpath, "synth", dbp, text, out, "1.0"],
            capture_output=True, cwd=root, timeout=120,
        )
        if r.returncode != 0:
            return 0.0
        total_audio += (os.path.getsize(out) - 44) / 2 / SAMPLE_RATE
    dt = time.perf_counter() - t0
    return total_audio / dt if dt > 0 else 0.0


def warm_oom_halving(run, texts, floor):
    """Run a warmup callable over `texts`; on device OOM halve the batch
    and retry, down to `floor` sentences. Returns the surviving batch.

    Every timed section dispatches its own bucket/compile (stretch is a
    different bucket from speed-1.0; mixed chunks differ again), so the
    speed-1.0 warmup surviving does not prove the others fit — each
    section's warm pass goes through this guard."""
    while True:
        try:
            run(texts)
            return texts
        except Exception as e:
            if "memory" not in str(e).lower() or len(texts) <= floor:
                raise
            texts = texts[: max(len(texts) // 2, floor)]


def probe_backend(timeout_s: float) -> tuple[str, int] | None:
    """Probe jax backend init in a subprocess (axon init can HANG, not
    just fail — BENCH_r03 died on this; VERDICT r3 item 2). Returns
    (backend, n_devices) or None."""
    if os.environ.get("JAX_PLATFORMS", "") == "cpu":
        # The axon sitecustomize sets jax_platforms via config.update,
        # which overrides the env var — force it back (same dance as
        # tests/conftest.py) or the dead-tunnel init hangs even here.
        code = (
            "import jax, sys;"
            "jax.config.update('jax_platforms', 'cpu');"
            "from jax._src import xla_bridge;"
            "xla_bridge._clear_backends();"
            "d = jax.devices();"
            "sys.stdout.write(jax.default_backend() + ' ' + str(len(d)))"
        )
    else:
        code = (
            "import jax, sys;"
            "d = jax.devices();"
            "sys.stdout.write(jax.default_backend() + ' ' + str(len(d)))"
        )
    try:
        r = subprocess.run(
            [sys.executable, "-c", code],
            capture_output=True, timeout=timeout_s, text=True,
        )
        if r.returncode == 0 and r.stdout.strip():
            backend, n = r.stdout.split()
            return backend, int(n)
    except Exception:
        pass
    return None


def resolve_backend() -> tuple[str, str]:
    """Wait (bounded) for the configured backend; fall back to CPU.

    Returns (backend_label, error) where error is "" on a healthy
    probe. On fallback, forces JAX_PLATFORMS=cpu for this process so
    the hung axon plugin is never initialized in-process.
    """
    tries = int(os.environ.get("CTTS_BENCH_PROBE_TRIES", "3"))
    timeout_s = float(os.environ.get("CTTS_BENCH_PROBE_TIMEOUT", "120"))
    backoff_s = float(os.environ.get("CTTS_BENCH_PROBE_BACKOFF", "60"))
    for attempt in range(tries):
        got = probe_backend(timeout_s)
        if got is not None:
            return got[0], ""
        print(
            f"bench: backend probe {attempt + 1}/{tries} failed "
            f"(JAX_PLATFORMS={os.environ.get('JAX_PLATFORMS', '')!r})",
            file=sys.stderr,
        )
        if attempt + 1 < tries:
            time.sleep(backoff_s)
    os.environ["JAX_PLATFORMS"] = "cpu"
    err = (
        "configured backend unavailable after "
        f"{tries} probes x {timeout_s:.0f}s; CPU fallback"
    )
    got = probe_backend(timeout_s)
    if got is None:  # even CPU will not come up — report and bail
        return "none", err + "; CPU probe also failed"
    return "cpu-fallback", err


def main() -> None:
    backend, backend_error = resolve_backend()
    if backend == "none":
        print(json.dumps({
            "metric": "audio_seconds_per_second_per_chip",
            "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
            "backend": backend, "error": backend_error,
        }))
        return
    if backend == "cpu-fallback":
        # Bounded CPU run: one small batch, no long configs — a labeled
        # liveness artifact, never conflated with a TPU measurement.
        os.environ.setdefault("CTTS_BENCH_BATCH_MULT", "1")
        # 4 iters: with 2 the median degenerates to the mean of one
        # cold and one pipeline-inflated rate.
        os.environ.setdefault("CTTS_BENCH_ITERS", "4")
        os.environ.setdefault("CTTS_BENCH_PARAGRAPH", "0")
        os.environ.setdefault("CTTS_BENCH_1024", "0")
        os.environ.setdefault("CTTS_BENCH_COMPUTE_PIPELINE", "1")

    import jax

    if backend.startswith("cpu"):
        # See probe_backend: env JAX_PLATFORMS alone does not undo the
        # sitecustomize's config.update — force CPU in-process too.
        # Applies to the healthy "cpu" probe as well: without this, a
        # JAX_PLATFORMS=cpu bench under the axon sitecustomize probes
        # cpu in the subprocess but silently initializes the TPU in the
        # main process and mislabels every number.
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge as _xb

        _xb._clear_backends()

    # Persistent compilation cache across bench runs/rounds.
    cache_dir = os.environ.get("CTTS_JAX_CACHE", "/tmp/ctts_jax_cache")
    try:
        os.makedirs(cache_dir, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

    from ctts_tpu.config import config_defaults
    from ctts_tpu.parallel.batch import BatchSynthesizer
    from ctts_tpu.parallel.mesh import make_mesh
    from ctts_tpu.db.reader import VoiceDatabase

    root = tempfile.mkdtemp(prefix="ctts_bench_")
    dbp = build_db(root)
    db = VoiceDatabase(dbp)

    n_chips = len(jax.devices())
    mesh = make_mesh() if n_chips > 1 else None

    config = config_defaults()
    # One dims bucket for the whole corpus → a single XLA compilation.
    floor = {"U": 32, "R": 16, "FD": 8, "WREG": 32768, "SMAX": 114688,
             "CONTW": 28672, "WIN": 2048, "CFMAX": 1024}
    bs = BatchSynthesizer(db, config, mesh=mesh, dims_floor=floor)

    # Batch 128 (mult 8): the serving period is compute-bound and the
    # per-batch fixed terms (tunnel RTT sync ~24 ms + host dispatch)
    # amortize with batch size — measured 1152x vs 1048x e2e in the same
    # window (tools/microbench_stream_phases.py mult 8 vs 4, v5e-1).
    # Fits the v5e's 16 GB HBM with the compact contour workspace;
    # halve on OOM for robustness.
    batch_mult = int(os.environ.get("CTTS_BENCH_BATCH_MULT", "8"))
    while batch_mult >= 1:
        texts = TEXTS * batch_mult
        try:
            # Warmup through stream (the timed path): compiles the
            # UNPACKED core the pipelined loop runs — warming up via
            # synthesize() would compile the packed core instead and
            # leave the stream compile inside the timed region.
            for _ in bs.stream([texts]):
                pass
            break
        except Exception as e:
            if "memory" not in str(e).lower() or batch_mult == 1:
                raise
            batch_mult //= 2

    # Steady-state measurement through the pipelined serving loop
    # (device compute of batch N+1 overlaps batch N's device→host
    # drain), INTERLEAVED with C-binary corpus passes in the same
    # window: both sides swing with shared-host/tunnel weather (the C
    # binary alone spans 292-960x across runs), so the ratio is only
    # meaningful when both are sampled under the same conditions.
    # Per-iteration rates with the MEDIAN reported; the first yield of
    # each stream block is dropped (pipeline fill, not steady state).
    iters = int(os.environ.get("CTTS_BENCH_ITERS", "6"))
    c_bin = compile_c_reference(root)
    reps = 3 if c_bin else 1
    per_rep = max(iters // reps, 2)
    rates = []
    c_rtfs = []
    for _ in range(reps):
        block = []
        t0 = time.perf_counter()
        for outs in bs.stream(texts for _ in range(per_rep + 1)):
            t1 = time.perf_counter()
            block.append(
                sum(o.shape[0] for o in outs) / SAMPLE_RATE / (t1 - t0))
            t0 = t1
        rates.extend(block[1:])
        if c_bin:
            c_rtfs.append(c_reference_pass(c_bin, root, dbp))
    rtf = float(np.median(rates))
    rtf_per_chip = rtf / max(n_chips, 1)
    c_rtf = float(np.median(c_rtfs)) if c_rtfs else 0.0
    vs_baseline = rtf / c_rtf if c_rtf > 0 else 0.0
    # `outs` (the last stream batch) feeds the parity check below.

    # Device-compute-only rate (secondary): syncs on the 4-byte
    # out_lens transfer instead of draining audio, so it excludes the
    # tunnel's device→host bandwidth (20-40 MB/s here, ±40% between
    # runs; production PCIe is ~100x it). K batches are dispatched
    # back-to-back with ONE sync at the end: a null program costs
    # ~29 ms on this tunnel (pure dispatch+sync round-trip) while 8
    # pipelined calls share one round-trip, so per-batch sync would
    # misattribute the transport latency to compute. Host planning/
    # lowering overlaps device execution exactly as in the serving
    # loop, so the rate is the true pipeline capacity.
    from ctts_tpu.plan.split import split_plan

    rows = []
    for pl in bs.compile_plans(texts, 1.0):
        rows.extend(split_plan(pl, db))  # same rows/compile as stream
    K = int(os.environ.get("CTTS_BENCH_COMPUTE_PIPELINE", "4"))
    c_rates = []
    for _ in range(3):
        t0 = time.perf_counter()
        all_handles = [bs._dispatch(rows) for _ in range(K)]
        audio = 0.0
        for handles in all_handles:
            for _, items, h in handles[1]:
                lens = np.asarray(h[3])
                audio += float(lens[: h[0]].sum()) / SAMPLE_RATE
        c_rates.append(audio / (time.perf_counter() - t0))
    compute_rtf = float(np.median(c_rates)) / max(n_chips, 1)

    # Transport diagnostic: timed D2H drain of the last dispatch's packed
    # output. The tunnel's bandwidth swings 13-40 MB/s between runs and
    # caps every end-to-end figure; recording it makes a low headline
    # attributable (compute vs transport) from the JSON alone.
    tb0 = time.perf_counter()
    drained = 0
    for _, items, h in all_handles[-1][1]:
        bufs = h[2] if isinstance(h[2], tuple) else (h[2],)
        for b in bufs:  # wire handles carry (words, classes)
            drained += np.asarray(b).nbytes
    transfer_mbps = drained / (time.perf_counter() - tb0) / 1e6

    # Sharded-program measurement on the real chip via a 1-device mesh
    # (VERDICT r4 weak #1). The shard_map serving core is a DIFFERENT
    # XLA program from the unsharded core (pcast casts, per-shard
    # pack + wire encode, per-shard trim/collect); "8 chips ⇒ N×8" is
    # only evidence once the mesh program's per-chip compute and e2e
    # are measured on hardware and match the unsharded numbers. The
    # mesh is collective-free by construction (parallel/mesh.py), so a
    # 1-device mesh runs the identical per-chip program an 8-chip mesh
    # would, minus ICI neighbors.
    mesh_rtf = 0.0
    mesh_compute_rtf = 0.0
    mesh_matches = None
    mesh_error = ""
    want_mesh = os.environ.get(
        "CTTS_BENCH_MESH",
        "1" if (backend == "tpu" and n_chips == 1) else "0") == "1"
    # Guarded: a mesh-only failure (fresh compile path, different XLA
    # program) must degrade to mesh_error, never zero the whole bench.
    if want_mesh:
      try:
        from ctts_tpu.parallel.mesh import make_mesh as _mk

        bs_m = BatchSynthesizer(db, config, mesh=_mk(jax.devices()[:1]),
                                dims_floor=floor)
        m_texts = warm_oom_halving(
            lambda t: [None for _ in bs_m.stream([t])], texts, len(TEXTS))
        m_iters = max(iters // 2, 3)
        m_rates = []
        m_outs = None
        t0 = time.perf_counter()
        for m_outs in bs_m.stream(m_texts for _ in range(m_iters + 1)):
            t1 = time.perf_counter()
            m_rates.append(
                sum(o.shape[0] for o in m_outs) / SAMPLE_RATE / (t1 - t0))
            t0 = t1
        mesh_rtf = float(np.median(m_rates[1:]))
        if m_texts == texts and m_outs is not None:
            mesh_matches = bool(all(
                a.shape == b.shape and np.array_equal(a, b)
                for a, b in zip(m_outs, outs)))
        # Compute-only, same pipelined-dispatch protocol as the
        # unsharded number (K dispatches, one out_lens sync).
        mc_rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            m_handles = [bs_m._dispatch(rows) for _ in range(K)]
            m_audio = 0.0
            for handles in m_handles:
                for _, items, h in handles[1]:
                    lens = np.asarray(h[3])
                    m_audio += float(lens[: h[0]].sum()) / SAMPLE_RATE
            mc_rates.append(m_audio / (time.perf_counter() - t0))
        mesh_compute_rtf = float(np.median(mc_rates))
        del bs_m
      except Exception as e:
        import traceback

        traceback.print_exc()
        mesh_error = f"{type(e).__name__}: {e}"[:300]

    # WSOLA stretch path (speed 1.5): separate bucket/compile; realtime
    # factor counts *output* audio seconds.
    stretch_rtf = 0.0
    stretch_compute_rtf = 0.0
    stretch_outs = None
    if os.environ.get("CTTS_BENCH_STRETCH", "1") == "1":
        s_texts = warm_oom_halving(
            lambda t: [None for _ in bs.stream([t], speed=1.5)],
            texts, len(TEXTS))  # compile + warmup, OOM-halved
        s_iters = max(iters - 2, 2)
        s_rates = []
        t0 = time.perf_counter()
        for s_outs in bs.stream((s_texts for _ in range(s_iters)),
                                speed=1.5):
            t1 = time.perf_counter()
            s_rates.append(
                sum(o.shape[0] for o in s_outs) / SAMPLE_RATE / (t1 - t0)
            )
            t0 = t1
            stretch_outs = s_outs
        stretch_rtf = float(np.median(s_rates)) / max(n_chips, 1)

        # Compute-only stretch rate (same protocol as the speed-1.0
        # compute number: K pipelined dispatches, one out_lens sync —
        # excludes the tunnel's 20-40 MB/s D2H, which alone caps the
        # end-to-end stretch figure at ~650x here).
        s_rows = []
        for spl in bs.compile_plans(s_texts, 1.5):
            s_rows.extend(split_plan(spl, db))
        sc_rates = []
        for _ in range(3):
            t0 = time.perf_counter()
            s_handles = [bs._dispatch(s_rows) for _ in range(K)]
            s_audio = 0.0
            for handles in s_handles:
                for _, items, h in handles[1]:
                    lens = np.asarray(h[3])
                    s_audio += float(lens[: h[0]].sum()) / SAMPLE_RATE
            sc_rates.append(s_audio / (time.perf_counter() - t0))
        stretch_compute_rtf = float(np.median(sc_rates)) / max(n_chips, 1)

    # Long multi-sentence paragraph (BASELINE.json configs[2]): numbers,
    # abbreviations and punctuation pauses through split_plan on device
    # (the reference grows one buffer across sentences, ctts.c:3000-3012;
    # we split and concatenate — byte-equal, tests/test_split.py).
    paragraph_rtf = 0.0
    if os.environ.get("CTTS_BENCH_PARAGRAPH", "1") == "1":
        paragraph = (
            "no dia 15 de março de 2024, a empresa anunciou lucros de "
            "3500000 reais. o diretor, sr. joão silva, disse: isso é "
            "incrível! a meta era 2000000, mas superamos. agora temos "
            "42 filiais, 1200 funcionários, e planos para 2025. "
            "será que vamos crescer 30 por cento? talvez, quem sabe. "
            "a matriz fica na rua 7, número 123, em são paulo."
        )
        # Through the pipelined stream() loop (the serving path the
        # headline uses), not unpipelined synthesize(): the paragraph
        # config is a driver config (BASELINE.json configs[2]) and its
        # number must not mix in the host/sync terms stream() overlaps.
        paras = warm_oom_halving(
            lambda p: [None for _ in bs.stream([p])],
            [paragraph] * 8, 1)
        p_rates = []
        p_iters = 4
        t0 = time.perf_counter()
        for p_outs in bs.stream(paras for _ in range(p_iters)):
            t1 = time.perf_counter()
            p_rates.append(
                sum(o.shape[0] for o in p_outs) / SAMPLE_RATE / (t1 - t0))
            t0 = t1
        paragraph_rtf = float(np.median(p_rates)) / max(n_chips, 1)
        # Parity spot-check: the split device path must match the
        # oracle's single grown-buffer execution (ctts.c:3000-3012).
        from ctts_tpu.plan.compiler import compile_plan as _cp
        from ctts_tpu.synth.oracle import execute_plan_oracle as _eo

        p_ref = _eo(_cp(db, paragraph, config, None, 1.0), db)
        p_got = p_outs[0]
        paragraph_parity_ok = bool(
            len(p_ref) == len(p_got)
            and (np.abs(p_ref.astype(np.int32)
                        - p_got.astype(np.int32)) <= 32).all()
        )
    else:
        paragraph_parity_ok = True

    # 1024-sentence mixed-length serving run (BASELINE.json configs[4]):
    # short+long sentences, length-bucketed by the batcher, streamed
    # through the pipelined loop across an (optional) device mesh.
    mixed1024_rtf = 0.0
    if os.environ.get("CTTS_BENCH_1024", "1") == "1":
        long_texts = [
            "hoje de manhã eu acordei cedo, tomei café com pão e "
            "manteiga, e fui trabalhar de ônibus pela avenida principal",
            "o brasil é um país muito bonito com praias, montanhas, "
            "florestas e cidades grandes cheias de gente trabalhadora",
        ]
        mixed = (TEXTS + long_texts) * 57  # 1026 → trim to 1024
        mixed = mixed[:1024]
        chunk = len(texts)
        # Warm EVERY chunk once: chunk compositions differ (short/long
        # bucket split sizes vary per chunk), so warming only one chunk
        # leaves cold XLA compiles inside the timed region — measured
        # 97x instead of ~740x when the cache was cold. OOM during the
        # warm halves the chunk size (long sentences widen the bucket
        # beyond what the speed-1.0 warmup proved fits).
        while True:
            batches = [mixed[i:i + chunk]
                       for i in range(0, len(mixed), chunk)]
            try:
                for _ in bs.stream(iter(batches)):
                    pass
                break
            except Exception as e:
                if "memory" not in str(e).lower() or chunk <= len(TEXTS):
                    raise
                chunk = max(chunk // 2, len(TEXTS))
        t0 = time.perf_counter()
        m_audio = 0.0
        for outs_m in bs.stream(iter(batches)):
            m_audio += sum(o.shape[0] for o in outs_m) / SAMPLE_RATE
        mixed1024_rtf = m_audio / (time.perf_counter() - t0)

    # Parity vs oracle across the whole corpus (device-path accuracy).
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.oracle import execute_plan_oracle

    max_abs = 0.0
    frac_bad = 0.0
    total = 0
    len_match = True
    for t, got in zip(TEXTS, outs[: len(TEXTS)]):
        plan = compile_plan(db, t, config, None, 1.0)
        ref = execute_plan_oracle(plan, db)
        len_match &= bool(len(ref) == len(got))
        n = min(len(ref), len(got))
        if n:
            diff = np.abs(ref[:n].astype(np.int32) - got[:n].astype(np.int32))
            max_abs = max(max_abs, float(diff.max() / 32768.0))
            frac_bad += int((diff > 32) .sum())  # > 1e-3 budget
            total += n
    frac_over_budget = frac_bad / max(total, 1)

    # Stretch-bucket parity (VERDICT r2 weak #2: the benched stretch
    # configuration must be parity-checked, not just timed).
    s_max_abs = 0.0
    s_len_match = True
    if stretch_outs is not None:
        for t, got in zip(TEXTS, stretch_outs[: len(TEXTS)]):
            plan = compile_plan(db, t, config, None, 1.5)
            ref = execute_plan_oracle(plan, db)
            s_len_match &= bool(len(ref) == len(got))
            n = min(len(ref), len(got))
            if n:
                diff = np.abs(ref[:n].astype(np.int32)
                              - got[:n].astype(np.int32))
                s_max_abs = max(s_max_abs, float(diff.max() / 32768.0))

    print(json.dumps({
        "metric": "audio_seconds_per_second_per_chip",
        "value": round(rtf_per_chip, 2),
        "unit": "x_realtime",
        "vs_baseline": round(vs_baseline, 2),
        "aggregate_x_realtime": round(rtf, 2),
        "n_chips": n_chips,
        "batch_sentences": len(texts),
        "stretch_x_realtime_per_chip": round(stretch_rtf, 2),
        "stretch_compute_x_realtime_per_chip": round(stretch_compute_rtf, 2),
        "device_compute_x_realtime_per_chip": round(compute_rtf, 2),
        "mesh_x_realtime_per_chip": round(mesh_rtf, 2),
        "mesh_compute_x_realtime_per_chip": round(mesh_compute_rtf, 2),
        "mesh_matches_unsharded": mesh_matches,
        "mesh_error": mesh_error,
        "paragraph_x_realtime_per_chip": round(paragraph_rtf, 2),
        "paragraph_parity_ok": paragraph_parity_ok,
        "mixed1024_aggregate_x_realtime": round(mixed1024_rtf, 2),
        "c_reference_x_realtime": round(c_rtf, 2),
        "d2h_transfer_mbps": round(transfer_mbps, 1),
        "parity_max_abs_vs_oracle": max_abs,
        "parity_frac_samples_over_1e3": round(frac_over_budget, 8),
        "parity_length_match": len_match,
        "stretch_parity_max_abs_vs_oracle": s_max_abs,
        "stretch_parity_length_match": s_len_match,
        "backend": backend,
        "error": backend_error,
    }))


if __name__ == "__main__":
    try:
        main()
    except Exception as e:  # always leave ONE parseable JSON line
        import traceback

        traceback.print_exc()
        print(json.dumps({
            "metric": "audio_seconds_per_second_per_chip",
            "value": 0.0, "unit": "x_realtime", "vs_baseline": 0.0,
            "error": f"{type(e).__name__}: {e}",
        }))
