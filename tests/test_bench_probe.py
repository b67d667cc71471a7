"""bench.py backend probing: a dead/hanging accelerator plugin must
never zero a round's evidence again (BENCH_r03 rc=1 — VERDICT r3
items 2/weak-3). The probe runs in a subprocess with a timeout and the
bench falls back to a labeled CPU run, always emitting parseable JSON.
"""

import json
import os
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(code: str, env: dict) -> str:
    full_env = dict(os.environ)
    full_env.update(env)
    r = subprocess.run(
        [sys.executable, "-c", code], capture_output=True, text=True,
        timeout=300, cwd=REPO, env=full_env,
    )
    assert r.returncode == 0, r.stderr
    return r.stdout


def test_probe_healthy_cpu():
    out = _run(
        "import bench; print(bench.resolve_backend()[0])",
        {"JAX_PLATFORMS": "cpu"},
    )
    assert out.strip().splitlines()[-1] == "cpu"


def test_probe_falls_back_and_labels(monkeypatch):
    # The configured backend never comes up; after the bounded retry
    # window resolve_backend must force JAX_PLATFORMS=cpu and land on
    # the labeled CPU fallback with a diagnosable error string.
    sys.path.insert(0, REPO)
    import bench

    monkeypatch.setenv("JAX_PLATFORMS", "axon")
    monkeypatch.setenv("CTTS_BENCH_PROBE_TRIES", "2")
    monkeypatch.setenv("CTTS_BENCH_PROBE_BACKOFF", "0")
    attempts = []

    def fake_probe(timeout_s):
        attempts.append(os.environ["JAX_PLATFORMS"])
        if os.environ["JAX_PLATFORMS"] == "cpu":
            return ("cpu", 1)
        return None

    monkeypatch.setattr(bench, "probe_backend", fake_probe)
    b, e = bench.resolve_backend()
    assert b == "cpu-fallback"
    assert "unavailable" in e
    assert attempts == ["axon", "axon", "cpu"]


def test_error_json_when_nothing_comes_up():
    # Even the terminal failure path must print one parseable JSON line.
    code = (
        "import bench, json\n"
        "bench.probe_backend = lambda *a, **k: None\n"
        "bench.main()\n"
    )
    out = _run(code, {"CTTS_BENCH_PROBE_TRIES": "1",
                      "CTTS_BENCH_PROBE_BACKOFF": "0"})
    rec = json.loads(out.strip().splitlines()[-1])
    assert rec["backend"] == "none"
    assert rec["error"]
    assert rec["metric"] == "audio_seconds_per_second_per_chip"
