"""CLI surface tests: build/synth subcommands, flag handling, config
precedence (ctts.c:3930-4035 semantics)."""

import os
import subprocess
import sys

import numpy as np
import pytest

from ctts_tpu.utils.wav import read_wav

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(args, cwd):
    env = dict(os.environ)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    env["JAX_PLATFORMS"] = "cpu"
    return subprocess.run(
        [sys.executable, "-m", "ctts_tpu.cli"] + args,
        capture_output=True, cwd=cwd, env=env, text=True,
    )


def test_cli_build_and_synth(dataset_dir, tmp_path):
    r = _run(["build", dataset_dir, "voice.db"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "Database written" in r.stdout

    r = _run(["synth", "voice.db", "olá mundo", "out.wav"], tmp_path)
    assert r.returncode == 0, r.stderr
    assert "Units found:" in r.stdout
    s = read_wav(str(tmp_path / "out.wav"))
    assert s.shape[0] > 22050 // 2  # at least half a second
    assert np.abs(s).max() > 1000


def test_cli_speed_clamps(voice_db, tmp_path):
    # Speed beyond limits clamps (ctts.c:3979-3981); garbage parses as 0.0
    # → clamps to 0.5.
    r = _run(["synth", voice_db, "oi", "a.wav", "9.0"], tmp_path)
    assert r.returncode == 0, r.stderr
    r = _run(["synth", voice_db, "oi", "b.wav", "abc"], tmp_path)
    assert r.returncode == 0, r.stderr
    a = read_wav(str(tmp_path / "a.wav"))   # 2.0x
    b = read_wav(str(tmp_path / "b.wav"))   # 0.5x
    assert b.shape[0] > 2.5 * a.shape[0]


def test_cli_default_speed_from_config(voice_db, tmp_path):
    (tmp_path / "config.yaml").write_text("default_speed: 2.0\n")
    r = _run(["synth", voice_db, "como vai", "c.wav"], tmp_path)
    assert r.returncode == 0, r.stderr
    c = read_wav(str(tmp_path / "c.wav"))
    # CLI speed overrides the config default (ctts.c:3993-3995).
    r = _run(["synth", voice_db, "como vai", "d.wav", "1.0"], tmp_path)
    d = read_wav(str(tmp_path / "d.wav"))
    assert d.shape[0] > 1.5 * c.shape[0]


def test_cli_missing_db(tmp_path):
    r = _run(["synth", "missing.db", "oi", "x.wav"], tmp_path)
    assert r.returncode == 1
    assert "Failed to load database" in r.stderr


def test_cli_usage(tmp_path):
    r = _run([], tmp_path)
    assert r.returncode == 1
    assert "Usage" in r.stderr
