"""Test configuration.

Sharding tests run on a virtual 8-device CPU mesh
(XLA_FLAGS=--xla_force_host_platform_device_count=8, JAX_PLATFORMS=cpu),
so the suite never needs TPU hardware. Must be set before jax imports.
"""

import os
import shutil
import subprocess
import sys

# CTTS_TEST_TPU=1 runs the suite against the real TPU backend instead of
# the virtual CPU mesh (for the on-hardware acceptance pass, e.g.
#   CTTS_TEST_TPU=1 pytest tests/test_golden_device.py -m slow --no-header
# ). Tests that require the 8-device mesh must check device_count.
TPU_MODE = os.environ.get("CTTS_TEST_TPU") == "1"

if not TPU_MODE:
    os.environ["JAX_PLATFORMS"] = "cpu"
    _flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in _flags:
        os.environ["XLA_FLAGS"] = (
            _flags + " --xla_force_host_platform_device_count=8"
        ).strip()

import jax  # noqa: E402

if not TPU_MODE:
    # A sitecustomize hook may have initialized jax on the TPU backend
    # before this conftest ran; force re-init on the 8-device CPU
    # platform (the env var alone does not undo the hook's
    # config.update).
    jax.config.update("jax_platforms", "cpu")
    from jax._src import xla_bridge  # noqa: E402

    xla_bridge._clear_backends()
    assert jax.device_count() == 8, \
        "expected 8 virtual CPU devices for tests"

# Persistent compile cache: the suite's big vmapped cores take minutes
# each to compile on CPU, and XLA:CPU occasionally segfaults after many
# large compiles accumulate in one process (observed at the golden-
# device speed buckets). With the cache, reruns skip completed compiles
# (fast + self-healing after a compiler crash).
_cache = os.environ.get("CTTS_TEST_JAX_CACHE", "/tmp/ctts_test_jax_cache")
os.makedirs(_cache, exist_ok=True)
jax.config.update("jax_compilation_cache_dir", _cache)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

import pytest as _pytest  # noqa: E402


@_pytest.fixture(autouse=True, scope="module")
def _release_compiled_cores():
    """Bound the per-process resident-executable count (XLA:CPU
    segfaults once too many large cores accumulate — see
    ctts_tpu.parallel.batch.release_compiled)."""
    yield
    from ctts_tpu.parallel.batch import release_compiled

    release_compiled()

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"

sys.path.insert(0, REPO)


def _have_reference() -> bool:
    return os.path.exists(os.path.join(REFERENCE, "ctts.c"))


@pytest.fixture(scope="session")
def ref_build(tmp_path_factory):
    """Compile the reference CLI + parity harness in a scratch dir.

    Returns dict with paths: ctts (CLI binary), harness, or skips if the
    reference tree / compiler is unavailable.
    """
    if not _have_reference():
        pytest.skip("reference tree not available")
    if shutil.which("gcc") is None:
        pytest.skip("gcc not available")

    build = tmp_path_factory.mktemp("refbuild")
    ctts_bin = build / "ctts"
    harness_bin = build / "ref_harness"

    subprocess.run(
        ["gcc", "-O2", "-std=c99", "-o", str(ctts_bin),
         os.path.join(REFERENCE, "ctts.c"), "-lm"],
        check=True, capture_output=True,
    )
    subprocess.run(
        ["gcc", "-O2", "-std=gnu99",
         f"-DREF_CTTS_C=\"{REFERENCE}/ctts.c\"",
         "-I", REFERENCE,
         "-o", str(harness_bin),
         os.path.join(REPO, "tools", "ref_harness.c"), "-lm"],
        check=True, capture_output=True,
    )
    return {"ctts": str(ctts_bin), "harness": str(harness_bin),
            "dir": str(build)}


@pytest.fixture(scope="session")
def dataset_dir(tmp_path_factory):
    """Deterministic synthetic voice dataset (letters + syllables)."""
    from ctts_tpu.db.dataset import generate_dataset

    root = tmp_path_factory.mktemp("dataset")
    generate_dataset(str(root))
    return str(root)


@pytest.fixture(scope="session")
def voice_db(tmp_path_factory, dataset_dir):
    """voice.db built by the ctts_tpu builder."""
    from ctts_tpu.db.builder import build_database

    out = tmp_path_factory.mktemp("db") / "voice.db"
    build_database(
        os.path.join(dataset_dir, "letters", "wavs"),
        os.path.join(dataset_dir, "letters", "letters.txt"),
        os.path.join(dataset_dir, "syllables", "wavs"),
        os.path.join(dataset_dir, "syllables", "sillabes.txt"),
        str(out),
        verbose=False,
    )
    return str(out)


@pytest.fixture(scope="session")
def ref_voice_db(tmp_path_factory, ref_build, dataset_dir):
    """voice.db built by the reference C binary from the same dataset."""
    out = tmp_path_factory.mktemp("refdb") / "voice.db"
    subprocess.run(
        [ref_build["ctts"], "build", dataset_dir, str(out)],
        check=True, capture_output=True,
    )
    return str(out)
