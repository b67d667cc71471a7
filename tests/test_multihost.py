"""Multi-host (DCN) dispatch: two spawned processes, each with 4 virtual
CPU devices, coordinate via jax.distributed and exchange outputs with
process_allgather — the same code path a multi-host TPU pod takes
(SURVEY.md §5.8; the reference has no parallelism at all)."""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

_WORKER = r"""
import sys
import numpy as np

coordinator, pid, dbp, outp = sys.argv[1], int(sys.argv[2]), sys.argv[3], sys.argv[4]

# Must run before importing ctts_tpu: the package builds device LUTs at
# import, which initializes the XLA backend (see multihost.initialize
# docstring).
import jax

# shutdown_timeout: both workers compile the mesh core fresh (mesh
# cores are excluded from the persistent cache), and on a loaded host
# the compile skew between ranks can exceed the 5-min default shutdown
# barrier — the fast rank then kills the slow one mid-compile.
jax.distributed.initialize(coordinator_address=coordinator,
                           num_processes=2, process_id=pid,
                           shutdown_timeout_seconds=540)

from ctts_tpu.parallel.multihost import synthesize_across_hosts
assert jax.process_count() == 2
assert len(jax.devices()) == 8, f"want 8 global devices, got {len(jax.devices())}"

from ctts_tpu.config import config_defaults
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.parallel.batch import BatchSynthesizer
from ctts_tpu.parallel.mesh import make_mesh

db = VoiceDatabase(dbp)
local = jax.local_devices()
bs = BatchSynthesizer(db, config_defaults(),
                      mesh=make_mesh(local) if len(local) > 1 else None)

# Asymmetric lengths: process 0's block holds the long paragraph, so the
# flat-packed exchange pads only to the larger process TOTAL, never to a
# global per-sentence max width.
TEXTS = ["bom dia. que legal ver a rosa e o rato no mato de manhã.",
         "bom dia", "que legal", "a rosa",
         "vamos", "sim claro", "oi", "nada"]
outs = synthesize_across_hosts(bs, TEXTS)
assert len(outs) == len(TEXTS)

# return_local skips the gather: local indices + local outputs only,
# matching the gathered results row for row.
idx, local_outs = synthesize_across_hosts(bs, TEXTS, return_local=True)
assert len(idx) == len(local_outs) and len(idx) < len(TEXTS)
for i, o in zip(idx, local_outs):
    assert np.array_equal(o, outs[i]), i

if pid == 0:
    np.savez(outp, **{str(i): o for i, o in enumerate(outs)})
print(f"proc {pid} OK", flush=True)
"""


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


@pytest.mark.slow
def test_two_process_dcn_dispatch(voice_db, tmp_path):
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    coordinator = f"127.0.0.1:{_free_port()}"
    outp = str(tmp_path / "mh_out.npz")

    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env["XLA_FLAGS"] = "--xla_force_host_platform_device_count=4"
    env["JAX_NUM_CPU_DEVICES"] = "4"
    env["PYTHONPATH"] = os.pathsep.join(
        [repo] + [p for p in env.get("PYTHONPATH", "").split(os.pathsep)
                  if p and "axon_site" not in p]
    )

    procs = [
        subprocess.Popen(
            [sys.executable, "-c", _WORKER, coordinator, str(pid),
             voice_db, outp],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
            text=True,
        )
        for pid in (0, 1)
    ]
    logs = []
    for p in procs:
        out, _ = p.communicate(timeout=900)
        logs.append(out)
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"

    # Process 0 gathered ALL outputs (including process 1's half over
    # DCN); check them against the oracle.
    from ctts_tpu.config import config_defaults
    from ctts_tpu.db.reader import VoiceDatabase
    from ctts_tpu.plan.compiler import compile_plan
    from ctts_tpu.synth.oracle import execute_plan_oracle

    data = np.load(outp)
    db = VoiceDatabase(voice_db)
    texts = ["bom dia. que legal ver a rosa e o rato no mato de manhã.",
             "bom dia", "que legal", "a rosa",
             "vamos", "sim claro", "oi", "nada"]
    for i, t in enumerate(texts):
        got = data[str(i)]
        ref = execute_plan_oracle(
            compile_plan(db, t, config_defaults(), None, 1.0), db
        )
        assert ref.shape[0] == got.shape[0], t
        diff = np.abs(ref.astype(np.int32) - got.astype(np.int32))
        assert diff.max() <= 2, f"{t}: max diff {diff.max()}"
