"""Device voice bundle: the TPU-side analogue of the compiled voice.db.

The reference's checkpoint/versioning story is the mmap'd `.db` artifact
(SURVEY.md §5.4). For the device path we additionally persist the padded
unit tensor, lengths, and host-precomputed RMS gains as a versioned .npz,
so engine bring-up skips the pad/gain pass (the gain computation is a
per-unit f64 RMS over the whole pool).
"""

from __future__ import annotations

import numpy as np

from ctts_tpu.constants import MAGIC, SAMPLE_RATE, VERSION
from ctts_tpu.db.reader import VoiceDatabase

BUNDLE_VERSION = 1


def save_voice_bundle(db: VoiceDatabase, path: str,
                      target_rms: float = 3000.0) -> None:
    units, lengths = db.to_device_arrays()
    n = units.shape[0]
    gains = np.ones(n, np.float32)
    for i in range(n):
        s = db.unit_samples(i).astype(np.float64)
        if s.shape[0] == 0:
            continue
        rms = np.float32(np.sqrt(np.sum(s * s) / s.shape[0]))
        if rms < np.float32(1.0):
            continue
        g = np.float32(target_rms) / rms
        gains[i] = min(max(g, np.float32(0.1)), np.float32(3.0))

    texts = np.array([db.unit_text(i) for i in range(n)], dtype=object)
    np.savez_compressed(
        path,
        bundle_version=BUNDLE_VERSION,
        magic=MAGIC,
        db_version=VERSION,
        sample_rate=SAMPLE_RATE,
        target_rms=np.float32(target_rms),
        units=units,
        lengths=lengths,
        gains=gains,
        texts=texts,
        max_unit_chars=db.max_unit_chars,
    )


class VoiceBundle:
    """Loaded bundle; duck-types DeviceVoice's device-array interface."""

    def __init__(self, path: str):
        import jax.numpy as jnp

        z = np.load(path, allow_pickle=True)
        if int(z["bundle_version"]) != BUNDLE_VERSION:
            raise ValueError(f"{path}: bundle version mismatch "
                             f"{int(z['bundle_version'])} != {BUNDLE_VERSION}")
        if int(z["magic"]) != MAGIC or int(z["db_version"]) != VERSION:
            raise ValueError(f"{path}: database format mismatch")
        self.sample_rate = int(z["sample_rate"])
        self.target_rms = float(z["target_rms"])
        self.max_unit_chars = int(z["max_unit_chars"])
        self.texts = [bytes(t) for t in z["texts"]]
        self.bank = jnp.asarray(z["units"].astype(np.float32))
        self.lengths = jnp.asarray(z["lengths"].astype(np.int32))
        self.gains = jnp.asarray(z["gains"].astype(np.float32))
        self.ubuf = int(z["units"].shape[1])
