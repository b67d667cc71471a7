"""ctts_tpu — TPU-native rebuild of the CTTS concatenative text-to-speech engine.

A from-scratch reimplementation of `jonathandasilvasantos/2026-simple-c-tts`
(reference mounted at /root/reference) designed for TPUs:

- The *host* side keeps the irregular text work — pt-BR number expansion,
  regex pronunciation rules, lowercase normalization, Portuguese-phonotactics
  unit selection with look-ahead — and compiles each utterance into a dense
  numeric *synthesis plan* (arrays of unit ids, crossfade lengths, pauses,
  prosody parameters).
- The *device* side executes plans in JAX/XLA/Pallas: unit-pool gather,
  raised-cosine crossfade overlap-add, energy normalization, DC removal,
  silence compaction, boundary pitch smoothing, phrase intonation, and WSOLA
  speed control — vmapped over length-bucketed sentence batches and sharded
  across a TPU mesh.

The `voice.db` database format, the `config.yaml` schema, the
`normalization.csv` rule language, and the 16-bit 22050 Hz WAV outputs are
drop-in compatible with the C reference (ctts.h:84-111, ctts.c:1190-1330).
"""

from ctts_tpu.constants import (
    SAMPLE_RATE,
    BITS_PER_SAMPLE,
    MAGIC,
    VERSION,
    MIN_SPEED,
    MAX_SPEED,
)
from ctts_tpu.config import CTTSConfig, load_config, config_defaults

__version__ = "0.1.0"

__all__ = [
    "SAMPLE_RATE",
    "BITS_PER_SAMPLE",
    "MAGIC",
    "VERSION",
    "MIN_SPEED",
    "MAX_SPEED",
    "CTTSConfig",
    "load_config",
    "config_defaults",
]
