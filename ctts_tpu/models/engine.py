"""High-level engine API, mirroring the reference's library surface
(ctts_init / ctts_synthesize / ctts_free; ctts.h:196-247) with the
TPU-native executors underneath.
"""

from __future__ import annotations

from typing import Optional, Sequence

import numpy as np

from ctts_tpu.config import CTTSConfig, config_defaults, load_config
from ctts_tpu.constants import MAX_SPEED, MIN_SPEED
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import SynthesisPlan, compile_plan
from ctts_tpu.text.rules import NormalizationRules


class CTTSEngine:
    """Voice database + config + executors.

    `executor`: "oracle" (host NumPy, exact C semantics) or "jax"
    (TPU/XLA device path). Batched synthesis always uses the device path.
    """

    def __init__(
        self,
        database_file: str,
        config: Optional[CTTSConfig] = None,
        rules: Optional[NormalizationRules] = None,
        executor: str = "jax",
        mesh=None,
    ):
        self.db = VoiceDatabase(database_file)
        self.config = config or config_defaults()
        self.rules = rules
        self.executor = executor
        self.mesh = mesh
        self._voice = None
        self._batcher = None
        self.units_found = 0
        self.units_missing = 0

    @classmethod
    def from_files(cls, database_file: str, config_file: str = "config.yaml",
                   rules_file: str = "normalization.csv",
                   rule_flavor: str = "glibc", **kw) -> "CTTSEngine":
        return cls(
            database_file,
            config=load_config(config_file),
            rules=NormalizationRules.load(rules_file, verbose=False,
                                          flavor=rule_flavor),
            **kw,
        )

    # -- single utterance -------------------------------------------------

    def compile(self, text: str, speed: float = 1.0) -> SynthesisPlan:
        speed = min(max(speed, MIN_SPEED), MAX_SPEED)
        plan = compile_plan(self.db, text, self.config, self.rules, speed)
        self.units_found = plan.units_found
        self.units_missing = plan.units_missing
        return plan

    def synthesize(self, text: str, speed: float = 1.0) -> np.ndarray:
        """Text → int16 samples at 22050 Hz."""
        plan = self.compile(text, speed)
        if self.executor == "jax":
            from ctts_tpu.synth.device import DeviceVoice, execute_plan_jax

            if self._voice is None:
                self._voice = DeviceVoice(self.db, plan.target_rms)
            return execute_plan_jax(plan, self.db, self._voice)
        from ctts_tpu.synth.oracle import execute_plan_oracle

        return execute_plan_oracle(plan, self.db)

    # -- batched ----------------------------------------------------------

    def synthesize_batch(self, texts: Sequence[str],
                         speed: float = 1.0) -> list[np.ndarray]:
        from ctts_tpu.parallel.batch import BatchSynthesizer

        if self._batcher is None:
            self._batcher = BatchSynthesizer(
                self.db, self.config, self.rules, mesh=self.mesh
            )
        return self._batcher.synthesize(texts, speed)

    # -- config setters (API parity: ctts_set_*, ctts.c:1313-1330) --------

    def set_crossfade(self, crossfade_ms: float) -> None:
        self.config.crossfade_ms = crossfade_ms

    def set_word_pause(self, pause_ms: float) -> None:
        self.config.word_pause_ms = pause_ms

    def set_unknown_silence(self, silence_ms: float) -> None:
        self.config.unknown_silence_ms = silence_ms

    def set_fades(self, fade_in_ms: float, fade_out_ms: float) -> None:
        self.config.fade_in_ms = fade_in_ms
        self.config.fade_out_ms = fade_out_ms

    def close(self) -> None:
        self.db.close()
