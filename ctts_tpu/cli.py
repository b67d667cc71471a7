"""Drop-in `ctts` command-line interface (parity: main, ctts.c:3930-4035).

    ctts build <dataset_dir> <output.db>
    ctts synth <database.db> "text" <output.wav> [speed]

Extensions (flags after the positional args, all optional):
    --executor=native|oracle|jax
                            waveform executor (default: native = C++ host
                            engine, exact C semantics, falls back to the
                            NumPy oracle; jax = TPU/XLA batch path)
    --config=PATH           config file (default: ./config.yaml, like the C)
    --rules=PATH            normalization CSV (default: ./normalization.csv)
    --rule-flavor=glibc|full  regex flavor (default: glibc = this platform's
                            C binary behavior; see ctts_tpu.text.rules)
"""

from __future__ import annotations

import sys

import numpy as np

from ctts_tpu.config import _strtof, load_config
from ctts_tpu.constants import MAX_SPEED, MIN_SPEED, SAMPLE_RATE
from ctts_tpu.db.builder import build_database
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.text.duration_rules import DurationRules
from ctts_tpu.text.rules import NormalizationRules
from ctts_tpu.utils.wav import write_wav


def _print_usage(prog: str) -> None:
    print("CTTS - Concatenative Text-to-Speech Engine (TPU rebuild)\n",
          file=sys.stderr)
    print("Usage:", file=sys.stderr)
    print("  Build database:", file=sys.stderr)
    print(f"    {prog} build <dataset_dir> <output.db>\n", file=sys.stderr)
    print("  Synthesize speech:", file=sys.stderr)
    print(f"    {prog} synth <database.db> \"text\" <output.wav> [speed]\n",
          file=sys.stderr)
    print("  Options:", file=sys.stderr)
    print("    speed  - Playback speed (0.5 to 2.0, default 1.0)",
          file=sys.stderr)


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv if argv is None else argv)
    prog = argv[0] if argv else "ctts"

    flags = {k: v for k, _, v in
             (a.partition("=") for a in argv if a.startswith("--"))}
    args = [a for a in argv if not a.startswith("--")]

    if len(args) < 2:
        _print_usage(prog)
        return 1

    cmd = args[1]

    if cmd == "build":
        if len(args) < 4:
            print(f"Usage: {prog} build <dataset_dir> <output.db>",
                  file=sys.stderr)
            return 1
        dataset, out = args[2], args[3]
        # Path derivation incl. the reference's "sillabes" spelling
        # (ctts.c:3956-3959).
        try:
            build_database(
                f"{dataset}/letters/wavs",
                f"{dataset}/letters/letters.txt",
                f"{dataset}/syllables/wavs",
                f"{dataset}/syllables/sillabes.txt",
                out,
            )
        except OSError as e:
            print(f"Build failed: {e}", file=sys.stderr)
            return 1
        return 0

    if cmd == "synth":
        if len(args) < 5:
            print(f"Usage: {prog} synth <database.db> \"text\" <output.wav>"
                  f" [speed]", file=sys.stderr)
            return 1

        db_path, text, out_path = args[2], args[3], args[4]
        speed = 1.0
        if len(args) > 5:
            # C strtof: unparseable → 0.0, then clamped (ctts.c:3977-3981).
            speed = float(np.float32(_strtof(args[5])))
            speed = min(max(speed, MIN_SPEED), MAX_SPEED)

        try:
            db = VoiceDatabase(db_path)
        except (OSError, ValueError):
            print(f"Failed to load database: {db_path}", file=sys.stderr)
            return 1

        config = load_config(flags.get("--config", "config.yaml"))
        # Config default_speed applies only when the CLI speed is absent
        # (ctts.c:3993-3995).
        if len(args) <= 5 and config.default_speed != 1.0:
            speed = config.default_speed

        print(f"Loaded database with {db.unit_count} units")
        print(
            f"Config: crossfade={config.crossfade_ms:.1f}ms "
            f"(vowel={config.crossfade_vowel_ms:.1f}ms, "
            f"v2c={config.vowel_to_consonant_factor * 100:.0f}%), "
            f"word_pause={config.word_pause_ms:.1f}ms"
        )

        # Loaded (and reported) but never applied — reference parity.
        DurationRules.load("duration_rules.csv")

        # The reference's print_timing flag is a stub; here it reports
        # real per-stage wall clock (SURVEY.md §5.1).
        from ctts_tpu.utils.timing import StageTimer

        timer = StageTimer(enabled=config.print_timing)

        with timer.stage("load rules"):
            rules = NormalizationRules.load(
                flags.get("--rules", "normalization.csv"),
                flavor=flags.get("--rule-flavor", "glibc"),
            )
        with timer.stage("compile plan"):
            plan = compile_plan(db, text, config, rules, speed)

        executor = flags.get("--executor", "native")
        with timer.stage(f"execute ({executor})"):
            if executor == "jax":
                from ctts_tpu.synth.device import execute_plan_jax

                samples = np.asarray(execute_plan_jax(plan, db))
            elif executor == "native":
                try:
                    from ctts_tpu.runtime.native import NativeEngine

                    samples = NativeEngine(db_path).execute(plan)
                except Exception:
                    from ctts_tpu.synth.oracle import execute_plan_oracle

                    samples = execute_plan_oracle(plan, db)
            else:
                from ctts_tpu.synth.oracle import execute_plan_oracle

                samples = execute_plan_oracle(plan, db)
        timer.report()

        print(
            f"Synthesized {samples.shape[0]} samples "
            f"({samples.shape[0] / SAMPLE_RATE:.2f} seconds)"
        )
        print(f"Units found: {plan.units_found}, missing: {plan.units_missing}")

        try:
            write_wav(out_path, samples, SAMPLE_RATE)
        except OSError as e:
            print(f"Failed to write WAV: {e}", file=sys.stderr)
            return 1
        print(f"Written to {out_path}")
        return 0

    _print_usage(prog)
    return 1


if __name__ == "__main__":
    sys.exit(main())
