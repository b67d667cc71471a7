#!/usr/bin/env python
"""Generate the 120-sample acceptance corpus + demo page.

Parity component 31/32 (SURVEY.md §2): the reference's
generate_samples.sh + docs/index.html. Uses the native engine (falls back
to the oracle) so the full corpus renders in seconds.

Usage:
    python tools/generate_samples.py <voice.db> [output_dir] [--executor=...]
"""

from __future__ import annotations

import html
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

from ctts_tpu.config import load_config
from ctts_tpu.constants import MAX_SPEED, MIN_SPEED, SAMPLE_RATE
from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.plan.compiler import compile_plan
from ctts_tpu.testing.corpus import CORPUS
from ctts_tpu.text.rules import NormalizationRules
from ctts_tpu.utils.wav import write_wav

PAGE_HEADER = """<!DOCTYPE html>
<html lang="pt-BR">
<head>
<meta charset="utf-8">
<title>ctts_tpu — Amostras de síntese</title>
<style>
 body { font-family: system-ui, sans-serif; max-width: 900px; margin: 2rem auto; }
 h1 { font-size: 1.4rem; } h2 { font-size: 1.1rem; margin-top: 2rem; }
 .sample { display: flex; align-items: center; gap: 1rem; padding: .3rem 0; }
 .sample span { flex: 1; }
 audio { height: 2rem; }
</style>
</head>
<body>
<h1>ctts_tpu — 120 amostras de aceitação</h1>
<p>Corpus de regressão (14 seções) sintetizado pelo motor TPU-native.</p>
"""

SECTIONS = [
    (1, "Perguntas (entonação ascendente)"),
    (11, "Exclamações"),
    (21, "Pausas de vírgula"),
    (31, "Pausas de ponto final"),
    (36, "Pontuação mista"),
    (41, "Expansão de números"),
    (51, "Abreviações"),
    (61, "Hiatos"),
    (71, "R inicial"),
    (81, "S entre vogais"),
    (91, "T final"),
    (93, "Declinação"),
    (97, "Variações de velocidade (WSOLA)"),
    (116, "Diálogos"),
]


def main() -> int:
    if len(sys.argv) < 2:
        print(__doc__, file=sys.stderr)
        return 1
    db_path = sys.argv[1]
    out_dir = sys.argv[2] if len(sys.argv) > 2 and not sys.argv[2].startswith(
        "--") else "samples"
    flags = {k: v for k, _, v in
             (a.partition("=") for a in sys.argv if a.startswith("--"))}
    executor = flags.get("--executor", "native")

    os.makedirs(os.path.join(out_dir, "audio"), exist_ok=True)

    db = VoiceDatabase(db_path)
    config = load_config("config.yaml")
    rules = NormalizationRules.load("normalization.csv", verbose=False,
                                    flavor=flags.get("--rule-flavor", "glibc"))

    engine = None
    if executor == "native":
        try:
            from ctts_tpu.runtime.native import NativeEngine

            engine = NativeEngine(db_path)
        except Exception:
            executor = "oracle"

    sections = dict(SECTIONS)
    page = [PAGE_HEADER]
    for i, (fname, text, speed) in enumerate(CORPUS, start=1):
        if i in sections:
            page.append(f"<h2>{html.escape(sections[i])}</h2>")
        cli_speed = min(max(float(np.float32(speed)), MIN_SPEED), MAX_SPEED)
        plan = compile_plan(db, text, config, rules, cli_speed)
        if engine is not None:
            samples = engine.execute(plan)
        else:
            from ctts_tpu.synth.oracle import execute_plan_oracle

            samples = execute_plan_oracle(plan, db)
        write_wav(os.path.join(out_dir, "audio", fname), samples, SAMPLE_RATE)
        label = html.escape(text)
        spd = f" ({speed}x)" if speed != 1.0 else ""
        page.append(
            f'<div class="sample"><span>[{i:03d}] {label}{spd}</span>'
            f'<audio controls src="audio/{fname}"></audio></div>'
        )
        print(f"[{i:03d}] {text}")

    page.append("</body></html>\n")
    with open(os.path.join(out_dir, "index.html"), "w", encoding="utf-8") as f:
        f.write("\n".join(page))
    print(f"\nGenerated {len(CORPUS)} samples in {out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
