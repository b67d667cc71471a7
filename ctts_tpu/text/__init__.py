from ctts_tpu.text.numbers import expand_numbers
from ctts_tpu.text.rules import NormalizationRules
from ctts_tpu.text.normalize import normalize_pipeline
