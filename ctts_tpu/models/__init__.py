from ctts_tpu.models.engine import CTTSEngine
