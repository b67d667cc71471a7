from ctts_tpu.db.reader import VoiceDatabase
from ctts_tpu.db.builder import build_database
