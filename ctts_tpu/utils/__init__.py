from ctts_tpu.utils.textutil import fnv1a_hash, utf8_strlen, normalize_lowercase
from ctts_tpu.utils.wav import read_wav, write_wav
