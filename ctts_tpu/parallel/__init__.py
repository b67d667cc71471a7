from ctts_tpu.parallel.batch import BatchSynthesizer
from ctts_tpu.parallel.mesh import make_mesh
