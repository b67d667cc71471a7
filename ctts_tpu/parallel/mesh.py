"""Device-mesh helpers for sharded batch synthesis.

Synthesis is embarrassingly parallel over sentences (SURVEY.md §5.8): a
1-D data mesh shards the batch axis across chips over ICI; the voice bank
(tens of MB) is replicated per chip. No cross-chip collectives are needed
in the forward path — XLA inserts none — so scaling is linear in chips.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def make_mesh(devices: Optional[Sequence] = None) -> Mesh:
    """1-D data-parallel mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.array(devices), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
