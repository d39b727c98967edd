"""Device mesh + sharding helpers.

Data parallelism over the TPU ICI mesh replaces the reference's single-host
``nn.DataParallel`` (reference: src/utils/unets.py:51-52; SURVEY.md §5.8).
The train step is jitted with a batch axis sharded over the 'data' mesh axis
and replicated parameters; XLA inserts the psum gradient all-reduce and the
cross-replica BatchNorm statistics automatically (global-batch reductions on
sharded arrays lower to ICI collectives).
"""

from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def get_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    n = num_devices or len(devices)
    if n > len(devices):
        raise ValueError(f"requested {n} devices, have {len(devices)}")
    return Mesh(np.asarray(devices[:n]), (DATA_AXIS,))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def pad_batch_to_devices(n: int, n_devices: int) -> int:
    """Smallest multiple of n_devices >= n (static batch padding)."""
    return ((n + n_devices - 1) // n_devices) * n_devices
