"""Device mesh construction.

The reference has no distribution layer at all (SURVEY §2.3: single CUDA
device, no NCCL/MPI — `tools/preprocess_data.py:48`); this module is the
TPU-native distribution substrate: a `jax.sharding.Mesh` whose `dp` axis
shards frames (within a sequence) or sequences (across hosts), with
collectives riding ICI.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    """1-D mesh over the first ``n_devices`` devices (all by default)."""
    devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.array(devices), (axis,))


def frame_sharding(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Shard the leading (frame/batch) dimension over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
