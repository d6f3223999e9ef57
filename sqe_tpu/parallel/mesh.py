"""Device mesh construction helpers.

The reference has no distribution of its own — OpenSearch ran single-node
(docker-compose.yml:48) and all cross-service traffic was HTTP. Here the
"cluster" is a ``jax.sharding.Mesh`` over TPU chips: index shards ride the ICI
mesh and merges are XLA collectives, not RPCs (SURVEY.md §2 parallelism
checklist).
"""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def best_devices(platform: Optional[str] = None) -> list:
    """All devices of the preferred platform (tpu if present, else default)."""
    if platform is not None:
        return jax.devices(platform)
    try:
        return jax.devices("tpu")
    except RuntimeError:
        return jax.devices()


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Sequence[str] = ("shard",),
    devices: Optional[Sequence[jax.Device]] = None,
) -> Mesh:
    """Build a mesh; defaults to a 1-D 'shard' axis over all devices."""
    if devices is None:
        devices = best_devices()
    if shape is None:
        shape = (len(devices),)
    n = int(np.prod(shape))
    if n > len(devices):
        raise ValueError(f"mesh shape {shape} needs {n} devices, have {len(devices)}")
    dev_array = np.asarray(devices[:n]).reshape(shape)
    return Mesh(dev_array, tuple(axis_names))
