"""Device-mesh helpers."""

from __future__ import annotations

import math
from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    shape: Optional[Tuple[int, ...]] = None,
    axis_names: Tuple[str, ...] = ("amp",),
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a Mesh; default = all devices on one 'amp' axis, truncated to a
    power of two (the state-vector axis must shard 2^d ways)."""
    devices = list(devices if devices is not None else jax.devices())
    if shape is None:
        d = 1 << int(math.log2(len(devices)))
        shape = (d,)
        devices = devices[:d]
    total = int(np.prod(shape))
    if total > len(devices):
        raise ValueError(f"mesh shape {shape} needs {total} devices, have {len(devices)}")
    arr = np.asarray(devices[:total]).reshape(shape)
    return Mesh(arr, axis_names)


def num_global_qubits(mesh: Mesh, axis: str = "amp") -> int:
    size = mesh.shape[axis]
    d = int(math.log2(size))
    if (1 << d) != size:
        raise ValueError(f"mesh axis {axis!r} size {size} must be a power of two")
    return d
