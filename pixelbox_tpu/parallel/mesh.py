"""Mesh construction helpers."""

from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import numpy as np
from jax.sharding import Mesh


def make_mesh(
    n_devices: Optional[int] = None,
    axis_names: Sequence[str] = ("data",),
    shape: Optional[Tuple[int, ...]] = None,
) -> Mesh:
    """A Mesh over the first ``n_devices`` devices.

    Default is a 1-D ``('data',)`` mesh — index rows shard over it for
    scans, batch dims for ingest.  Pass ``axis_names=('data','model')`` and
    a ``shape`` for 2-D dp×tp meshes (training).
    """
    devices = jax.devices()
    if n_devices is None:
        n_devices = len(devices)
    devices = devices[:n_devices]
    if shape is None:
        shape = (len(devices),) + (1,) * (len(axis_names) - 1)
    mesh_devices = np.asarray(devices).reshape(shape)
    return Mesh(mesh_devices, axis_names)
