"""Device-mesh helpers."""

from __future__ import annotations

import numpy as np
import jax
from jax.sharding import Mesh


def make_mesh(n_devices: int | None = None,
              axis_name: str = "kf") -> Mesh:
    """1-D mesh over the first `n_devices` devices (all by default).

    Marker-SLAM's natural parallel axes are keyframes/factors ('kf')
    for a single big BA problem and sequences ('data') for fleets of
    independent SLAM runs; both are 1-D. Multi-host slices extend this
    by constructing the mesh from `jax.devices()` spanning hosts — the
    collectives compile to ICI/DCN transfers automatically.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))
