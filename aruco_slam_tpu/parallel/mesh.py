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
    independent SLAM runs. `jax.devices()` is the GLOBAL list, so
    after `parallel.dist.initialize()` this same constructor spans
    hosts (multi-process CPU test: tests/test_dist.py). For the 2-D
    ('data', 'kf') fabric use `parallel.dist.make_mesh2d`.
    """
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))
