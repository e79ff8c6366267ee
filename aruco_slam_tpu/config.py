"""Typed application config — the single tunable surface.

The reference scatters its knobs across module-level constants
(display flags and sizes in main/run_slam.py:31-44, filter noise in
filters/extended_kalman_filter.py:19-34 and
filters/ekf_with_rotations.py:21-40, graph noise in
filters/factor_graph.py:20-28, detector parameters in
filters/base_filter.py:82-90). Here they are one dataclass that the
CLI populates and every subsystem consumes.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class SlamAppConfig:
    # input
    input: str = "sequence.npz"
    filter: str = "mekf"          # mekf | mekf_rotations | factorgraph
    marker_size: float = 0.16     # meters (reference base_filter.py:178)
    capacity: int = 64
    # camera fallback (the reference's calibration artifacts,
    # calibration/camera_matrix.npy + dist_coeffs.npy)
    camera_matrix: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array(
            [[1414.9, 0.0, 967.0], [0.0, 1414.9, 544.3], [0.0, 0.0, 1.0]]))
    dist_coeffs: np.ndarray = dataclasses.field(
        default_factory=lambda: np.array(
            [0.0614, -0.2951, 0.0005, 0.0029, 0.4387]))
    # outputs (reference main/run_slam.py:28-32)
    trajectory_file: str = "outputs/trajectory.txt"
    map_file: str = "outputs/map.txt"
    # viz sinks
    viz_2d: bool = False
    viz_3d: bool = False
    viz_dir: str = "outputs/images"
    export_video: bool = False
    # detection gating
    max_reproj_px: float = 3.0
    # graph online mode
    window: int = 8
    window_iters: int = 3
    batch_iters: int = 50
