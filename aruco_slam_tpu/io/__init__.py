"""Host-side IO: trajectory (TUM), map persistence, calibration,
frame/observation sources.

Replaces the reference's outputs/trajectory_writer.py, the map text
format in filters/base_filter.py:214-272 (with its load bug fixed),
and the cv2.VideoCapture ingest loop in main/run_slam.py:96-116.
"""

from aruco_slam_tpu.io.trajectory import TrajectoryWriter, read_trajectory
from aruco_slam_tpu.io.map_io import load_map, save_map

__all__ = ["TrajectoryWriter", "read_trajectory", "save_map", "load_map"]
