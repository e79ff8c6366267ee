"""Host-side visualization sinks (2D overlay, 3D map/trajectory).

The reference renders through OpenCV windows and a Pangolin/OpenGL
binding built from source (reference viewers/viewer_2d.py,
viewers/viewer_3d.py, thirdparty/pangolin_setup.py). Per the TPU-first
design these are pure host-side sinks fed by device→host pose/map
snapshots: the 2D overlay rasterizes in numpy (no native windowing
dependency), the 3D view renders with matplotlib, and both export
PNG frames / MP4 (imageio) instead of interactive windows — CI- and
headless-friendly by default.
"""

from aruco_slam_tpu.viz.viewer2d import Viewer2D
from aruco_slam_tpu.viz.viewer3d import Viewer3D

__all__ = ["Viewer2D", "Viewer3D"]
