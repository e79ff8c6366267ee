"""Core geometry and math primitives (pure JAX, batch-friendly).

Replaces the reference's native math layer: scipy Rotation conversions,
SymPy-generated measurement Jacobians (reference
filters/extended_kalman_filter.py:292-353) and cv2.projectPoints
(reference viewers/viewer_2d.py:129-135).
"""

from aruco_slam_tpu.core import camera, lie, quaternion

__all__ = ["camera", "lie", "quaternion"]
