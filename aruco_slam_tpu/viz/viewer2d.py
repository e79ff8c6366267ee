"""2D overlay sink: detected-marker axes + reprojected map points.

Mirrors the reference's Viewer2D semantics (reference
viewers/viewer_2d.py:64-190): draws xyz axes at each *detected* marker
pose and a dot at each *filtered* map point reprojected into the
frame, then downsamples for export. Headless: frames accumulate to PNG
files and/or an MP4 via imageio instead of a cv2.imshow window.
"""

from __future__ import annotations

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from aruco_slam_tpu.core import camera as cam_mod
from aruco_slam_tpu.core import quaternion as quat_np
from aruco_slam_tpu.viz import draw

AXIS_SIZE = 0.25  # meters (reference viewers/viewer_2d.py:9)
_AXIS_PTS = np.array(
    [[1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0], [0, 0, 0]]) * AXIS_SIZE
_COLORS = [(255, 64, 64), (64, 255, 64), (64, 64, 255)]
# drawDetectedMarkers palette (reference filters/base_filter.py:198
# via cv2.aruco): green border, red top-left corner, blue id text
OUTLINE_COLOR = (0, 255, 0)
CORNER_COLOR = (255, 0, 0)
ID_COLOR = (64, 64, 255)
# marker-frame square corners, IPPE_SQUARE order (ops/pnp.py
# square_object_points) — the outline reprojects these through the
# fitted pose (PnP pins them to the detected corners within the
# reprojection gate, <= 3 px)
_SQUARE = np.array([[-0.5, 0.5, 0], [0.5, 0.5, 0],
                    [0.5, -0.5, 0], [-0.5, -0.5, 0]])


class Viewer2D:
    """Accumulating 2D overlay renderer."""

    def __init__(self, cam: cam_mod.CameraModel,
                 export_dir: str | None = None,
                 export_video: str | None = None,
                 display_size=(960, 540),
                 marker_size: float = 0.16) -> None:
        self.cam = cam
        self.display_size = display_size
        self.marker_size = marker_size
        self.export_dir = Path(export_dir) if export_dir else None
        if self.export_dir:
            self.export_dir.mkdir(parents=True, exist_ok=True)
        self.export_video = export_video
        self._frames = [] if export_video else None
        self._idx = 0

    def view(self, frame: np.ndarray, camera_pose: np.ndarray,
             points_world: np.ndarray, detected: list | np.ndarray
             ) -> np.ndarray:
        """Render one frame.

        frame: (H, W) uint8 grayscale or (H, W, 3) RGB.
        camera_pose: (7+,) [xyz, quat wxyz].
        points_world: (M, 3) filtered landmark positions.
        detected: iterable of (t_cl (3,), q_cl (4,)) marker poses in
        the camera frame (PnP output), optionally (t_cl, q_cl, id) —
        with an id the marker's square outline and id label render
        too (the reference's cv2.aruco.drawDetectedMarkers overlay,
        reference filters/base_filter.py:198).
        """
        img = np.ascontiguousarray(
            np.stack([frame] * 3, -1) if frame.ndim == 2 else frame
        ).copy()
        # detected marker axes + outline + id label
        for d in detected:
            t_cl, q_cl = np.asarray(d[0]), np.asarray(d[1])
            mid = d[2] if len(d) > 2 else None
            r = np.asarray(quat_np.to_matrix(jnp.asarray(q_cl)))
            pts = _AXIS_PTS @ r.T + t_cl
            px = np.asarray(cam_mod.project(self.cam, jnp.asarray(pts)))
            if not np.isfinite(px).all():
                continue
            origin = px[3]
            for k in range(3):
                draw.draw_line(img, origin, px[k], _COLORS[k], 6)
            if mid is None:
                continue
            sq = _SQUARE * self.marker_size @ r.T + t_cl
            qx = np.asarray(cam_mod.project(self.cam, jnp.asarray(sq)))
            if not np.isfinite(qx).all():
                continue
            draw.draw_polygon(img, qx, OUTLINE_COLOR, 3)
            draw.draw_circle(img, qx[0], 6, CORNER_COLOR)
            draw.draw_text(img, qx[0] + np.array([8.0, 8.0]),
                           str(int(mid)), ID_COLOR, scale=3)
        # filtered map points reprojected
        cam_t = np.asarray(camera_pose[:3])
        cam_q = np.asarray(camera_pose[3:7])
        r_wc = np.asarray(quat_np.to_matrix(jnp.asarray(cam_q)))
        for p in np.asarray(points_world):
            p_c = r_wc.T @ (p - cam_t)
            if p_c[2] <= 0.05:
                continue
            px = np.asarray(cam_mod.project(self.cam, jnp.asarray(p_c)))
            draw.draw_circle(img, px, 10, (160, 32, 32))
        out = _resize(img, self.display_size)
        self._emit(out)
        return out

    def _emit(self, img: np.ndarray) -> None:
        if self.export_dir is not None:
            import imageio.v3 as iio
            iio.imwrite(self.export_dir / f"frame_{self._idx:05d}.png", img)
        if self._frames is not None:
            self._frames.append(img)
        self._idx += 1

    def close(self) -> None:
        if self._frames:
            from aruco_slam_tpu.viz.video import write_video
            write_video(self.export_video, self._frames)
            self._frames = []


def _resize(img: np.ndarray, size) -> np.ndarray:
    w, h = size
    ys = (np.arange(h) * img.shape[0] / h).astype(np.int64)
    xs = (np.arange(w) * img.shape[1] / w).astype(np.int64)
    return img[ys][:, xs]
