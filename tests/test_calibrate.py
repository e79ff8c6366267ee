"""Calibration: recover known intrinsics from synthetic board views."""

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation

from aruco_slam_tpu.core import camera as cam_mod
from aruco_slam_tpu.ops import calibrate

K_TRUE = np.array([[900.0, 0, 640.0], [0, 905.0, 360.0], [0, 0, 1.0]])
DIST_TRUE = np.array([0.08, -0.22, 0.001, 0.002, 0.11])
SIZE = (1280, 720)


def make_views(n_views=12, noise_px=0.1, seed=0):
    board = calibrate.grid_board(4, 3, marker_size=0.05, gap=0.015)
    cam = cam_mod.CameraModel.from_matrix(jnp.asarray(K_TRUE),
                                          jnp.asarray(DIST_TRUE))
    rng = np.random.default_rng(seed)
    m = len(board.ids)
    pts_board = np.concatenate(
        [board.corners, np.zeros((m, 4, 1))], -1)
    center = pts_board.reshape(-1, 3).mean(0)
    view_corners = np.zeros((n_views, m, 4, 2))
    view_mask = np.zeros((n_views, m), bool)
    for i in range(n_views):
        # camera looking at the board from varied tilted positions
        rot = Rotation.from_euler(
            "xyz", rng.uniform(-0.45, 0.45, 3))
        dist = rng.uniform(0.35, 0.7)
        # board pose in camera frame: R (p - center) + t
        r = rot.as_matrix()
        t = np.array([rng.uniform(-0.05, 0.05),
                      rng.uniform(-0.05, 0.05), dist])
        pts_cam = (pts_board - center) @ r.T + t
        px = np.array(cam_mod.project(cam, jnp.asarray(pts_cam)))
        px += rng.normal(scale=noise_px, size=px.shape)
        ok = ((pts_cam[..., 2] > 0.05).all(-1)
              & (px[..., 0] > 5).all(-1) & (px[..., 0] < SIZE[0] - 5).all(-1)
              & (px[..., 1] > 5).all(-1) & (px[..., 1] < SIZE[1] - 5).all(-1))
        view_corners[i][ok] = px[ok]
        view_mask[i] = ok
    return board, view_corners, view_mask


def test_recovers_intrinsics():
    board, corners, mask = make_views()
    assert mask.sum() > 60
    res = calibrate.calibrate(board, corners, mask, SIZE, iters=60)
    assert res.rms_px < 0.3, res.rms_px
    np.testing.assert_allclose(res.camera_matrix[0, 0], 900.0, rtol=0.01)
    np.testing.assert_allclose(res.camera_matrix[1, 1], 905.0, rtol=0.01)
    np.testing.assert_allclose(res.camera_matrix[0, 2], 640.0, atol=8)
    np.testing.assert_allclose(res.camera_matrix[1, 2], 360.0, atol=8)
    np.testing.assert_allclose(res.dist_coeffs[:2], DIST_TRUE[:2],
                               atol=0.03)


def test_matches_cv2_calibrate():
    import cv2
    board, corners, mask = make_views(seed=3)
    res = calibrate.calibrate(board, corners, mask, SIZE, iters=60)
    # cv2 oracle on the same correspondences
    obj_pts, img_pts = [], []
    m = len(board.ids)
    pts_board = np.concatenate(
        [board.corners, np.zeros((m, 4, 1))], -1).astype(np.float32)
    for i in range(len(corners)):
        det = np.where(mask[i])[0]
        if len(det) < 4:
            continue
        obj_pts.append(pts_board[det].reshape(-1, 3))
        img_pts.append(corners[i, det].reshape(-1, 1, 2)
                       .astype(np.float32))
    rms, k_cv, d_cv, *_ = cv2.calibrateCamera(
        obj_pts, img_pts, SIZE, None, None)
    np.testing.assert_allclose(res.camera_matrix[0, 0], k_cv[0, 0],
                               rtol=0.01)
    np.testing.assert_allclose(res.camera_matrix[0, 2], k_cv[0, 2],
                               atol=6)
    assert res.rms_px < rms * 1.5 + 0.1
