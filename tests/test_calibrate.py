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


# ---------------------------------------------------------------------------
# ChArUco: the reference's actual calibration board (reference
# calibration/charuco_calibration.py:12-16 — 7x5 squares, 30/15 mm,
# DICT_APRILTAG_36h11), exercised image-domain end to end:
# render -> detect markers -> interpolate chessboard corners ->
# subpixel refine -> calibrate on the chess corners.


def make_charuco_views(n_views=8, seed=0, size=(1280, 720)):
    from aruco_slam_tpu.bench import render
    from aruco_slam_tpu.ops import dictionary

    board = calibrate.charuco_board(7, 5, 0.03, 0.015)
    d = dictionary.load(dictionary.DICT_APRILTAG_36H11)
    bmp = render.charuco_bitmap(board, d, px_per_square=96)
    cam = cam_mod.CameraModel.from_matrix(jnp.asarray(K_TRUE),
                                          jnp.asarray(DIST_TRUE))
    rng = np.random.default_rng(seed)
    ex, ey = 7 * 0.03, 5 * 0.03
    center = np.array([ex / 2, ey / 2, 0.0])
    flip = Rotation.from_euler("x", np.pi).as_matrix()  # face the cam
    poses = []
    for _ in range(n_views):
        rot = Rotation.from_euler(
            "xyz", rng.uniform(-0.35, 0.35, 3)).as_matrix() @ flip
        dist = rng.uniform(0.30, 0.42)
        t = np.array([rng.uniform(-0.02, 0.02),
                      rng.uniform(-0.02, 0.02), dist]) - rot @ center
        poses.append(np.concatenate(
            [Rotation.from_matrix(rot).as_rotvec(), t]))
    views = render.render_plane_views(bmp, (ex, ey), cam,
                                      np.asarray(poses), size)
    return board, views


def detect_board(board, views):
    from aruco_slam_tpu.ops import detect, dictionary

    cfg = detect.DetectorConfig(
        dict_name=dictionary.DICT_APRILTAG_36H11, capacity=32,
        max_candidates=48, downscale=2, min_area=25)
    det = detect.detect_markers_batch(jnp.asarray(views), cfg)
    mask = np.asarray(det.mask)[:, board.layout.ids]
    corners = np.asarray(det.corners)[:, board.layout.ids]
    return corners, mask


def test_charuco_end_to_end():
    from aruco_slam_tpu.ops import detect

    board, views = make_charuco_views()
    corners, mask = detect_board(board, views)
    assert (mask.sum(-1) >= 12).all(), mask.sum(-1)

    chess_px, chess_mask = calibrate.interpolate_chess_corners(
        board, corners, mask)
    assert (chess_mask.sum(-1) >= 15).all(), chess_mask.sum(-1)
    for i in range(len(views)):
        ref = np.asarray(detect.refine_corners(
            jnp.asarray(views[i], jnp.float32),
            jnp.asarray(chess_px[i], jnp.float32)))
        chess_px[i][chess_mask[i]] = ref[chess_mask[i]]

    res = calibrate.calibrate_charuco(board, corners, mask, chess_px,
                                      chess_mask, SIZE, iters=60)
    assert res.rms_px < 0.6, res.rms_px
    np.testing.assert_allclose(res.camera_matrix[0, 0], 900.0,
                               rtol=0.015)
    np.testing.assert_allclose(res.camera_matrix[1, 1], 905.0,
                               rtol=0.015)
    np.testing.assert_allclose(res.camera_matrix[0, 2], 640.0, atol=6)
    np.testing.assert_allclose(res.camera_matrix[1, 2], 360.0, atol=6)


def test_charuco_interpolation_matches_cv2():
    """Our interpolated chessboard corners vs cv2's CharucoDetector on
    the same rendered views."""
    import cv2

    board, views = make_charuco_views(n_views=3, seed=5)
    corners, mask = detect_board(board, views)
    chess_px, chess_mask = calibrate.interpolate_chess_corners(
        board, corners, mask)

    cvdict = cv2.aruco.getPredefinedDictionary(
        cv2.aruco.DICT_APRILTAG_36h11)
    cvboard = cv2.aruco.CharucoBoard((7, 5), 0.03, 0.015, cvdict)
    cvdet = cv2.aruco.CharucoDetector(cvboard)
    checked = 0
    for i in range(len(views)):
        cc, cids, _, _ = cvdet.detectBoard(views[i])
        if cids is None:
            continue
        cc = cc.reshape(-1, 2)
        for k, cid in enumerate(cids.reshape(-1)):
            # charuco_board uses cv2's interior-corner id order
            # (row-major from the printed top-left)
            if not chess_mask[i, int(cid)]:
                continue
            err = np.linalg.norm(chess_px[i, int(cid)] - cc[k])
            assert err < 1.0, (i, cid, err)
            checked += 1
    assert checked > 30, checked


def test_cli_end_to_end_with_preview(tmp_path):
    """apps.calibrate on rendered ChArUco views: the reference's full
    workflow — calibrate from board images, save .npy artifacts, write
    undistorted previews (reference
    calibration/charuco_calibration.py:33-95)."""
    from aruco_slam_tpu.apps import calibrate as cli

    _, views = make_charuco_views(n_views=5, seed=7)
    npz = tmp_path / "views.npz"
    np.savez_compressed(npz, images=views)
    out = tmp_path / "calib"
    cli.main(["--images", str(npz), "--board", "charuco",
              "--grid", "7x5", "--square-size", "0.03",
              "--marker-size", "0.015", "--dict", "apriltag_36h11",
              "--out", str(out), "--iters", "40", "--preview", "2"])
    k = np.load(out / "camera_matrix.npy")
    d = np.load(out / "dist_coeffs.npy")
    np.testing.assert_allclose(k[0, 0], 900.0, rtol=0.03)
    np.testing.assert_allclose(k[1, 2], 360.0, atol=12)
    assert d.shape[-1] == 5
    previews = sorted((out / "preview").glob("undistorted_*.png"))
    assert len(previews) == 2
    import imageio.v3 as iio
    im = iio.imread(previews[0])
    assert im.shape == views[0].shape and im.max() > 100
