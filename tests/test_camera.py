"""core.camera vs OpenCV projectPoints/undistortPoints oracle."""

import cv2
import numpy as np

from aruco_slam_tpu.core import camera

# Intrinsics matching the reference's calibration artifacts
# (reference calibration/camera_matrix.npy: f~1415, c=(967.0, 544.3)).
K = np.array([[1414.9, 0.0, 967.0], [0.0, 1414.9, 544.3], [0.0, 0.0, 1.0]])
DIST = np.array([0.0614, -0.2951, 0.0005, 0.0029, 0.4387])


def make_cam():
    return camera.CameraModel.from_matrix(K, DIST)


def test_project_matches_cv2():
    cam = make_cam()
    rng = np.random.default_rng(0)
    pts = rng.uniform([-1, -1, 1.5], [1, 1, 6.0], size=(200, 3))
    ours = np.asarray(camera.project(cam, pts))
    theirs, _ = cv2.projectPoints(
        pts, np.zeros(3), np.zeros(3), K, DIST
    )
    np.testing.assert_allclose(ours, theirs.reshape(-1, 2), atol=1e-6)


def test_undistort_matches_cv2():
    cam = make_cam()
    rng = np.random.default_rng(1)
    uv = rng.uniform([100, 100], [1820, 980], size=(200, 2))
    ours = np.asarray(camera.pixel_to_ray(cam, uv, iters=12))
    theirs = cv2.undistortPoints(
        uv.reshape(-1, 1, 2), K, DIST
    ).reshape(-1, 2)
    np.testing.assert_allclose(ours, theirs, atol=1e-6)


def test_distort_undistort_roundtrip():
    cam = make_cam()
    rng = np.random.default_rng(2)
    xy = rng.uniform(-0.4, 0.4, size=(500, 2))
    xy_d = np.asarray(camera.distort(cam, xy))
    back = np.asarray(camera.undistort(cam, xy_d, iters=12))
    np.testing.assert_allclose(back, xy, atol=1e-9)


def test_camera_matrix_roundtrip():
    cam = make_cam()
    np.testing.assert_allclose(np.asarray(cam.matrix()), K)


def test_undistort_image_matches_cv2():
    # smooth test image so bilinear-interpolation differences between
    # our remap and cv2's fixed-point remap stay sub-quantum
    cam = make_cam()
    h, w = 270, 480
    k = K.copy()
    k[0, 0] = k[1, 1] = 1414.9 / 4.0
    k[0, 2] = w / 2.0
    k[1, 2] = h / 2.0
    cam = camera.CameraModel.from_matrix(k, DIST)
    yy, xx = np.mgrid[:h, :w].astype(np.float32)
    img = (127 + 90 * np.sin(xx / 37.0) * np.cos(yy / 23.0)
           ).astype(np.uint8)
    ours = np.asarray(camera.undistort_image(cam, img)).astype(np.float32)
    theirs = cv2.undistort(img, k, DIST).astype(np.float32)
    # ignore the border band (cv2 extrapolates the map outside the
    # valid region slightly differently); interior must agree
    s = np.s_[8:-8, 8:-8]
    assert np.abs(ours[s] - theirs[s]).mean() < 0.5
    assert np.abs(ours[s] - theirs[s]).max() <= 2.0
