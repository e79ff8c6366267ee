"""Synthetic grayscale frame renderer for detection tests/benches.

Rasterizes the scene's markers (with their black borders) into
camera frames via inverse homography warping, including lens
distortion — ground truth for the image-domain detector, replacing the
reference's unavailable demo video. Host-side scaffolding.
"""

from __future__ import annotations

import numpy as np
import jax.numpy as jnp

from aruco_slam_tpu.bench.synthetic import (
    Scene, Trajectory, _quat_conj, _quat_mul, _quat_rotate,
    canonical_corners)
from aruco_slam_tpu.core import camera as cam_mod
from aruco_slam_tpu.ops import dictionary as dict_mod

BACKGROUND = 178  # light gray


def _undistort_map(cam, w, h):
    """Per-pixel undistorted normalized coords (H, W, 2), computed once."""
    uv = np.stack(np.meshgrid(np.arange(w, dtype=np.float64),
                              np.arange(h, dtype=np.float64)), -1)
    return np.asarray(cam_mod.pixel_to_ray(
        cam, jnp.asarray(uv.reshape(-1, 2)), iters=10)).reshape(h, w, 2)


def render_frame(scene: Scene, cam_q, cam_t, cam, norm_map,
                 d: dict_mod.Dictionary, marker_ids=None,
                 background: np.ndarray | None = None) -> np.ndarray:
    """``background``: optional (H, W) uint8 canvas (e.g.
    bench/degrade.clutter_background); markers render on top."""
    h, w = norm_map.shape[:2]
    img = np.full((h, w), BACKGROUND, np.uint8) \
        if background is None else background.copy()
    m = len(scene.marker_pos)
    ids = np.arange(m) if marker_ids is None else marker_ids
    cq_inv = _quat_conj(np.asarray(cam_q))
    rel_t = _quat_rotate(cq_inv[None], scene.marker_pos - np.asarray(cam_t))
    rel_q = _quat_mul(cq_inv[None], scene.marker_quat)
    s = scene.marker_size
    nbits = d.marker_bits
    cells = nbits + 2  # payload + border
    obj = canonical_corners(s)

    for j in range(m):
        if rel_t[j, 2] < 0.15:
            continue
        # marker plane basis in camera frame
        rq = rel_q[j]
        ex = _quat_rotate(rq[None], np.array([[1.0, 0, 0]]))[0]
        ey = _quat_rotate(rq[None], np.array([[0, 1.0, 0]]))[0]
        org = rel_t[j]
        # facing check
        ez = np.cross(ex, ey)
        if np.dot(ez, org) >= 0:
            continue
        # projected bbox of the corners
        pts = _quat_rotate(rq[None], obj) + org
        px = np.asarray(cam_mod.project(cam, jnp.asarray(pts)))
        x0 = int(max(np.floor(px[:, 0].min()) - 2, 0))
        x1 = int(min(np.ceil(px[:, 0].max()) + 3, w))
        y0 = int(max(np.floor(px[:, 1].min()) - 2, 0))
        y1 = int(min(np.ceil(px[:, 1].max()) + 3, h))
        if x1 <= x0 or y1 <= y0:
            continue
        # inverse map: normalized ray -> plane coords
        nm = norm_map[y0:y1, x0:x1]  # (bh, bw, 2)
        # ray r = (x, y, 1); intersect plane {org + a ex + b ey}:
        # solve [ex ey -r] [a b t]^T = -org
        bh, bw = nm.shape[:2]
        rays = np.concatenate([nm, np.ones((bh, bw, 1))], -1)
        a_mat = np.empty((bh, bw, 3, 3))
        a_mat[..., :, 0] = ex
        a_mat[..., :, 1] = ey
        a_mat[..., :, 2] = -rays
        rhs = np.broadcast_to(-org, (bh, bw, 3))
        try:
            sol = np.linalg.solve(a_mat, rhs[..., None])[..., 0]
        except np.linalg.LinAlgError:
            continue
        a, b, depth = sol[..., 0], sol[..., 1], sol[..., 2]
        inside = (np.abs(a) <= s / 2) & (np.abs(b) <= s / 2) & (depth > 0)
        # cell lookup: plane coords -> cell grid (border included).
        # Marker-frame y is UP; image rows of the bit pattern go down
        # from the top-left corner (-s/2, +s/2).
        cx = ((a + s / 2) / s * cells).astype(np.int64).clip(0, cells - 1)
        cy = ((s / 2 - b) / s * cells).astype(np.int64).clip(0, cells - 1)
        pattern = np.zeros((cells, cells), np.uint8)
        pattern[1:-1, 1:-1] = d.bits[ids[j] % d.num_markers]
        val = pattern[cy, cx] * 255
        region = img[y0:y1, x0:x1]
        region[inside] = val[inside]

    return img


def render_sequence(scene: Scene, traj: Trajectory, cam,
                    dict_name: str = dict_mod.DICT_5X5_50,
                    image_size=(1920, 1080),
                    background: np.ndarray | None = None,
                    marker_ids=None) -> np.ndarray:
    """marker_ids: dictionary id per scene marker (default: marker j
    renders id j)."""
    w, h = image_size
    d = dict_mod.load(dict_name)
    norm_map = _undistort_map(cam, w, h)
    frames = np.empty((len(traj.times), h, w), np.uint8)
    for i in range(len(traj.times)):
        frames[i] = render_frame(scene, traj.cam_q[i], traj.cam_t[i],
                                 cam, norm_map, d,
                                 marker_ids=marker_ids,
                                 background=background)
    return frames


def charuco_bitmap(board, d: dict_mod.Dictionary,
                   px_per_square: int = 64) -> np.ndarray:
    """Rasterize a ChArUco board (ops/calibrate.CharucoBoard) to a
    uint8 bitmap; row 0 = top of the board (max board y)."""
    sx, sy = board.squares_x, board.squares_y
    pps = px_per_square
    bmp = np.empty((sy * pps, sx * pps), np.uint8)
    for gy in range(sy):
        for gx in range(sx):
            black = (gx + (sy - 1 - gy)) % 2 == 0  # printed TL black
            r0 = (sy - 1 - gy) * pps
            bmp[r0:r0 + pps, gx * pps:(gx + 1) * pps] = \
                0 if black else 255
    # markers with their black borders into the white squares
    cells = d.marker_bits + 2
    ml_frac = board.marker_len / board.square_len
    mpx = max(int(round(ml_frac * pps)), cells)
    off = (pps - mpx) // 2
    idx = (np.arange(mpx) * cells) // mpx
    for mi, bid in enumerate(board.layout.ids):
        center = board.layout.corners[mi].mean(0)
        gx = int(center[0] // board.square_len)
        gy = int(center[1] // board.square_len)
        pattern = np.zeros((cells, cells), np.uint8)
        pattern[1:-1, 1:-1] = d.bits[bid % d.num_markers]
        tile = pattern[np.ix_(idx, idx)] * 255
        r0 = (sy - 1 - gy) * pps + off
        c0 = gx * pps + off
        bmp[r0:r0 + mpx, c0:c0 + mpx] = tile
    return bmp


def render_plane_views(bitmap: np.ndarray, extent: tuple[float, float],
                       cam, view_poses: np.ndarray,
                       image_size=(1280, 720)) -> np.ndarray:
    """Render a planar bitmap (board frame: x right, y up, z out;
    origin at the bottom-left, physical size ``extent`` = (ex, ey))
    into camera views. view_poses: (V, 6) rotvec+tvec with
    p_cam = R p_board + t (ops/calibrate pose convention). Ground
    truth for the ChArUco calibration pipeline tests."""
    from aruco_slam_tpu.core import quaternion as quat_mod
    import jax.numpy as _jnp

    w, h = image_size
    ex, ey = extent
    bh, bw = bitmap.shape
    norm_map = _undistort_map(cam, w, h)
    views = np.empty((len(view_poses), h, w), np.uint8)
    for i, pose in enumerate(view_poses):
        q = np.asarray(quat_mod.from_rotvec(_jnp.asarray(pose[:3])))
        r = np.asarray(quat_mod.to_matrix(_jnp.asarray(q)))
        t = pose[3:]
        exv, eyv, org = r[:, 0], r[:, 1], t
        img = np.full((h, w), BACKGROUND, np.uint8)
        # the pattern is on the board's +z face: visible only when the
        # normal points toward the camera (back views would render a
        # physically impossible mirrored pattern)
        if np.dot(r[:, 2], org) >= 0:
            views[i] = img
            continue
        # project the board's corners for a bbox
        corners3 = np.array([[0, 0, 0], [ex, 0, 0], [ex, ey, 0],
                             [0, ey, 0]]) @ r.T + t
        if (corners3[:, 2] <= 0.05).any():
            views[i] = img
            continue
        px = np.asarray(cam_mod.project(cam, _jnp.asarray(corners3)))
        x0 = int(max(np.floor(px[:, 0].min()) - 2, 0))
        x1 = int(min(np.ceil(px[:, 0].max()) + 3, w))
        y0 = int(max(np.floor(px[:, 1].min()) - 2, 0))
        y1 = int(min(np.ceil(px[:, 1].max()) + 3, h))
        if x1 <= x0 or y1 <= y0:
            views[i] = img
            continue
        nm = norm_map[y0:y1, x0:x1]
        rh, rw = nm.shape[:2]
        rays = np.concatenate([nm, np.ones((rh, rw, 1))], -1)
        a_mat = np.empty((rh, rw, 3, 3))
        a_mat[..., :, 0] = exv
        a_mat[..., :, 1] = eyv
        a_mat[..., :, 2] = -rays
        rhs = np.broadcast_to(-org, (rh, rw, 3))
        sol = np.linalg.solve(a_mat, rhs[..., None])[..., 0]
        a, b, depth = sol[..., 0], sol[..., 1], sol[..., 2]
        inside = (a >= 0) & (a < ex) & (b >= 0) & (b < ey) & (depth > 0)
        cx = np.clip((a / ex * bw).astype(np.int64), 0, bw - 1)
        cy = np.clip(((ey - b) / ey * bh).astype(np.int64), 0, bh - 1)
        region = img[y0:y1, x0:x1]
        region[inside] = bitmap[cy, cx][inside]
        views[i] = img
    return views
