"""Camera calibration from planar marker-board views (batched LM).

The capability of the reference's ChArUco calibration tool
(reference calibration/charuco_calibration.py:33-77 →
cv2.aruco.calibrateCameraCharuco): estimate intrinsics
(fx, fy, cx, cy) + 5-term distortion from multiple views of a known
planar board of markers. TPU-shaped: one Levenberg-Marquardt problem
over [intrinsics(9), per-view poses(6V)] with all views' reprojection
residuals evaluated as one batched computation and the (small, dense)
normal equations solved by Cholesky.

Initialization is Zhang-style: per-view plane homographies give the
focal length from the orthonormality constraints (principal point
assumed at the image center, zero skew), then poses from IPPE.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from aruco_slam_tpu.core import camera as cam_mod
from aruco_slam_tpu.core import quaternion as quat
from aruco_slam_tpu.ops import linalg as small
from aruco_slam_tpu.ops import pnp


class BoardLayout(NamedTuple):
    """Planar marker board: per marker id, the 4 corner positions in
    board coordinates (z = 0), IPPE corner order."""

    ids: np.ndarray       # (M,)
    corners: np.ndarray   # (M, 4, 2) board-plane xy


def grid_board(nx: int, ny: int, marker_size: float, gap: float,
               first_id: int = 0) -> BoardLayout:
    """nx × ny grid of markers (like cv2.aruco.GridBoard)."""
    ids, corners = [], []
    pitch = marker_size + gap
    s = marker_size
    for gy in range(ny):
        for gx in range(nx):
            x0 = gx * pitch
            y0 = gy * pitch
            # TL TR BR BL with y up in board frame
            corners.append([[x0, y0 + s], [x0 + s, y0 + s],
                            [x0 + s, y0], [x0, y0]])
            ids.append(first_id + gy * nx + gx)
    return BoardLayout(np.asarray(ids, np.int32),
                       np.asarray(corners, np.float64))


class CalibrationResult(NamedTuple):
    camera_matrix: np.ndarray  # (3, 3)
    dist_coeffs: np.ndarray    # (5,)
    rms_px: float
    per_view_rms: np.ndarray   # (V,)


def _zhang_focal_init(homs: np.ndarray, cx: float, cy: float) -> float:
    """Focal estimate from plane homographies (zero skew, centered
    principal point): with K = diag(f, f, 1) shifted by (cx, cy),
    h1ᵀ ω h2 = 0 and h1ᵀ ω h1 = h2ᵀ ω h2, ω = K⁻ᵀK⁻¹."""
    rows, rhs = [], []
    for h in homs:
        # shift principal point so K = diag(f, f, 1)
        t = np.array([[1, 0, -cx], [0, 1, -cy], [0, 0, 1.0]])
        hh = t @ h
        h1, h2 = hh[:, 0], hh[:, 1]

        def w_terms(a, b):
            # aᵀ diag(1/f², 1/f², 1) b = (a0 b0 + a1 b1)/f² + a2 b2
            return a[0] * b[0] + a[1] * b[1], a[2] * b[2]

        c1, d1 = w_terms(h1, h2)
        rows.append(c1)
        rhs.append(-d1)
        c2a, d2a = w_terms(h1, h1)
        c2b, d2b = w_terms(h2, h2)
        rows.append(c2a - c2b)
        rhs.append(-(d2a - d2b))
    rows = np.asarray(rows)
    rhs = np.asarray(rhs)
    denom = float(rows @ rows)
    if denom < 1e-12:
        return 1000.0
    inv_f2 = float(rows @ rhs) / denom
    if inv_f2 <= 1e-12:
        return 1000.0
    return 1.0 / np.sqrt(inv_f2)


def calibrate(board: BoardLayout, view_corners: np.ndarray,
              view_mask: np.ndarray, image_size: tuple[int, int],
              iters: int = 40) -> CalibrationResult:
    """Calibrate from detected marker corners across views.

    view_corners: (V, M, 4, 2) pixel corners per view per board marker
    (aligned with board.ids); view_mask: (V, M) detected flags.
    """
    v, m = view_mask.shape
    w, h = image_size
    cx0, cy0 = w / 2.0, h / 2.0

    # --- initialization: homography per view over detected corners ---
    homs = []
    for i in range(v):
        det = np.where(view_mask[i])[0]
        if len(det) < 2:
            homs.append(None)
            continue
        src = board.corners[det].reshape(-1, 2)
        dst = view_corners[i, det].reshape(-1, 2)
        # DLT with all points (normal equations, 8 unknowns)
        a_rows, b_rows = [], []
        for (x, y), (u, vv) in zip(src, dst):
            a_rows.append([x, y, 1, 0, 0, 0, -u * x, -u * y])
            b_rows.append(u)
            a_rows.append([0, 0, 0, x, y, 1, -vv * x, -vv * y])
            b_rows.append(vv)
        a = np.asarray(a_rows)
        b = np.asarray(b_rows)
        hvec, *_ = np.linalg.lstsq(a, b, rcond=None)
        homs.append(np.append(hvec, 1.0).reshape(3, 3))
    valid_views = [i for i, hh in enumerate(homs) if hh is not None]
    f0 = _zhang_focal_init([homs[i] for i in valid_views], cx0, cy0)

    cam0 = cam_mod.CameraModel.from_matrix(
        jnp.asarray([[f0, 0, cx0], [0, f0, cy0], [0, 0, 1.0]]),
        jnp.zeros(5))
    # per-view pose init via IPPE on the first detected marker
    pose0 = np.zeros((v, 6))
    pose0[:, 5] = 1.0  # z offset placeholder
    for i in valid_views:
        j = int(np.where(view_mask[i])[0][0])
        res = pnp.solve_square_pnp_normalized(
            jnp.asarray(cam_mod.pixel_to_ray(
                cam0, jnp.asarray(view_corners[i, j]))),
            float(np.linalg.norm(board.corners[j][0]
                                 - board.corners[j][1])))
        # lift the marker pose to the board pose: the marker frame is
        # centered on the marker, the board frame on its own origin,
        # both in the same plane — board point p maps to the camera as
        # R (p − center_j) + t.
        r = np.asarray(quat.to_matrix(res.q_cl))
        t = np.asarray(res.t_cl)
        center_board = np.array([*board.corners[j].mean(0), 0.0])
        pose0[i, :3] = np.asarray(quat.to_rotvec(res.q_cl))
        pose0[i, 3:] = t - r @ center_board
    params0 = jnp.concatenate([
        jnp.asarray([f0, f0, cx0, cy0, 0, 0, 0, 0, 0], jnp.float64),
        jnp.asarray(pose0.reshape(-1), jnp.float64)])

    board_pts = jnp.asarray(
        np.concatenate([board.corners,
                        np.zeros((m, 4, 1))], -1))  # (M, 4, 3)
    obs = jnp.asarray(view_corners, jnp.float64)    # (V, M, 4, 2)
    msk = jnp.asarray(view_mask)

    def residuals(params):
        intr = params[:9]
        cam = cam_mod.CameraModel(
            fx=intr[0], fy=intr[1], cx=intr[2], cy=intr[3],
            dist=intr[4:9])
        poses = params[9:].reshape(v, 6)
        rot = quat.to_matrix(quat.from_rotvec(poses[:, :3]))  # (V,3,3)
        pts = jnp.einsum("vab,mkb->vmka", rot, board_pts) \
            + poses[:, None, None, 3:]
        proj = cam_mod.project(cam, pts)
        r = (proj - obs) * msk[:, :, None, None]
        return r.reshape(-1)

    @jax.jit
    def lm_step(params, lam, cost):
        r = residuals(params)
        jac = jax.jacfwd(residuals)(params)
        jtj = jac.T @ jac
        jtj = jtj + lam * jnp.diag(jnp.diag(jtj) + 1e-9)
        delta = jnp.linalg.solve(jtj, -(jac.T @ r))
        trial = params + delta
        new_cost = jnp.sum(residuals(trial) ** 2)
        accept = new_cost < cost
        params = jnp.where(accept, trial, params)
        lam = jnp.where(accept, lam * 0.3, lam * 3.0)
        cost = jnp.where(accept, new_cost, cost)
        return params, jnp.clip(lam, 1e-10, 1e8), cost

    params = params0
    lam = jnp.asarray(1e-3, jnp.float64)
    cost = jnp.sum(residuals(params) ** 2)
    for _ in range(iters):
        params, lam, cost = lm_step(params, lam, cost)

    intr = np.asarray(params[:9])
    k = np.array([[intr[0], 0, intr[2]], [0, intr[1], intr[3]],
                  [0, 0, 1.0]])
    n_obs = float(np.asarray(msk).sum() * 8)
    r = np.asarray(residuals(params)).reshape(v, m, 4, 2)
    per_view = np.sqrt(
        (r ** 2).sum((-1, -2, -3))
        / np.maximum(np.asarray(msk).sum(-1) * 4, 1))
    rms = float(np.sqrt(np.sum(r ** 2) / max(n_obs / 2, 1)))
    return CalibrationResult(k, intr[4:9], rms, per_view)
