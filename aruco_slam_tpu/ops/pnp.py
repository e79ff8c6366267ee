"""Batched planar PnP: homography + IPPE-square + Gauss-Newton refine.

TPU-native replacement for the reference's per-marker host loop around
``cv2.solvePnP(..., flags=SOLVEPNP_IPPE_SQUARE)`` (reference
filters/base_filter.py:125-171). The whole pipeline is expressed as
dense batched linear algebra — an (M, 8, 8) homography solve, a
closed-form 2x2 spectral decomposition, an (M, 3, 3) translation solve
and a fixed-iteration 6x6 Gauss-Newton polish — so M markers across B
frames solve as one XLA computation with no data-dependent shapes.

Method: "Infinitesimal Plane-based Pose Estimation" (IPPE), Collins &
Bartoli 2014 — the same algorithm OpenCV's IPPE_SQUARE implements.
Both pose solutions of the planar two-fold ambiguity are constructed
and disambiguated by reprojection error, then the winner is polished
with a few damped Gauss-Newton iterations on the reprojection residual
(replacing OpenCV's iterative refinement).

Conventions: object/marker frame has the tag in the z=0 plane with
corners in IPPE_SQUARE order (TL, TR, BR, BL — reference
filters/base_filter.py:112-120); the returned pose maps marker
coordinates to camera coordinates: x_cam = R x_obj + t.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from aruco_slam_tpu.core import camera as cam_mod
from aruco_slam_tpu.core import quaternion as quat
from aruco_slam_tpu.ops import linalg as small

_EPS = 1e-12


class PnPResult(NamedTuple):
    """Batched solution; leading axes match the input batch."""

    t_cl: jnp.ndarray   # (..., 3) marker origin in camera frame
    q_cl: jnp.ndarray   # (..., 4) wxyz marker-to-camera rotation
    rvec: jnp.ndarray   # (..., 3) rotation vector (OpenCV rvec parity)
    err: jnp.ndarray    # (..., ) RMS reprojection error, *pixels*
    err2: jnp.ndarray   # (..., ) RMS error of the rejected solution


def square_object_points(marker_size) -> jnp.ndarray:
    """Canonical square corners (4, 3), IPPE_SQUARE order."""
    s = marker_size / 2.0
    return jnp.asarray(
        [[-s, s, 0.0], [s, s, 0.0], [s, -s, 0.0], [-s, -s, 0.0]])


def homography_4pt(obj_xy: jnp.ndarray, img_xy: jnp.ndarray) -> jnp.ndarray:
    """DLT homography from exactly 4 correspondences.

    obj_xy: (4, 2) plane coordinates; img_xy: (4, 2) normalized image
    coordinates. Returns (3, 3) with H[2,2] = 1.
    """
    x, y = obj_xy[:, 0], obj_xy[:, 1]
    u, v = img_xy[:, 0], img_xy[:, 1]
    zeros = jnp.zeros_like(x)
    ones = jnp.ones_like(x)
    rows_u = jnp.stack(
        [x, y, ones, zeros, zeros, zeros, -u * x, -u * y], axis=-1)
    rows_v = jnp.stack(
        [zeros, zeros, zeros, x, y, ones, -v * x, -v * y], axis=-1)
    a = jnp.concatenate([rows_u, rows_v], axis=0)      # (8, 8)
    b = jnp.concatenate([u, v], axis=0)                # (8,)
    # normal-equation solve with an unrolled 8x8 Cholesky: batches of
    # tiny LU solves serialize badly on TPU (see ops/linalg.py)
    h = small.solve_normal(a, b)
    return jnp.concatenate([h, jnp.ones(1, h.dtype)]).reshape(3, 3)


def _rotation_to_ray(d: jnp.ndarray) -> jnp.ndarray:
    """Rotation matrix taking e_z to the unit vector d (Rodrigues).

    Safe when d ≈ e_z (identity) — uses the (I + [k]x + [k]x²/(1+cosθ))
    form, singular only at d = -e_z which cannot occur for a visible
    plane point (positive depth).
    """
    c = d[2]
    # [k]x with k = e_z × d = (-d1, d0, 0)
    kx = jnp.array(
        [[0.0, 0.0, d[0]],
         [0.0, 0.0, d[1]],
         [-d[0], -d[1], 0.0]], dtype=d.dtype)
    return (jnp.eye(3, dtype=d.dtype) + kx
            + kx @ kx / jnp.maximum(1.0 + c, 1e-6))


def _ippe_rotations(h: jnp.ndarray):
    """Both rotation solutions of IPPE from a normalized homography."""
    h = h / h[2, 2]
    u0, v0 = h[0, 2], h[1, 2]
    # rotate the camera so the origin's ray is the optical axis
    s = jnp.stack([u0, v0, jnp.ones((), h.dtype)])
    d = s / jnp.linalg.norm(s)
    rv = _rotation_to_ray(d)
    # homography in the rotated camera: its image of the origin is
    # (0, 0), so its 2x2 Jacobian at the origin is simply
    # A = H'[0:2, 0:2] / H'[2, 2] with H' = Rvᵀ H.
    hp = rv.T @ h
    a = hp[:2, :2] / hp[2, 2]
    # gamma = 1 / sigma_max(A); closed-form 2x2 spectral radius
    g = a.T @ a
    tr = g[0, 0] + g[1, 1]
    det = g[0, 0] * g[1, 1] - g[0, 1] * g[1, 0]
    disc = jnp.sqrt(jnp.maximum(tr * tr - 4.0 * det, 0.0))
    sig_max_sq = 0.5 * (tr + disc)
    gamma = 1.0 / jnp.sqrt(jnp.maximum(sig_max_sq, _EPS))
    ga = gamma * a
    gg = gamma * gamma
    c1 = jnp.sqrt(jnp.maximum(1.0 - gg * g[0, 0], 0.0))
    c2m = jnp.sqrt(jnp.maximum(1.0 - gg * g[1, 1], 0.0))
    c2 = jnp.where(g[0, 1] > 0, -c2m, c2m)  # c1*c2 = -gamma² g12

    def build(c1v, c2v):
        col1 = jnp.stack([ga[0, 0], ga[1, 0], c1v])
        col2 = jnp.stack([ga[0, 1], ga[1, 1], c2v])
        col3 = jnp.cross(col1, col2)
        rp = jnp.stack([col1, col2, col3], axis=-1)
        return rv @ rp

    return build(c1, c2), build(-c1, -c2)


def _solve_translation(r: jnp.ndarray, obj: jnp.ndarray,
                       img_xy: jnp.ndarray) -> jnp.ndarray:
    """Least-squares translation given rotation: for each point,
    (r1·X + t1) − u (r3·X + t3) = 0 and likewise for v — 8 linear
    equations in t, solved via 3x3 normal equations."""
    rx = obj @ r.T  # (4, 3) rotated object points
    u = img_xy[:, 0]
    v = img_xy[:, 1]
    ones = jnp.ones_like(u)
    zeros = jnp.zeros_like(u)
    a = jnp.concatenate([
        jnp.stack([ones, zeros, -u], axis=-1),
        jnp.stack([zeros, ones, -v], axis=-1),
    ], axis=0)  # (8, 3)
    b = jnp.concatenate([u * rx[:, 2] - rx[:, 0],
                         v * rx[:, 2] - rx[:, 1]], axis=0)
    return small.solve_normal(a, b)


def _reproj_rms_normalized(r, t, obj, img_xy):
    pts = obj @ r.T + t
    z = jnp.maximum(pts[:, 2], 1e-6)
    proj = pts[:, :2] / z[:, None]
    # penalize non-positive depth so such solutions always lose
    penalty = jnp.sum(jnp.maximum(0.3 - pts[:, 2], 0.0)) * 1e3
    return jnp.sqrt(jnp.mean(jnp.sum((proj - img_xy) ** 2, -1))) + penalty


def _gn_refine(r, t, obj, img_xy, iters: int, damping: float = 1e-9):
    """Fixed-iteration damped Gauss-Newton on the normalized-coordinate
    reprojection residual; parameters are [δθ (left rotvec), δt].

    Jacobians are analytic — for p = Exp(δθ) R X + (t + δt):
        ∂π/∂p = [[1/z, 0, −x/z²], [0, 1/z, −y/z²]],
        ∂p/∂δθ = −[R X]ₓ,   ∂p/∂δt = I
    — so each iteration is a handful of fused elementwise ops plus an
    unrolled 6x6 SPD solve (no AD re-evaluation of the projection).
    """

    def body(_, carry):
        r0, t0 = carry
        rx = obj @ r0.T                      # (4, 3)
        pts = rx + t0
        z = jnp.maximum(pts[:, 2], 1e-6)
        inv_z = 1.0 / z
        proj = pts[:, :2] * inv_z[:, None]
        res = (proj - img_xy).reshape(-1)    # (8,)
        # dπ/dp rows per point: (4, 2, 3)
        zero = jnp.zeros_like(inv_z)
        dpi = jnp.stack([
            jnp.stack([inv_z, zero, -proj[:, 0] * inv_z], -1),
            jnp.stack([zero, inv_z, -proj[:, 1] * inv_z], -1),
        ], 1)
        # dp/dδθ = -[rx]ₓ : (4, 3, 3)
        rx_x, rx_y, rx_z = rx[:, 0], rx[:, 1], rx[:, 2]
        z4 = jnp.zeros_like(rx_x)
        skew = jnp.stack([
            jnp.stack([z4, -rx_z, rx_y], -1),
            jnp.stack([rx_z, z4, -rx_x], -1),
            jnp.stack([-rx_y, rx_x, z4], -1),
        ], 1)
        j_rot = -jnp.einsum("pij,pjk->pik", dpi, skew)   # (4, 2, 3)
        jac = jnp.concatenate([j_rot, dpi], -1).reshape(8, 6)
        jtj = jac.T @ jac + damping * jnp.eye(6, dtype=r0.dtype)
        delta = small.solve_spd(jtj, -(jac.T @ res))
        r1 = quat.to_matrix(quat.from_rotvec(delta[:3])) @ r0
        t1 = t0 + delta[3:]
        return (r1, t1)

    return jax.lax.fori_loop(0, iters, body, (r, t))


def solve_square_pnp_normalized(img_xy: jnp.ndarray, marker_size,
                                refine_iters: int = 8) -> PnPResult:
    """IPPE-square PnP from normalized (undistorted) corner coords.

    img_xy: (4, 2). Use `solve_square_pnp` for pixel input. The `err`
    fields here are in normalized coordinates.
    """
    obj = square_object_points(marker_size).astype(img_xy.dtype)
    h = homography_4pt(obj[:, :2], img_xy)
    r1, r2 = _ippe_rotations(h)
    t1 = _solve_translation(r1, obj, img_xy)
    t2 = _solve_translation(r2, obj, img_xy)
    # Refine BOTH ambiguity candidates, then pick by final error:
    # near-degenerate views can put the closed-form winner in the wrong
    # basin, where Gauss-Newton stalls at a poor local minimum. The two
    # candidates refine as one stacked batch (halves sequential depth).
    rs, ts = jax.vmap(
        lambda rr, tt: _gn_refine(rr, tt, obj, img_xy, refine_iters)
    )(jnp.stack([r1, r2]), jnp.stack([t1, t2]))
    r1, t1 = rs[0], ts[0]
    r2, t2 = rs[1], ts[1]
    e1 = _reproj_rms_normalized(r1, t1, obj, img_xy)
    e2 = _reproj_rms_normalized(r2, t2, obj, img_xy)
    best_first = e1 <= e2
    r = jnp.where(best_first, r1, r2)
    t = jnp.where(best_first, t1, t2)
    err = jnp.where(best_first, e1, e2)
    q = quat.from_matrix(r)
    return PnPResult(t_cl=t, q_cl=q, rvec=quat.to_rotvec(q), err=err,
                     err2=jnp.where(best_first, e2, e1))


def solve_square_pnp(cam: cam_mod.CameraModel, corners_px: jnp.ndarray,
                     marker_size, refine_iters: int = 8) -> PnPResult:
    """Batched IPPE-square PnP from distorted pixel corners.

    corners_px: (..., 4, 2) in IPPE_SQUARE order. All leading batch
    dims are vmapped; the per-marker work is 8x8 + 3x3 + 6x6 solves.
    Reported errors are converted to approximate pixels using the mean
    focal length.
    """
    xy = cam_mod.pixel_to_ray(cam, corners_px)
    batch = xy.shape[:-2]
    flat = xy.reshape((-1, 4, 2))
    res = jax.vmap(
        lambda c: solve_square_pnp_normalized(c, marker_size, refine_iters)
    )(flat)
    f = 0.5 * (cam.fx + cam.fy)
    return PnPResult(
        t_cl=res.t_cl.reshape(*batch, 3),
        q_cl=res.q_cl.reshape(*batch, 4),
        rvec=res.rvec.reshape(*batch, 3),
        err=(res.err * f).reshape(batch),
        err2=(res.err2 * f).reshape(batch),
    )
