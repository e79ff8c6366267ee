"""Synthetic ArUco-marker scenes with exact ground truth.

Generates: a wall/room of markers, a smooth camera trajectory, and per
frame either
  * pose-level observations (marker pose in camera frame — what PnP
    would output; feeds the filters directly), or
  * corner-level observations (projected pixel corners — feeds the
    PnP solver), or
  * rendered grayscale images (feeds the image-domain detector).

Everything is deterministic per seed. Host-side numpy is fine here —
generation is test/bench scaffolding, not the device hot path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from aruco_slam_tpu.core import camera as cam_mod

DEFAULT_MARKER_SIZE = 0.16  # meters, the reference default
                            # (reference filters/base_filter.py:178)


def canonical_corners(marker_size: float) -> np.ndarray:
    """The 4 corners of a marker in its own plane (z=0), in the
    IPPE_SQUARE order used by the reference (reference
    filters/base_filter.py:112-120): TL, TR, BR, BL."""
    s = marker_size / 2.0
    return np.array(
        [[-s, s, 0.0], [s, s, 0.0], [s, -s, 0.0], [-s, -s, 0.0]])


class Scene(NamedTuple):
    """World-frame ground truth."""

    marker_pos: np.ndarray   # (M, 3)
    marker_quat: np.ndarray  # (M, 4) wxyz, marker-to-world
    marker_size: float


class Trajectory(NamedTuple):
    cam_t: np.ndarray  # (T, 3)
    cam_q: np.ndarray  # (T, 4) wxyz camera-to-world
    times: np.ndarray  # (T,) seconds


class PoseObservations(NamedTuple):
    """Pose-level observations per frame, slot-indexed with mask."""

    t_cl: np.ndarray  # (T, C, 3)
    q_cl: np.ndarray  # (T, C, 4)
    mask: np.ndarray  # (T, C) bool


def _quat_rotate(q, v):
    w = q[..., :1]
    u = q[..., 1:]
    uv = np.cross(u, v)
    return v + 2.0 * (w * uv + np.cross(u, uv))


def _quat_conj(q):
    return q * np.array([1.0, -1.0, -1.0, -1.0])


def _quat_mul(a, b):
    aw, ax, ay, az = np.moveaxis(a, -1, 0)
    bw, bx, by, bz = np.moveaxis(b, -1, 0)
    return np.stack(
        [
            aw * bw - ax * bx - ay * by - az * bz,
            aw * bx + ax * bw + ay * bz - az * by,
            aw * by - ax * bz + ay * bw + az * bx,
            aw * bz + ax * by - ay * bx + az * bw,
        ],
        axis=-1,
    )


def _quat_from_rotvec(rv):
    angle = np.linalg.norm(rv, axis=-1, keepdims=True)
    half = 0.5 * angle
    k = np.where(angle < 1e-9, 0.5, np.sin(half) / np.maximum(angle, 1e-12))
    return np.concatenate([np.cos(half), rv * k], axis=-1)


def make_wall_scene(num_markers: int = 12, seed: int = 0,
                    marker_size: float = DEFAULT_MARKER_SIZE,
                    extent: float = 2.5, depth: float = 3.0) -> Scene:
    """Markers scattered on a rough wall at z≈depth facing the camera
    origin (markers face -z so a camera looking down +z sees them)."""
    rng = np.random.default_rng(seed)
    pos = np.stack(
        [
            rng.uniform(-extent, extent, num_markers),
            rng.uniform(-extent * 0.6, extent * 0.6, num_markers),
            depth + rng.uniform(-0.3, 0.3, num_markers),
        ],
        axis=-1,
    )
    # Marker frame: z out of the marker face. Face the -z direction
    # (toward the camera) with small random tilt.
    base = _quat_from_rotvec(np.array([[np.pi, 0.0, 0.0]]))  # flip z
    tilt = _quat_from_rotvec(rng.normal(scale=0.12, size=(num_markers, 3)))
    return Scene(pos, _quat_mul(tilt, np.broadcast_to(base, (num_markers, 4))),
                 marker_size)


def make_orbit_trajectory(num_frames: int = 300, fps: float = 30.0,
                          radius: float = 0.8, sway: float = 0.4,
                          seed: int = 1) -> Trajectory:
    """Smooth lateral arc with gentle yaw, looking toward +z (the wall).

    Mimics the reference demo's hand-held sweep (~37 s @ 30 fps,
    reference outputs/trajectory.txt).
    """
    t = np.arange(num_frames) / fps
    phase = 2.0 * np.pi * t / t[-1] if num_frames > 1 else np.zeros(1)
    x = radius * np.sin(phase)
    y = 0.15 * np.sin(2.1 * phase)
    z = sway * 0.5 * (1 - np.cos(phase))
    pos = np.stack([x, y, z], axis=-1)
    yaw = 0.25 * np.sin(phase)  # look slightly into the motion
    pitch = 0.06 * np.sin(1.7 * phase)
    q = _quat_mul(
        _quat_from_rotvec(np.stack(
            [np.zeros_like(yaw), yaw, np.zeros_like(yaw)], axis=-1)),
        _quat_from_rotvec(np.stack(
            [pitch, np.zeros_like(pitch), np.zeros_like(pitch)], axis=-1)),
    )
    return Trajectory(pos, q, t)


def make_raster_trajectory(num_frames: int = 600, fps: float = 30.0,
                           extent_x: float = 9.0, extent_y: float = 4.5,
                           rows: int = 3) -> Trajectory:
    """Serpentine sweep across a wide wall, looking toward +z.

    Covers a large map (BASELINE.json config 5's 500-marker wall) the
    way a survey flight would: `rows` back-and-forth passes while the
    height advances continuously (smooth boustrophedon — no teleports
    between rows), so every region of the wall enters the field of
    view at some point while only a bounded strip is visible per
    frame."""
    t = np.arange(num_frames) / fps
    u = np.linspace(0.0, rows, num_frames)  # pass-progress coordinate
    x = -extent_x * np.cos(np.pi * u)
    y = extent_y * (2.0 * u / max(rows, 1) - 1.0)
    z = 0.05 * np.sin(2.0 * np.pi * u)  # gentle depth bob
    pos = np.stack([x, y, z], axis=-1)
    yaw = 0.08 * np.sin(np.pi * u)  # look slightly into the motion
    q = _quat_from_rotvec(np.stack(
        [np.zeros_like(yaw), yaw, np.zeros_like(yaw)], axis=-1))
    return Trajectory(pos, q, t)


def observe_poses(scene: Scene, traj: Trajectory, capacity: int,
                  noise_t: float = 0.0, noise_r: float = 0.0,
                  fov_limit: float = 0.45, max_range: float = 8.0,
                  seed: int = 2) -> PoseObservations:
    """Pose-level observations: marker pose in camera frame per frame.

    Visibility: in front of the camera, within a normalized-coordinate
    cone (|x/z|,|y/z| < fov_limit), within range, and facing the camera.
    """
    rng = np.random.default_rng(seed)
    tn, c = len(traj.times), capacity
    m = len(scene.marker_pos)
    assert m <= c, "capacity must hold all scene markers"

    t_cl = np.zeros((tn, c, 3))
    q_cl = np.zeros((tn, c, 4))
    q_cl[..., 0] = 1.0
    mask = np.zeros((tn, c), dtype=bool)

    for i in range(tn):
        cq, ct = traj.cam_q[i], traj.cam_t[i]
        cq_inv = _quat_conj(cq)
        rel_t = _quat_rotate(cq_inv[None], scene.marker_pos - ct)  # (M,3)
        rel_q = _quat_mul(cq_inv[None], scene.marker_quat)
        z = rel_t[:, 2]
        with np.errstate(divide="ignore", invalid="ignore"):
            visible = (
                (z > 0.2)
                & (np.abs(rel_t[:, 0] / z) < fov_limit)
                & (np.abs(rel_t[:, 1] / z) < fov_limit)
                & (np.linalg.norm(rel_t, axis=-1) < max_range)
            )
        # facing check: marker z-axis (in camera frame) points toward camera
        mz = _quat_rotate(rel_q, np.broadcast_to([0.0, 0.0, 1.0], (m, 3)))
        visible &= np.einsum("md,md->m", mz, rel_t) < 0

        nt = rel_t + rng.normal(scale=noise_t, size=(m, 3))
        nq = _quat_mul(
            _quat_from_rotvec(rng.normal(scale=noise_r, size=(m, 3))), rel_q)
        t_cl[i, :m][visible] = nt[visible]
        q_cl[i, :m][visible] = nq[visible]
        mask[i, :m] = visible

    return PoseObservations(t_cl, q_cl, mask)


def observe_corners(scene: Scene, traj: Trajectory,
                    cam: cam_mod.CameraModel, capacity: int,
                    noise_px: float = 0.0, seed: int = 3,
                    image_size: tuple[int, int] = (1920, 1080)):
    """Corner-level observations: distorted pixel corners per marker.

    Returns (corners (T, C, 4, 2), mask (T, C)); feeds the PnP solver.
    """
    import jax.numpy as jnp

    rng = np.random.default_rng(seed)
    tn, c = len(traj.times), capacity
    m = len(scene.marker_pos)
    obj = canonical_corners(scene.marker_size)  # (4,3)

    corners = np.zeros((tn, c, 4, 2))
    mask = np.zeros((tn, c), dtype=bool)
    w, h = image_size

    for i in range(tn):
        cq, ct = traj.cam_q[i], traj.cam_t[i]
        cq_inv = _quat_conj(cq)
        rel_t = _quat_rotate(cq_inv[None], scene.marker_pos - ct)
        rel_q = _quat_mul(cq_inv[None], scene.marker_quat)
        # corners in camera frame: (M, 4, 3)
        pts = _quat_rotate(rel_q[:, None, :], obj[None]) + rel_t[:, None, :]
        px = np.array(cam_mod.project(cam, jnp.asarray(pts)))
        px += rng.normal(scale=noise_px, size=px.shape)
        in_img = (
            (pts[..., 2] > 0.2).all(-1)
            & (px[..., 0] > 0).all(-1) & (px[..., 0] < w).all(-1)
            & (px[..., 1] > 0).all(-1) & (px[..., 1] < h).all(-1)
        )
        mz = _quat_rotate(rel_q, np.broadcast_to([0.0, 0.0, 1.0], (m, 3)))
        in_img &= np.einsum("md,md->m", mz, rel_t) < 0
        corners[i, :m][in_img] = px[in_img]
        mask[i, :m] = in_img

    return corners, mask
