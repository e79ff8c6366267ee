"""Pinhole camera with 5-term radial-tangential distortion (pure JAX).

Replaces cv2.projectPoints / implicit undistortion inside cv2.solvePnP
used by the reference (reference filters/base_filter.py:156-164,
viewers/viewer_2d.py:129-135).  The model matches OpenCV's:

    x' = x/z, y' = y/z
    r² = x'² + y'²
    radial = 1 + k1 r² + k2 r⁴ + k3 r⁶
    xd = x' radial + 2 p1 x' y' + p2 (r² + 2 x'²)
    yd = y' radial + p1 (r² + 2 y'²) + 2 p2 x' y'
    u = fx xd + cx,  v = fy yd + cy

Distortion coefficients are ordered (k1, k2, p1, p2, k3), exactly the
layout of the reference's ``calibration/dist_coeffs.npy``.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class CameraModel(NamedTuple):
    """Intrinsics + distortion. All fields broadcastable scalars/arrays."""

    fx: jnp.ndarray
    fy: jnp.ndarray
    cx: jnp.ndarray
    cy: jnp.ndarray
    dist: jnp.ndarray  # (5,) = k1, k2, p1, p2, k3

    @classmethod
    def from_matrix(cls, k: jnp.ndarray, dist: jnp.ndarray) -> "CameraModel":
        """Build from a 3x3 intrinsic matrix + (5,) distortion vector."""
        dist = jnp.asarray(dist, dtype=jnp.result_type(k)).reshape(-1)[:5]
        return cls(k[0, 0], k[1, 1], k[0, 2], k[1, 2], dist)

    def matrix(self) -> jnp.ndarray:
        z = jnp.zeros_like(self.fx)
        o = jnp.ones_like(self.fx)
        return jnp.stack(
            [self.fx, z, self.cx, z, self.fy, self.cy, z, z, o], axis=-1
        ).reshape((*jnp.shape(self.fx), 3, 3))


def distort(cam: CameraModel, xy: jnp.ndarray) -> jnp.ndarray:
    """Apply distortion to normalized image coords (..., 2)."""
    k1, k2, p1, p2, k3 = (cam.dist[..., i] for i in range(5))
    x, y = xy[..., 0], xy[..., 1]
    r2 = x * x + y * y
    radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
    xd = x * radial + 2.0 * p1 * x * y + p2 * (r2 + 2.0 * x * x)
    yd = y * radial + p1 * (r2 + 2.0 * y * y) + 2.0 * p2 * x * y
    return jnp.stack([xd, yd], axis=-1)


def undistort(cam: CameraModel, xy_d: jnp.ndarray, iters: int = 8
              ) -> jnp.ndarray:
    """Invert `distort` by fixed-point iteration (static trip count).

    A fixed, small iteration count keeps the op a straight-line XLA
    computation (no data-dependent control flow); 8 iterations matches
    cv2.undistortPoints' default accuracy for moderate distortion.
    """
    k1, k2, p1, p2, k3 = (cam.dist[..., i] for i in range(5))
    x = xy_d[..., 0]
    y = xy_d[..., 1]
    xu, yu = x, y
    for _ in range(iters):
        r2 = xu * xu + yu * yu
        radial = 1.0 + r2 * (k1 + r2 * (k2 + r2 * k3))
        dx = 2.0 * p1 * xu * yu + p2 * (r2 + 2.0 * xu * xu)
        dy = p1 * (r2 + 2.0 * yu * yu) + 2.0 * p2 * xu * yu
        xu = (x - dx) / radial
        yu = (y - dy) / radial
    return jnp.stack([xu, yu], axis=-1)


def normalized_to_pixel(cam: CameraModel, xy: jnp.ndarray) -> jnp.ndarray:
    u = cam.fx * xy[..., 0] + cam.cx
    v = cam.fy * xy[..., 1] + cam.cy
    return jnp.stack([u, v], axis=-1)


def pixel_to_normalized(cam: CameraModel, uv: jnp.ndarray) -> jnp.ndarray:
    x = (uv[..., 0] - cam.cx) / cam.fx
    y = (uv[..., 1] - cam.cy) / cam.fy
    return jnp.stack([x, y], axis=-1)


def project(cam: CameraModel, pts_cam: jnp.ndarray,
            eps: float = 1e-9) -> jnp.ndarray:
    """Project camera-frame 3D points (..., 3) to distorted pixels (..., 2)."""
    z = pts_cam[..., 2:3]
    xy = pts_cam[..., :2] / jnp.where(jnp.abs(z) < eps,
                                      jnp.sign(z) * eps + eps, z)
    return normalized_to_pixel(cam, distort(cam, xy))


def pixel_to_ray(cam: CameraModel, uv: jnp.ndarray,
                 iters: int = 8) -> jnp.ndarray:
    """Distorted pixel (..., 2) -> undistorted normalized coords (..., 2)."""
    return undistort(cam, pixel_to_normalized(cam, uv), iters=iters)


def undistort_image(cam: CameraModel, img: jnp.ndarray) -> jnp.ndarray:
    """Undistort a grayscale image (H, W) under `cam` — cv2.undistort's
    remap (used by the reference to preview calibration quality,
    reference calibration/charuco_calibration.py:80-95).

    For every output pixel on the ideal pinhole grid, the distorted
    SOURCE position is `distort` of its normalized coords (the forward
    model — no iterative inversion needed in this direction), and the
    value is bilinearly sampled there. Pixels whose source falls
    outside the frame are 0, like cv2's default border.
    """
    h, w = img.shape
    imgf = img.astype(jnp.float32)
    vs = jnp.arange(h, dtype=jnp.float32)
    us = jnp.arange(w, dtype=jnp.float32)
    uu, vv = jnp.meshgrid(us, vs)
    src = normalized_to_pixel(
        cam, distort(cam, pixel_to_normalized(
            cam, jnp.stack([uu, vv], -1))))
    x, y = src[..., 0], src[..., 1]
    inside = (x >= 0) & (x <= w - 1) & (y >= 0) & (y <= h - 1)
    out = bilinear_sample(imgf, x, y)
    if jnp.issubdtype(img.dtype, jnp.integer):
        out = jnp.round(out)  # truncation would bias ~0.5 level dark
    return jnp.where(inside, out, 0.0).astype(img.dtype)


def bilinear_sample(img: jnp.ndarray, x: jnp.ndarray, y: jnp.ndarray
                    ) -> jnp.ndarray:
    """Bilinear sample of a single-channel image (H, W) at float
    coordinates (clamped to the valid interior)."""
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(x).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(y).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(x - x0, 0.0, 1.0)
    fy = jnp.clip(y - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return ((1 - fy) * ((1 - fx) * v00 + fx * v01)
            + fy * ((1 - fx) * v10 + fx * v11))
