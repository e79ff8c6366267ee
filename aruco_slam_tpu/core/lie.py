"""SO(3)/SE(3) operations on (quaternion, translation) pose arrays.

A pose is represented as a pair of arrays ``(q, t)`` with trailing shapes
(4,) scalar-first quaternion and (3,) translation, mapping *local* (e.g.
camera) coordinates to *world/map* coordinates:

    x_world = R(q) @ x_local + t

All ops broadcast over leading batch dims.  These replace GTSAM's
Pose3/Rot3 algebra consumed by the reference factor-graph backend
(reference filters/factor_graph.py:92-101, 178-189, 287-300).

The SE(3) Exp/Log here use the full V-matrix coupling (matching GTSAM's
``Pose3::Logmap`` local coordinates ordered [omega, v]), Taylor-safe at
small angles so they are jit/grad friendly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from aruco_slam_tpu.core import quaternion as quat

_EPS = 1e-12


class Pose(NamedTuple):
    """SE(3) pose as scalar-first quaternion + translation."""

    q: jnp.ndarray  # (..., 4) wxyz
    t: jnp.ndarray  # (..., 3)


def identity_pose(dtype=jnp.float32) -> Pose:
    return Pose(quat.identity(dtype), jnp.zeros(3, dtype))


def compose(a: Pose, b: Pose) -> Pose:
    """a ∘ b — apply b first, then a."""
    return Pose(
        quat.multiply(a.q, b.q),
        quat.rotate(a.q, b.t) + a.t,
    )


def inverse(p: Pose) -> Pose:
    qi = quat.conjugate(p.q)
    return Pose(qi, -quat.rotate(qi, p.t))


def transform(p: Pose, x: jnp.ndarray) -> jnp.ndarray:
    """Map local point(s) x into the parent frame: R x + t."""
    return quat.rotate(p.q, x) + p.t


def between(a: Pose, b: Pose) -> Pose:
    """Relative pose a^{-1} ∘ b (GTSAM ``Pose3::between`` semantics)."""
    return compose(inverse(a), b)


def skew(v: jnp.ndarray) -> jnp.ndarray:
    """3-vector -> 3x3 skew-symmetric matrix [v]x (batched)."""
    x, y, z = jnp.moveaxis(v, -1, 0)
    zero = jnp.zeros_like(x)
    m = jnp.stack([zero, -z, y, z, zero, -x, -y, x, zero], axis=-1)
    return m.reshape((*v.shape[:-1], 3, 3))


def _so3_coeffs(angle_sq: jnp.ndarray):
    """Taylor-safe A = sin(θ)/θ and B = (1-cos θ)/θ² coefficients."""
    angle = jnp.sqrt(jnp.maximum(angle_sq, _EPS))
    small = angle_sq < 1e-10
    a = jnp.where(small, 1.0 - angle_sq / 6.0, jnp.sin(angle) / angle)
    b = jnp.where(small, 0.5 - angle_sq / 24.0,
                  (1.0 - jnp.cos(angle)) / jnp.maximum(angle_sq, _EPS))
    return a, b


def so3_right_jacobian(omega: jnp.ndarray) -> jnp.ndarray:
    """Right Jacobian Jr(ω) of SO(3): Exp(ω+δ) ≈ Exp(ω) Exp(Jr δ)."""
    angle_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    w = skew(omega)
    a, b = _so3_coeffs(angle_sq)
    # Jr = I - B W + (1 - A) / θ² W²  with C = (1-A)/θ² Taylor-safe
    angle = jnp.sqrt(jnp.maximum(angle_sq, _EPS))
    small = angle_sq < 1e-10
    c = jnp.where(small, 1.0 / 6.0 - angle_sq / 120.0,
                  (1.0 - a) / jnp.maximum(angle_sq, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), w.shape)
    return eye - b * w + c * (w @ w)


def so3_right_jacobian_inv(omega: jnp.ndarray) -> jnp.ndarray:
    """Inverse right Jacobian Jr⁻¹(ω), closed form, Taylor-safe."""
    angle_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    angle = jnp.sqrt(jnp.maximum(angle_sq, _EPS))
    w = skew(omega)
    small = angle_sq < 1e-10
    # k = 1/θ² - cot(θ/2)/(2θ)  (stable rewrite of
    # 1/θ² - (1+cosθ)/(2θ sinθ), which is 0/0 at θ=π).
    # Taylor: 1/12 + θ²/720 + ...
    half = 0.5 * angle
    k = jnp.where(
        small,
        1.0 / 12.0 + angle_sq / 720.0,
        1.0 / jnp.maximum(angle_sq, _EPS)
        - jnp.cos(half)
        / jnp.maximum(2.0 * angle * jnp.sin(half), _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), w.shape)
    return eye + 0.5 * w + k * (w @ w)


def se3_exp(xi: jnp.ndarray) -> Pose:
    """SE(3) exponential. xi = [omega (3), v (3)] -> Pose.

    t = V(ω) v with V = I + B W + C W².
    """
    omega = xi[..., :3]
    v = xi[..., 3:]
    angle_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    w = skew(omega)
    a, b = _so3_coeffs(angle_sq)
    small = angle_sq < 1e-10
    angle = jnp.sqrt(jnp.maximum(angle_sq, _EPS))
    del angle
    c = jnp.where(small, 1.0 / 6.0 - angle_sq / 120.0,
                  (1.0 - a) / jnp.maximum(angle_sq, _EPS))
    eye = jnp.broadcast_to(jnp.eye(3, dtype=xi.dtype), w.shape)
    vmat = eye + b * w + c * (w @ w)
    t = jnp.squeeze(vmat @ v[..., None], -1)
    return Pose(quat.from_rotvec(omega), t)


def se3_log(p: Pose) -> jnp.ndarray:
    """SE(3) logarithm -> [omega (3), v (3)] (GTSAM Pose3::Logmap order)."""
    omega = quat.to_rotvec(p.q)
    angle_sq = jnp.sum(omega * omega, axis=-1)[..., None, None]
    angle = jnp.sqrt(jnp.maximum(angle_sq, _EPS))
    w = skew(omega)
    small = angle_sq < 1e-10
    # V^{-1} = I - W/2 + k W², with k as in so3_right_jacobian_inv
    # (stable cot(θ/2) form).
    half = 0.5 * angle
    k = jnp.where(
        small,
        1.0 / 12.0 + angle_sq / 720.0,
        1.0 / jnp.maximum(angle_sq, _EPS)
        - jnp.cos(half)
        / jnp.maximum(2.0 * angle * jnp.sin(half), _EPS),
    )
    eye = jnp.broadcast_to(jnp.eye(3, dtype=omega.dtype), w.shape)
    vinv = eye - 0.5 * w + k * (w @ w)
    v = jnp.squeeze(vinv @ p.t[..., None], -1)
    return jnp.concatenate([omega, v], axis=-1)


def retract(p: Pose, xi: jnp.ndarray) -> Pose:
    """Right retraction p ⊞ xi = p ∘ Exp(xi) (decoupled SO3 x R³).

    Uses the decoupled (rotation Exp, additive translation in body
    frame) retraction which keeps BA Jacobians simple; any retraction
    whose derivative at 0 is the identity yields the same GN fixed
    point.
    """
    omega = xi[..., :3]
    v = xi[..., 3:]
    dq = quat.from_rotvec(omega)
    return Pose(
        quat.normalize(quat.multiply(p.q, dq)),
        p.t + quat.rotate(p.q, v),
    )


def pose_to_matrix(p: Pose) -> jnp.ndarray:
    """Pose -> 4x4 homogeneous transform."""
    r = quat.to_matrix(p.q)
    top = jnp.concatenate([r, p.t[..., :, None]], axis=-1)
    bottom = jnp.broadcast_to(
        jnp.asarray([0.0, 0.0, 0.0, 1.0], dtype=p.t.dtype),
        (*p.t.shape[:-1], 1, 4),
    )
    return jnp.concatenate([top, bottom], axis=-2)
