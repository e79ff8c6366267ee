"""core.lie SE(3)/SO(3) identities + GTSAM-convention checks."""

import numpy as np
from scipy.spatial.transform import Rotation

from aruco_slam_tpu.core import lie
from aruco_slam_tpu.core import quaternion as quat


def random_pose(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    return lie.Pose(q=np.asarray(q), t=rng.normal(size=3))


def test_compose_inverse_identity():
    rng = np.random.default_rng(0)
    p = random_pose(rng)
    ident = lie.compose(p, lie.inverse(p))
    np.testing.assert_allclose(np.abs(np.asarray(ident.q)[0]), 1.0, atol=1e-9)
    np.testing.assert_allclose(ident.t, 0.0, atol=1e-9)


def test_compose_matches_matrix_product():
    rng = np.random.default_rng(1)
    a, b = random_pose(rng), random_pose(rng)
    ab = lie.compose(a, b)
    ma = np.asarray(lie.pose_to_matrix(a))
    mb = np.asarray(lie.pose_to_matrix(b))
    np.testing.assert_allclose(
        np.asarray(lie.pose_to_matrix(ab)), ma @ mb, atol=1e-9
    )


def test_transform_matches_matrix():
    rng = np.random.default_rng(2)
    p = random_pose(rng)
    x = rng.normal(size=(10, 3))
    ours = lie.transform(p, x)
    m = np.asarray(lie.pose_to_matrix(p))
    theirs = (m[:3, :3] @ x.T).T + m[:3, 3]
    np.testing.assert_allclose(ours, theirs, atol=1e-9)


def test_se3_exp_log_roundtrip():
    rng = np.random.default_rng(3)
    xi = rng.normal(size=(64, 6))
    # log returns the principal rotation (|omega| <= pi); keep samples inside.
    xi[:, :3] *= 0.9 * np.pi / np.maximum(
        np.linalg.norm(xi[:, :3], axis=-1, keepdims=True), np.pi
    )
    p = lie.se3_exp(xi)
    xi2 = lie.se3_log(p)
    np.testing.assert_allclose(xi2, xi, atol=1e-7)


def test_se3_exp_small():
    xi = np.array([[1e-9, 0, 0, 1e-3, 2e-3, -1e-3], np.zeros(6)])
    p = lie.se3_exp(xi)
    np.testing.assert_allclose(p.t, xi[:, 3:], atol=1e-10)
    np.testing.assert_allclose(lie.se3_log(p), xi, atol=1e-10)


def test_se3_exp_matches_matrix_exponential():
    from scipy.linalg import expm

    rng = np.random.default_rng(4)
    for _ in range(5):
        xi = rng.normal(size=6)
        omega, v = xi[:3], xi[3:]
        m = np.zeros((4, 4))
        m[:3, :3] = np.asarray(lie.skew(omega))
        m[:3, 3] = v
        expected = expm(m)
        got = np.asarray(lie.pose_to_matrix(lie.se3_exp(xi)))
        np.testing.assert_allclose(got, expected, atol=1e-8)


def test_right_jacobian_first_order():
    rng = np.random.default_rng(5)
    omega = rng.normal(size=3)
    delta = rng.normal(size=3) * 1e-6
    lhs = Rotation.from_rotvec(omega + delta).as_matrix()
    jr = np.asarray(lie.so3_right_jacobian(omega))
    rhs = (
        Rotation.from_rotvec(omega).as_matrix()
        @ Rotation.from_rotvec(jr @ delta).as_matrix()
    )
    np.testing.assert_allclose(lhs, rhs, atol=1e-10)


def test_right_jacobian_inverse():
    rng = np.random.default_rng(6)
    omega = rng.normal(size=(16, 3))
    jr = np.asarray(lie.so3_right_jacobian(omega))
    jr_inv = np.asarray(lie.so3_right_jacobian_inv(omega))
    eye = np.broadcast_to(np.eye(3), jr.shape)
    np.testing.assert_allclose(jr @ jr_inv, eye, atol=1e-8)


def test_retract_derivative_is_identity():
    """d(p ⊞ xi)/d(xi) at 0 must be identity in the [ω, v-in-body] chart."""
    rng = np.random.default_rng(7)
    p = random_pose(rng)
    eps = 1e-7
    for i in range(6):
        xi = np.zeros(6)
        xi[i] = eps
        p2 = lie.retract(p, xi)
        # measure local coords of p⁻¹ p2 (decoupled chart)
        rel = lie.between(p, p2)
        omega = np.asarray(quat.to_rotvec(rel.q))
        v = np.asarray(rel.t)
        local = np.concatenate([omega, v])
        expected = np.zeros(6)
        expected[i] = eps
        np.testing.assert_allclose(local, expected, atol=1e-12)
