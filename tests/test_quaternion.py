"""core.quaternion vs scipy.spatial.transform.Rotation oracle."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation

from aruco_slam_tpu.core import quaternion as quat


def random_quats(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    return q / np.linalg.norm(q, axis=-1, keepdims=True)


def as_scipy(q_wxyz):
    return Rotation.from_quat(q_wxyz, scalar_first=True)


def quat_allclose(a, b, atol=1e-8):
    """Compare quaternions up to sign (double cover)."""
    a, b = np.asarray(a), np.asarray(b)
    direct = np.abs(a - b).max(axis=-1)
    flipped = np.abs(a + b).max(axis=-1)
    return np.all(np.minimum(direct, flipped) < atol)


def test_multiply_matches_scipy():
    a = random_quats(64, 1)
    b = random_quats(64, 2)
    ours = quat.multiply(a, b)
    theirs = (as_scipy(a) * as_scipy(b)).as_quat(scalar_first=True)
    assert quat_allclose(ours, theirs)


def test_rotate_matches_matrix():
    q = random_quats(64, 3)
    v = np.random.default_rng(4).normal(size=(64, 3))
    ours = quat.rotate(q, v)
    theirs = np.einsum("nij,nj->ni", as_scipy(q).as_matrix(), v)
    np.testing.assert_allclose(ours, theirs, atol=1e-10)


def test_to_matrix_matches_scipy():
    q = random_quats(64, 5)
    np.testing.assert_allclose(
        quat.to_matrix(q), as_scipy(q).as_matrix(), atol=1e-10
    )


def test_from_matrix_roundtrip():
    q = random_quats(256, 6)
    m = quat.to_matrix(q)
    assert quat_allclose(quat.from_matrix(m), q, atol=1e-8)


def test_from_matrix_edge_cases():
    # 180-degree rotations stress each pivot branch.
    for axis in np.eye(3):
        m = Rotation.from_rotvec(np.pi * axis).as_matrix()
        q = quat.from_matrix(m[None])
        m2 = quat.to_matrix(q)[0]
        np.testing.assert_allclose(m2, m, atol=1e-7)


def test_rotvec_roundtrip_and_scipy():
    rv = np.random.default_rng(7).normal(size=(128, 3))
    ours = quat.from_rotvec(rv)
    theirs = Rotation.from_rotvec(rv).as_quat(scalar_first=True)
    assert quat_allclose(ours, theirs)
    back = quat.to_rotvec(np.asarray(ours))
    theirs_back = Rotation.from_rotvec(rv).as_rotvec()
    np.testing.assert_allclose(back, theirs_back, atol=1e-8)


def test_rotvec_small_angle():
    rv = np.array([[1e-9, -2e-9, 1e-10], [0.0, 0.0, 0.0]])
    q = quat.from_rotvec(rv)
    np.testing.assert_allclose(np.asarray(q)[:, 0], 1.0, atol=1e-12)
    np.testing.assert_allclose(quat.to_rotvec(np.asarray(q)), rv, atol=1e-12)


def test_from_euler_xyz_matches_scipy():
    ang = np.random.default_rng(8).uniform(-np.pi, np.pi, size=(64, 3))
    ours = quat.from_euler_xyz(ang)
    theirs = Rotation.from_euler("xyz", ang).as_quat(scalar_first=True)
    assert quat_allclose(ours, theirs)


def test_apply_small_angle_matches_reference_formula():
    q = random_quats(16, 9)
    err = np.random.default_rng(10).normal(size=(16, 3)) * 0.01
    ours = quat.apply_small_angle(q, err)
    dq = np.concatenate([np.ones((16, 1)), err / 2], axis=-1)
    dq /= np.linalg.norm(dq, axis=-1, keepdims=True)
    theirs = (as_scipy(dq) * as_scipy(q)).as_quat(scalar_first=True)
    assert quat_allclose(ours, theirs, atol=1e-7)


@pytest.mark.parametrize("seed", [0, 1])
def test_conjugate_is_inverse(seed):
    q = random_quats(32, seed)
    prod = quat.multiply(q, quat.conjugate(q))
    ident = np.zeros((32, 4))
    ident[:, 0] = 1
    assert quat_allclose(prod, ident)
