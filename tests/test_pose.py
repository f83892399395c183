"""Quaternion / pose math vs closed form and round-trips."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unislam_tpu.core import pose


def random_rotations(n, seed=0):
    rng = np.random.default_rng(seed)
    q = rng.normal(size=(n, 4))
    q /= np.linalg.norm(q, axis=-1, keepdims=True)
    return q


def quat_to_mat_np(q):
    w, x, y, z = q
    return np.array([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_quaternion_to_matrix_matches_closed_form():
    qs = random_rotations(32)
    ours = np.asarray(pose.quaternion_to_matrix(jnp.asarray(qs)))
    for q, m in zip(qs, ours):
        np.testing.assert_allclose(m, quat_to_mat_np(q), atol=1e-5)


def test_matrix_quaternion_roundtrip():
    qs = random_rotations(64, seed=1)
    mats = pose.quaternion_to_matrix(jnp.asarray(qs, dtype=jnp.float64)
                                     if jax.config.jax_enable_x64 else
                                     jnp.asarray(qs, dtype=jnp.float32))
    q2 = pose.matrix_to_quaternion(mats)
    m2 = pose.quaternion_to_matrix(q2)
    np.testing.assert_allclose(np.asarray(m2), np.asarray(mats), atol=1e-4)


def test_rotation_properties():
    qs = random_rotations(16, seed=2)
    mats = np.asarray(pose.quaternion_to_matrix(jnp.asarray(qs)))
    eye = np.eye(3)
    for m in mats:
        np.testing.assert_allclose(m @ m.T, eye, atol=1e-5)
        assert abs(np.linalg.det(m) - 1.0) < 1e-5


def test_cam_pose_matrix_roundtrip():
    qs = random_rotations(8, seed=3)
    t = np.random.default_rng(4).normal(size=(8, 3))
    p7 = jnp.asarray(np.concatenate([qs, t], axis=-1), dtype=jnp.float32)
    c2w = pose.cam_pose_to_matrix(p7)
    assert c2w.shape == (8, 4, 4)
    np.testing.assert_allclose(np.asarray(c2w[:, 3]),
                               np.tile([0, 0, 0, 1], (8, 1)), atol=0)
    p7b = pose.matrix_to_cam_pose(c2w)
    c2w2 = pose.cam_pose_to_matrix(p7b)
    np.testing.assert_allclose(np.asarray(c2w2), np.asarray(c2w), atol=1e-4)


def test_pose_gradients_flow():
    """Pose Jacobians must be finite and nonzero (tracking requirement)."""
    p7 = jnp.asarray([1.0, 0.02, -0.01, 0.03, 0.5, -0.2, 1.0])

    def f(p):
        m = pose.cam_pose_to_matrix(p[None])[0]
        return jnp.sum(m[:3, :3] @ jnp.ones(3) + m[:3, 3])

    g = jax.grad(f)(p7)
    assert np.all(np.isfinite(np.asarray(g)))
    assert np.linalg.norm(np.asarray(g)) > 0
