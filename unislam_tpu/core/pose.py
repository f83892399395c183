"""Differentiable pose math: quaternion <-> rotation matrix, 7-dof camera poses.

The reference uses pytorch3d's CUDA quaternion ops
(/root/reference/src/common.py:20,182-208); here everything is plain jnp and
differentiable by construction, so pose Jacobians for tracking and bundle
adjustment flow through `jax.grad` with no custom kernels.

Pose layout follows the reference (`matrix_to_cam_pose`, RT=True):
a (B, 7) array `[qw, qx, qy, qz, tx, ty, tz]` (wxyz quaternion first).
"""

from __future__ import annotations

import jax.numpy as jnp


def quaternion_to_matrix(quat: jnp.ndarray) -> jnp.ndarray:
    """Convert unit-norm-agnostic quaternions (..., 4) [w, x, y, z] to rotation
    matrices (..., 3, 3).

    The quaternion is normalized internally so the map is well-defined (and
    smooth) for the unconstrained 4-vectors the tracker optimizes.
    """
    quat = quat / jnp.linalg.norm(quat, axis=-1, keepdims=True)
    w, x, y, z = jnp.moveaxis(quat, -1, 0)
    xx, yy, zz = x * x, y * y, z * z
    wx, wy, wz = w * x, w * y, w * z
    xy, xz, yz = x * y, x * z, y * z
    m = jnp.stack(
        [
            1.0 - 2.0 * (yy + zz), 2.0 * (xy - wz), 2.0 * (xz + wy),
            2.0 * (xy + wz), 1.0 - 2.0 * (xx + zz), 2.0 * (yz - wx),
            2.0 * (xz - wy), 2.0 * (yz + wx), 1.0 - 2.0 * (xx + yy),
        ],
        axis=-1,
    )
    return m.reshape(quat.shape[:-1] + (3, 3))


def matrix_to_quaternion(matrix: jnp.ndarray) -> jnp.ndarray:
    """Convert rotation matrices (..., 3, 3) to quaternions (..., 4) [w,x,y,z].

    Branch-free "pick the numerically largest of the four candidate
    denominators" construction (equivalent to pytorch3d's
    `matrix_to_quaternion` up to sign convention: we return q with the same
    sign behavior, selecting the best-conditioned case via `where`).
    """
    m = matrix
    m00, m01, m02 = m[..., 0, 0], m[..., 0, 1], m[..., 0, 2]
    m10, m11, m12 = m[..., 1, 0], m[..., 1, 1], m[..., 1, 2]
    m20, m21, m22 = m[..., 2, 0], m[..., 2, 1], m[..., 2, 2]

    # Squared magnitudes of the 4 quaternion components (may be <=0 off
    # manifold; clamp before sqrt).
    qw2 = 1.0 + m00 + m11 + m22
    qx2 = 1.0 + m00 - m11 - m22
    qy2 = 1.0 - m00 + m11 - m22
    qz2 = 1.0 - m00 - m11 + m22

    def _safe_sqrt(v):
        return jnp.sqrt(jnp.maximum(v, 1e-12))

    # Candidate quaternions built from each pivot.
    sw = _safe_sqrt(qw2)
    cand_w = jnp.stack(
        [0.5 * sw, 0.5 * (m21 - m12) / sw, 0.5 * (m02 - m20) / sw,
         0.5 * (m10 - m01) / sw], axis=-1)
    sx = _safe_sqrt(qx2)
    cand_x = jnp.stack(
        [0.5 * (m21 - m12) / sx, 0.5 * sx, 0.5 * (m01 + m10) / sx,
         0.5 * (m02 + m20) / sx], axis=-1)
    sy = _safe_sqrt(qy2)
    cand_y = jnp.stack(
        [0.5 * (m02 - m20) / sy, 0.5 * (m01 + m10) / sy, 0.5 * sy,
         0.5 * (m12 + m21) / sy], axis=-1)
    sz = _safe_sqrt(qz2)
    cand_z = jnp.stack(
        [0.5 * (m10 - m01) / sz, 0.5 * (m02 + m20) / sz,
         0.5 * (m12 + m21) / sz, 0.5 * sz], axis=-1)

    mags = jnp.stack([qw2, qx2, qy2, qz2], axis=-1)
    best = jnp.argmax(mags, axis=-1)
    cands = jnp.stack([cand_w, cand_x, cand_y, cand_z], axis=-2)
    q = jnp.take_along_axis(cands, best[..., None, None], axis=-2)
    q = q[..., 0, :]
    # Canonical sign: non-negative w (pytorch3d keeps the pivot positive; for
    # SLAM only the rotation matters, and tests compare up to sign).
    q = jnp.where(q[..., :1] < 0, -q, q)
    return q


def cam_pose_to_matrix(pose7: jnp.ndarray) -> jnp.ndarray:
    """(B, 7) [quat(wxyz), t] -> (B, 4, 4) c2w matrices.

    Mirrors /root/reference/src/common.py:196-208.
    """
    rot = quaternion_to_matrix(pose7[..., :4])
    b = pose7.shape[:-1]
    bottom = jnp.broadcast_to(
        jnp.array([0.0, 0.0, 0.0, 1.0], dtype=pose7.dtype), b + (1, 4))
    top = jnp.concatenate([rot, pose7[..., 4:, None]], axis=-1)
    return jnp.concatenate([top, bottom], axis=-2)


def matrix_to_cam_pose(c2w: jnp.ndarray) -> jnp.ndarray:
    """(B, 4, 4) c2w matrices -> (B, 7) [quat(wxyz), t].

    Mirrors /root/reference/src/common.py:182-194 (RT=True layout).
    """
    return jnp.concatenate(
        [matrix_to_quaternion(c2w[..., :3, :3]), c2w[..., :3, 3]], axis=-1)
