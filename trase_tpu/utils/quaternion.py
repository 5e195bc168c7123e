"""Quaternion / rotation / covariance helpers in jnp.

Behavioral contract: utils/general_utils.py:108-154 (build_rotation,
build_scaling_rotation, strip_symmetric) and
gaussian_renderer/__init__.py:26-35,158-249 (quaternion products and
editing transforms) in the reference. Quaternions are (w, x, y, z).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def normalize_quat(q: jnp.ndarray, eps: float = 0.0) -> jnp.ndarray:
    return q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + eps)


def build_rotation(r: jnp.ndarray) -> jnp.ndarray:
    """(N,4) wxyz quaternions (unnormalized) -> (N,3,3) rotation matrices."""
    q = r / jnp.linalg.norm(r, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    R = jnp.stack(
        [
            1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y),
            2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x),
            2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y),
        ],
        axis=-1,
    )
    return R.reshape(-1, 3, 3)


def build_scaling_rotation(s: jnp.ndarray, r: jnp.ndarray) -> jnp.ndarray:
    """L = R @ diag(s): (N,3) scales, (N,4) quats -> (N,3,3)."""
    R = build_rotation(r)
    return R * s[:, None, :]


def strip_symmetric(cov: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) symmetric -> (N,6) upper-triangular packing
    [xx, xy, xz, yy, yz, zz]."""
    return jnp.stack(
        [cov[:, 0, 0], cov[:, 0, 1], cov[:, 0, 2],
         cov[:, 1, 1], cov[:, 1, 2], cov[:, 2, 2]],
        axis=-1,
    )


def covariance_from_scaling_rotation(
    scaling: jnp.ndarray, scaling_modifier: float, rotation: jnp.ndarray
) -> jnp.ndarray:
    """3D covariance Sigma = L L^T packed as (N,6)."""
    L = build_scaling_rotation(scaling_modifier * scaling, rotation)
    cov = jnp.matmul(L, jnp.swapaxes(L, 1, 2))
    return strip_symmetric(cov)


def unpack_sym33(packed: jnp.ndarray) -> jnp.ndarray:
    """(N,6) [xx,xy,xz,yy,yz,zz] -> (N,3,3)."""
    xx, xy, xz, yy, yz, zz = [packed[:, i] for i in range(6)]
    return jnp.stack(
        [xx, xy, xz, xy, yy, yz, xz, yz, zz], axis=-1
    ).reshape(-1, 3, 3)


def quaternion_multiply(q1: jnp.ndarray, q2: jnp.ndarray) -> jnp.ndarray:
    """Hamilton product of wxyz quaternions, broadcasting over leading dims."""
    w1, x1, y1, z1 = q1[..., 0], q1[..., 1], q1[..., 2], q1[..., 3]
    w2, x2, y2, z2 = q2[..., 0], q2[..., 1], q2[..., 2], q2[..., 3]
    return jnp.stack(
        [
            w1 * w2 - x1 * x2 - y1 * y2 - z1 * z2,
            w1 * x2 + x1 * w2 + y1 * z2 - z1 * y2,
            w1 * y2 - x1 * z2 + y1 * w2 + z1 * x2,
            w1 * z2 + x1 * y2 - y1 * x2 + z1 * w2,
        ],
        axis=-1,
    )


def rotmat_to_quat(R: np.ndarray) -> np.ndarray:
    """3x3 rotation matrix -> wxyz quaternion (numpy, host side)."""
    Rxx, Ryx, Rzx, Rxy, Ryy, Rzy, Rxz, Ryz, Rzz = np.asarray(R).flatten()
    K = (
        np.array(
            [
                [Rxx - Ryy - Rzz, 0, 0, 0],
                [Ryx + Rxy, Ryy - Rxx - Rzz, 0, 0],
                [Rzx + Rxz, Rzy + Ryz, Rzz - Rxx - Ryy, 0],
                [Ryz - Rzy, Rzx - Rxz, Rxy - Ryx, Rxx + Ryy + Rzz],
            ]
        )
        / 3.0
    )
    eigvals, eigvecs = np.linalg.eigh(K)
    qvec = eigvecs[[3, 0, 1, 2], np.argmax(eigvals)]
    if qvec[0] < 0:
        qvec = -qvec
    return qvec
