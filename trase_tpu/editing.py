"""Gaussian-set editing ops: rescale / rotate / translate / remove / save.

Behavioral contract: gaussian_renderer/__init__.py:158-249 in the
reference (rescale, rotate_by_euler_angles in z-y-x order,
rotate_by_matrix via quaternion product, translation, transform) plus
the GUI's removal semantics (render with ``mask=~segmented``) and object
extraction (save_ply with a mask).
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from .utils.quaternion import normalize_quat, quaternion_multiply, rotmat_to_quat


def _rx(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[1, 0, 0], [0, c, -s], [0, s, c]], dtype=np.float32)


def _ry(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, 0, s], [0, 1, 0], [-s, 0, c]], dtype=np.float32)


def _rz(theta):
    c, s = np.cos(theta), np.sin(theta)
    return np.array([[c, -s, 0], [s, c, 0], [0, 0, 1]], dtype=np.float32)


def rescale(means3d, scales, scale_factor: float):
    return means3d * scale_factor, scales * scale_factor


def rotate_by_matrix(means3d, rotations, rotation_matrix: np.ndarray):
    """Rotate positions and quaternions by a world-space rotation matrix.

    Matches the reference's quat_multiply(rotations, q_rot) ordering
    (gaussian_renderer/__init__.py:210-235).
    """
    Rm = jnp.asarray(rotation_matrix, jnp.float32)
    means3d = means3d @ Rm.T
    q = jnp.asarray(rotmat_to_quat(np.asarray(rotation_matrix)), jnp.float32)
    # reference quat_multiply(q0=rotations, q1=q) == hamilton(q, rotations)
    rotations = quaternion_multiply(
        jnp.broadcast_to(q, rotations.shape), rotations
    )
    return means3d, normalize_quat(rotations)


def rotate_by_euler_angles(means3d, rotations, rotation_angles):
    """z-y-x order, radians."""
    x, y, z = rotation_angles
    if x == 0.0 and y == 0.0 and z == 0.0:
        return means3d, rotations
    Rm = _rx(x) @ _ry(y) @ _rz(z)
    return rotate_by_matrix(means3d, rotations, Rm)


def translation(means3d, offsets):
    return means3d + jnp.asarray(offsets)


def transform_gaussians(means3d, rotations, scales, scale_factor,
                        offsets, rotation_angles):
    """rescale -> rotate (zyx euler) -> translate, like the reference's
    `transform` (gaussian_renderer/__init__.py:243-249)."""
    means3d, scales = rescale(means3d, scales, scale_factor)
    means3d, rotations = rotate_by_euler_angles(means3d, rotations,
                                                rotation_angles)
    means3d = translation(means3d, offsets)
    return means3d, rotations, scales


def removal_mask(cluster_ids: jnp.ndarray, remove_ids) -> jnp.ndarray:
    """Keep-mask that drops gaussians whose cluster id is in remove_ids
    (GUI removal: render(mask=~segmented), gui.py:414-417)."""
    ids = cluster_ids.reshape(-1)
    seg = jnp.zeros_like(ids, dtype=bool)
    for rid in remove_ids:
        seg = seg | (ids == rid)
    return ~seg


def selection_mask(cluster_ids: jnp.ndarray, select_ids) -> jnp.ndarray:
    ids = cluster_ids.reshape(-1)
    seg = jnp.zeros_like(ids, dtype=bool)
    for sid in select_ids:
        seg = seg | (ids == sid)
    return seg
