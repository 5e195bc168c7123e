"""SE(3)/SO(3) exponential and logarithm maps in jnp.

Behavioral contract: utils/rigid_utils.py in the reference (Modern
Robotics formulas; exp_se3 consumes a screw axis + theta and returns a
batch of 4x4 homogeneous transforms; log_se3 inverts it).
"""
from __future__ import annotations

import jax.numpy as jnp


def skew(w: jnp.ndarray) -> jnp.ndarray:
    """(N,3) -> (N,3,3) cross-product matrices."""
    zeros = jnp.zeros(w.shape[0], dtype=w.dtype)
    return jnp.stack(
        [
            zeros, -w[:, 2], w[:, 1],
            w[:, 2], zeros, -w[:, 0],
            -w[:, 1], w[:, 0], zeros,
        ],
        axis=-1,
    ).reshape(-1, 3, 3)


def rp_to_se3(R: jnp.ndarray, p: jnp.ndarray) -> jnp.ndarray:
    """(N,3,3) rotation + (N,3,1) translation -> (N,4,4)."""
    bottom = jnp.broadcast_to(
        jnp.array([[[0.0, 0.0, 0.0, 1.0]]], dtype=R.dtype), (R.shape[0], 1, 4)
    )
    return jnp.concatenate([jnp.concatenate([R, p], axis=-1), bottom], axis=1)


def exp_so3(w: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. w: (N,3) unit axes, theta: (N,1)."""
    W = skew(w)
    identity = jnp.broadcast_to(jnp.eye(3, dtype=w.dtype), (W.shape[0], 3, 3))
    W_sqr = jnp.matmul(W, W)
    th = theta[..., None]  # (N,1,1)
    return identity + jnp.sin(th) * W + (1.0 - jnp.cos(th)) * W_sqr


def exp_se3(S: jnp.ndarray, theta: jnp.ndarray) -> jnp.ndarray:
    """Screw-axis exponential. S: (N,6) [w|v], theta: (N,1) -> (N,4,4)."""
    w, v = jnp.split(S, 2, axis=-1)
    W = skew(w)
    R = exp_so3(w, theta)
    identity = jnp.broadcast_to(jnp.eye(3, dtype=S.dtype), (W.shape[0], 3, 3))
    W_sqr = jnp.matmul(W, W)
    th = theta.reshape(-1, 1, 1)
    G = th * identity + (1.0 - jnp.cos(th)) * W + (th - jnp.sin(th)) * W_sqr
    p = jnp.matmul(G, v[..., None])
    return rp_to_se3(R, p)


def log_so3(R: jnp.ndarray):
    """(N,3,3) -> axis (N,3), theta (N,1,1)."""
    trace = R[:, 0, 0] + R[:, 1, 1] + R[:, 2, 2]
    theta = jnp.arccos(jnp.clip((trace - 1) / 2, -1.0, 1.0))
    theta = theta.reshape(-1, 1, 1) + 1e-5
    Wn = 1 / (2 * jnp.sin(theta)) * (R - jnp.swapaxes(R, 1, 2))
    w = jnp.stack([Wn[:, 2, 1], Wn[:, 0, 2], Wn[:, 1, 0]], axis=1)
    return w, theta


def log_se3(transform: jnp.ndarray) -> jnp.ndarray:
    """(N,4,4) -> (N,6) twist coordinates."""
    w, theta = log_so3(transform[:, :3, :3])
    W = skew(w)
    W_sqr = jnp.matmul(W, W)
    identity = jnp.broadcast_to(
        jnp.eye(3, dtype=transform.dtype), (W.shape[0], 3, 3)
    )
    th = theta.reshape(-1, 1, 1)
    G = th * identity + (1.0 - jnp.cos(th)) * W + (th - jnp.sin(th)) * W_sqr
    v = jnp.linalg.solve(G, transform[:, :3, 3].reshape(-1, 3, 1))
    return jnp.concatenate([w, v.reshape(-1, 3)], axis=1)


def to_homogeneous(v: jnp.ndarray) -> jnp.ndarray:
    return jnp.concatenate([v, jnp.ones_like(v[..., :1])], axis=-1)


def from_homogeneous(v: jnp.ndarray) -> jnp.ndarray:
    return v[..., :3] / v[..., -1:]
