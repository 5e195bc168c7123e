"""3D feature/rigidity regularizers (jnp).

Behavioral contract: utils/loss_utils.py:89-221 in the reference
(loss_cls_3d KL-vs-KNN, loss_reg_3d_feature sigmoid-KL, loss_feature3d
near/far cosine terms, per-cluster ARAP rigid-body loss via SVD).
These are defined-but-unwired in the reference's train.py too; exposed
here for parity and for optional use.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..ops.knn import knn


def _subsample(rng, n, max_points):
    idx = jax.random.permutation(rng, n)[:max_points]
    return idx


def loss_cls_3d(rng, features, predictions, k=5, lambda_val=2.0,
                max_points=200000, sample_size=800):
    """Neighborhood-consistency KL over top-k feature neighbors."""
    n = features.shape[0]
    if n > max_points:
        idx = _subsample(rng, n, max_points)
        features, predictions = features[idx], predictions[idx]
        n = max_points
    rng2 = jax.random.fold_in(rng, 1)
    s_idx = _subsample(rng2, n, sample_size)
    sample_f = features[s_idx]
    sample_p = predictions[s_idx]
    _, nn_idx = knn(sample_f, features, k)
    neigh_p = predictions[nn_idx]  # (S, k, C)
    kl = sample_p[:, None] * (
        jnp.log(sample_p[:, None] + 1e-10) - jnp.log(neigh_p + 1e-10)
    )
    loss = kl.sum(-1).mean()
    return lambda_val * loss / predictions.shape[1]


def loss_reg_3d_feature(gaussian_feats, gaussian_xyz, k):
    """KL between sigmoid features of each point and its k spatial NNs."""
    _, idx = knn(gaussian_xyz, gaussian_xyz, k + 1)
    neigh = idx[:, 1:]  # (N, k)
    f = jax.nn.sigmoid(gaussian_feats)
    fn = f[neigh]  # (N, k, F)
    eps = 1e-10
    kl = f[:, None] * (jnp.log(f[:, None] + eps) - jnp.log(fn + eps))
    return kl.mean()


def loss_feature3d(rng, gaussian_feats, gaussian_xyz, kp=16, kn=4,
                   max_points=10000, lambda_p=1.0, lambda_n=1.0):
    """Near neighbors should agree, far points should not."""
    n = gaussian_feats.shape[0]
    if n > max_points:
        idx = _subsample(rng, n, max_points)
        gaussian_feats, gaussian_xyz = gaussian_feats[idx], gaussian_xyz[idx]
        n = max_points
    d2 = jnp.sum(
        (gaussian_xyz[:, None] - gaussian_xyz[None, :]) ** 2, axis=-1
    )
    _, nn_idx = jax.lax.top_k(-d2, kp)
    _, fn_idx = jax.lax.top_k(d2, kn)

    def cos(a, b):
        return jnp.sum(a * b, -1) / (
            jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1) + 1e-12
        )

    near = jax.nn.sigmoid(
        1 - cos(gaussian_feats[:, None], gaussian_feats[nn_idx])
    ).mean()
    far = jax.nn.sigmoid(
        cos(gaussian_feats[:, None], gaussian_feats[fn_idx])
    ).mean()
    return lambda_p * near + lambda_n * far


def rigid_body_motion_loss(xyz1, xyz2, neighbor_idx):
    """ARAP-style rigidity: local edge sets at t1 vs t2 should differ by a
    rotation (Procrustes via SVD). neighbor_idx: (N, K) precomputed KNN of
    xyz1 (cluster-restricted by the caller)."""
    e1 = xyz1[:, None, :] - xyz1[neighbor_idx]  # (N, K, 3)
    e2 = xyz2[:, None, :] - xyz2[neighbor_idx]
    S = jnp.einsum("nki,nkj->nij", e1, e2)
    U, _, Vt = jnp.linalg.svd(S)
    R = jnp.einsum("nji,nkj->nik", Vt, U)  # V @ U^T
    e2_rot = jnp.einsum("nij,nkj->nki", R, e2)
    return ((e1 - e2_rot) ** 2).sum(-1).sum(-1).mean()
