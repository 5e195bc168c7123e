"""K-nearest-neighbor ops (chunked dense distances + top-k, pure jnp).

TPU-native replacement for the reference's two CUDA KNN dependencies
(SURVEY.md §2.3b/c): ``simple_knn._C.distCUDA2`` (mean squared distance
to the 3 nearest neighbors, used once to initialise log-scales,
scene/gaussian_model.py:237) and ``pytorch3d.ops.knn_points`` (K=16
feature smoothing, K=1 prompt lookup, 3D regularizers). Chunked
(Q_chunk x N) distance matrices keep memory bounded; the inner distance
computation is a matmul (||q||^2 + ||p||^2 - 2 q.p) that rides the MXU.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def _chunk_knn(q_chunk, points, k, sq_norms):
    """q_chunk: (C,3); points: (N,3). Returns (dists (C,k), idx (C,k))."""
    qn = jnp.sum(q_chunk * q_chunk, axis=1, keepdims=True)  # (C,1)
    d2 = qn + sq_norms[None, :] - 2.0 * (
        q_chunk @ points.T
    )  # (C,N), MXU matmul
    d2 = jnp.maximum(d2, 0.0)
    neg_d, idx = jax.lax.top_k(-d2, k)
    return -neg_d, idx


def knn(
    queries: jnp.ndarray,
    points: jnp.ndarray,
    k: int,
    chunk: int = 4096,
):
    """Exact KNN: for each query, the k nearest points (squared dists).

    Returns (dists2 (Q,k), idx (Q,k)), sorted ascending by distance.
    """
    q = queries.shape[0]
    n_chunks = -(-q // chunk)
    pad = n_chunks * chunk - q
    q_pad = jnp.pad(queries, ((0, pad), (0, 0)))
    sq_norms = jnp.sum(points * points, axis=1)
    body = functools.partial(_chunk_knn, points=points, k=k, sq_norms=sq_norms)
    d2, idx = jax.lax.map(body, q_pad.reshape(n_chunks, chunk, -1))
    return d2.reshape(-1, k)[:q], idx.reshape(-1, k)[:q]


def mean_dist3_sq(points: jnp.ndarray, chunk: int = 4096) -> jnp.ndarray:
    """distCUDA2 equivalent: mean squared distance to the 3 nearest
    neighbors (excluding self). points: (N,3) -> (N,)."""
    d2, _ = knn(points, points, k=4, chunk=chunk)
    return d2[:, 1:].mean(axis=1)


def build_feature_smooth_map(xyz: jnp.ndarray, k: int, chunk: int = 4096):
    """Neighbor index map for feature smoothing (self included, like
    knn_points with query==ref). Returns idx (N, k)."""
    _, idx = knn(xyz, xyz, k=k, chunk=chunk)
    return idx


def smooth_features(
    features: jnp.ndarray,
    neighbor_idx: jnp.ndarray,
    rng: jax.Array | None = None,
    dropout: float = 0.5,
) -> jnp.ndarray:
    """KNN-smoothed, L2-normalized gaussian features.

    Mirrors GaussianModel.get_smoothed_gaussian_features
    (scene/gaussian_model.py:79-104): normalize per-gaussian features,
    select a random subset of ceil(K*dropout) neighbor slots (ONE shared
    permutation across all gaussians, as in the reference), average.

    features: (N, F); neighbor_idx: (N, K). Returns (N, F).
    """
    k = neighbor_idx.shape[1]
    # safe norm (dead slots are all-zero; linalg.norm grad at 0 is NaN)
    normed = features / jnp.sqrt(
        jnp.sum(features * features, axis=-1, keepdims=True) + 1e-12
    )
    if rng is not None and 0.0 < dropout < 1.0:
        n_sel = max(int(k * dropout), 1)
        perm = jax.random.permutation(rng, k)[:n_sel]
        sel = neighbor_idx[:, perm]
    else:
        sel = neighbor_idx
    return normed[sel].mean(axis=1)
