"""Unsupervised object clustering of the 32-dim gaussian feature field.

Behavioral contract: the GUI clustering callbacks (gui.py:248-319) and
query-time refinement (gui.py:456-464, render.py:97-104):

- HDBSCAN path: L2-normalize features, subsample 2%, HDBSCAN
  (min_cluster_size=10, cluster_selection_epsilon=0.01,
  allow_single_cluster=False) on the host, normalized cluster centers
  (index 0 is the noise cluster, matching the reference's off-by-one
  center loop), then assign ALL gaussians by max cosine (`seg_score`,
  an MXU matmul).
- K-Means path: k-means on normalized features (jnp Lloyd iterations
  on device; the reference uses kmeans_pytorch on GPU).
- `postprocessing`: cosine of every gaussian's feature against a query
  feature, thresholded.
- Artifacts: clusters.pt / clusters_kmeans.pt dicts {"id", "rgb"},
  torch-serialized for cross-tool compatibility when torch is
  available, .npz otherwise.
"""
from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np

# the reference colors labels with a fixed random palette (gui.py:170)
_PALETTE = np.random.default_rng(0).random((1000, 3))


def _normalize(x: np.ndarray) -> np.ndarray:
    return x / (np.linalg.norm(x, axis=-1, keepdims=True) + 1e-12)


def seg_score_assign(features: np.ndarray,
                     centers: np.ndarray) -> np.ndarray:
    """Cosine score of every gaussian against every cluster center
    (gui.py:288: einsum('nc,bc->bn')). Returns (N, K) scores.

    Pure numpy on purpose: the clustering tools are host-side (the
    reference runs HDBSCAN on CPU too) and must not touch the
    accelerator — a clustering CLI should work with no device at all.
    """
    f = np.asarray(_normalize(features), np.float32)
    c = np.asarray(centers, np.float32)
    return f @ c.T


def hdbscan_cluster(
    features: np.ndarray,
    sample_percent: float = 0.02,
    min_cluster_size: int = 10,
    cluster_selection_epsilon: float = 0.01,
    seed: int = 0,
    min_samples: int | None = None,
):
    """HDBSCAN on a subsample + cosine assignment of all gaussians.

    Returns (ids (N,), rgb (N,3), centers (K,32), n_clusters).
    """
    try:
        from sklearn.cluster import HDBSCAN as _HDBSCAN  # noqa: N811

        def fit_predict(x):
            return _HDBSCAN(
                min_cluster_size=min_cluster_size,
                cluster_selection_epsilon=cluster_selection_epsilon,
                min_samples=min_samples,
                n_jobs=-1,
            ).fit_predict(x)
    except ImportError:  # pragma: no cover - hdbscan pkg fallback
        import hdbscan as _hd

        def fit_predict(x):
            return _hd.HDBSCAN(
                min_cluster_size=min_cluster_size,
                cluster_selection_epsilon=cluster_selection_epsilon,
                allow_single_cluster=False,
            ).fit_predict(x)

    rng = np.random.default_rng(seed)
    normed = _normalize(features)
    keep = rng.random(features.shape[0]) > (1 - sample_percent)
    if keep.sum() < max(min_cluster_size * 2, 32):
        keep = np.ones(features.shape[0], bool)  # tiny scenes: use all
    sampled = _normalize(features[keep])

    labels = fit_predict(sampled.astype(np.float64))
    uniq = np.unique(labels)  # sorted; -1 (noise) first when present
    k = len(uniq)
    # reference center loop (gui.py:285-287) maps center i <- label i-1,
    # assuming a noise cluster at label -1; indexing by the actual
    # sorted labels is identical when noise is present and avoids
    # dropping the last cluster when it is not
    centers = np.zeros((k, sampled.shape[-1]), np.float32)
    for i, lab in enumerate(uniq):
        members = sampled[labels == lab]
        if len(members):
            centers[i] = _normalize(members.mean(axis=0))

    scores = seg_score_assign(normed, centers)
    ids = scores.argmax(axis=-1).astype(np.int64)
    rgb = _PALETTE[ids].astype(np.float32)
    return ids, rgb, centers, k


def kmeans_cluster(features: np.ndarray, k: int = 64, iters: int = 50,
                   seed: int = 0):
    """Lloyd k-means on normalized features (jnp, device-resident).

    Returns (ids (N,), rgb (N,3), centers (k,32))."""
    x = jnp.asarray(_normalize(features))
    n = x.shape[0]
    # k-means++ init (greedy D^2 sampling): random init can collapse
    # two centers into one blob and lose a cluster entirely
    rng = np.random.default_rng(seed)
    xn = np.asarray(x)
    centers_list = [xn[rng.integers(n)]]
    d2_min = np.full(n, np.inf, np.float32)
    for _ in range(k - 1):
        d2_min = np.minimum(
            d2_min, ((xn - centers_list[-1]) ** 2).sum(axis=1))
        probs = d2_min / max(d2_min.sum(), 1e-12)
        centers_list.append(xn[rng.choice(n, p=probs)])
    centers = jnp.asarray(np.stack(centers_list))

    @jax.jit
    def step(centers):
        d2 = (
            jnp.sum(x * x, 1, keepdims=True)
            - 2.0 * x @ centers.T
            + jnp.sum(centers * centers, 1)[None, :]
        )
        assign = jnp.argmin(d2, axis=1)
        onehot = jax.nn.one_hot(assign, k, dtype=x.dtype)
        sums = onehot.T @ x
        counts = onehot.sum(0)[:, None]
        new_centers = jnp.where(counts > 0, sums / jnp.maximum(counts, 1),
                                centers)
        return new_centers, assign

    assign = None
    for _ in range(iters):
        centers, assign = step(centers)
    ids = np.asarray(assign).astype(np.int64)
    rgb = _PALETTE[ids].astype(np.float32)
    return ids, rgb, np.asarray(centers)


def postprocessing(features: np.ndarray, query_feature: np.ndarray,
                   score_threshold: float = 0.8) -> np.ndarray:
    """Cosine-threshold refinement (render.py:97-104). Returns bool (N,)."""
    f = _normalize(np.asarray(features, np.float32))
    q = _normalize(np.asarray(query_feature, np.float32).reshape(-1))
    scores = f @ q
    return scores >= score_threshold


def save_clusters(path: str, ids: np.ndarray, rgb: np.ndarray):
    """clusters.pt layout: {"id": (N,) array, "rgb": (N,3)}; torch
    serialization when available (reference interop), .npz fallback."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    try:
        import torch

        torch.save({"id": torch.from_numpy(np.asarray(ids)),
                    "rgb": torch.from_numpy(np.asarray(rgb))}, path)
    except ImportError:
        np.savez(path + ".npz", id=ids, rgb=rgb)


def load_clusters(path: str):
    """Returns (ids (N,), rgb (N,3)) from clusters.pt / .npz."""
    if os.path.exists(path):
        try:
            import torch

            obj = torch.load(path, map_location="cpu", weights_only=False)
            ids = np.asarray(obj["id"]).reshape(-1)
            rgb = np.asarray(obj["rgb"])
            return ids, rgb
        except ImportError:
            pass
    npz = path + ".npz" if not path.endswith(".npz") else path
    z = np.load(npz)
    return np.asarray(z["id"]).reshape(-1), np.asarray(z["rgb"])
