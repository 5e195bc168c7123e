"""Clustering-module tests: HDBSCAN + k-means recover well-separated
feature clusters; postprocessing thresholds cosine scores; artifact
round-trip matches the reference clusters.pt layout."""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def _blobby_features(n_per=200, k=4, dim=32, seed=0):
    rng = np.random.default_rng(seed)
    centers = rng.normal(size=(k, dim)) * 3
    feats, labels = [], []
    for i, c in enumerate(centers):
        feats.append(c + rng.normal(0, 0.05, size=(n_per, dim)))
        labels.append(np.full(n_per, i))
    return (np.concatenate(feats).astype(np.float32),
            np.concatenate(labels))


def _purity(pred, true):
    total = 0
    for p in np.unique(pred):
        vals, counts = np.unique(true[pred == p], return_counts=True)
        total += counts.max()
    return total / len(true)


def test_hdbscan_recovers_blobs():
    from trase_tpu.cluster import hdbscan_cluster

    feats, true = _blobby_features()
    ids, rgb, centers, k = hdbscan_cluster(feats, sample_percent=1.0)
    assert ids.shape == (len(feats),)
    assert rgb.shape == (len(feats), 3)
    assert _purity(ids, true) > 0.95


def test_kmeans_recovers_blobs():
    from trase_tpu.cluster import kmeans_cluster

    feats, true = _blobby_features()
    ids, rgb, centers = kmeans_cluster(feats, k=4, iters=30)
    assert _purity(ids, true) > 0.95
    assert centers.shape == (4, 32)


def test_postprocessing_threshold():
    from trase_tpu.cluster import postprocessing

    feats, true = _blobby_features(n_per=50)
    query = feats[true == 2].mean(axis=0)
    mask = postprocessing(feats, query, score_threshold=0.9)
    # all of cluster 2, nothing else
    assert mask[true == 2].all()
    assert not mask[true != 2].any()


def test_cluster_artifact_roundtrip(tmp_path):
    from trase_tpu.cluster import load_clusters, save_clusters

    ids = np.arange(10, dtype=np.int64)
    rgb = np.random.default_rng(0).random((10, 3)).astype(np.float32)
    p = str(tmp_path / "clusters.pt")
    save_clusters(p, ids, rgb)
    ids2, rgb2 = load_clusters(p)
    np.testing.assert_array_equal(ids, ids2)
    np.testing.assert_allclose(rgb, rgb2)

    # torch-side readability (the reference loads via torch.load)
    import torch

    obj = torch.load(p, map_location="cpu", weights_only=False)
    assert set(obj.keys()) == {"id", "rgb"}
