"""Style-transfer losses (jnp).

Behavioral contract: utils/loss_utils.py:223-272 in the reference
(NNFM nearest-neighbor feature matching on VGG feature maps, gram /
AdaIN / MSE content losses).
"""
from __future__ import annotations

import jax.numpy as jnp


def loss_nnfm_style(feat1: jnp.ndarray, feat2: jnp.ndarray) -> jnp.ndarray:
    """Nearest-neighbor feature matching: for each column of feat1 the
    minimum cosine distance to any column of feat2, averaged.
    feat1/feat2: (C, N1) / (C, N2) feature matrices."""
    f1 = feat1 / (jnp.linalg.norm(feat1, axis=0, keepdims=True) + 1e-12)
    f2 = feat2 / (jnp.linalg.norm(feat2, axis=0, keepdims=True) + 1e-12)
    sim = f1.T @ f2  # (N1, N2) MXU matmul
    return (1.0 - sim.max(axis=1)).mean()


def _mean_std(x, eps=1e-8):
    """Channel-wise instance stats of (N, C, ...)."""
    flat = x.reshape(x.shape[0], x.shape[1], -1)
    mean = flat.mean(-1, keepdims=True)
    std = flat.std(-1, ddof=1, keepdims=True) + eps
    return mean, std


def gram_matrix(t: jnp.ndarray) -> jnp.ndarray:
    b, d, h, w = t.shape
    flat = t.reshape(d, h * w)
    return flat @ flat.T


def adain_style_loss(x, y):
    xm, xs = _mean_std(x)
    ym, ys = _mean_std(y)
    return ((xm - ym) ** 2).mean() + ((xs - ys) ** 2).mean()


def style_loss_gram(target, style, weight):
    _, d, h, w = target.shape
    tg, sg = gram_matrix(target), gram_matrix(style)
    return weight * ((tg - sg) ** 2).mean() / (d * h * w)


def mse_content_loss(x, y):
    return ((x - y) ** 2).mean()
