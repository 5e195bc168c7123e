"""LPIPS perceptual metric in JAX (VGG16 backbone).

Behavioral contract: lpipsPyTorch/ in the reference (LPIPS v0.1:
ImageNet-normalized VGG16 activations at conv{1_2,2_2,3_3,4_3,5_3},
channel-unit-normalized, squared difference, non-negative 1x1 linear
heads, spatial mean, summed over layers).

Weights: the backbone and the linear heads both need pretrained
parameters; this environment ships neither (no torchvision, no model
zoo, zero egress). ``make_lpips`` therefore requires weight files —
``vgg_weights`` (torchvision vgg16 state_dict / .npz) and optionally
``lin_weights`` (official LPIPS 'vgg.pth' state_dict with lin{i}
layers; uniform heads otherwise). Without vgg weights it returns None
and callers must skip the metric (the score would be meaningless).
"""
from __future__ import annotations

import os

import jax.numpy as jnp
import numpy as np

from ..models.vgg import VGGFeatureExtractor, VGG16_BLOCKS, load_vgg_weights

# post-ReLU activations of conv{1_2,2_2,3_3,4_3,5_3}: the reference's
# VGG16 target_layers [4,9,16,23,30] are 1-based feature-module indices
# (networks.py enumerate(..., 1)), i.e. the ReLU outputs
_LPIPS_LAYERS = ["relu1_2", "relu2_2", "relu3_3", "relu4_3", "relu5_3"]
_LPIPS_CHANNELS = [64, 128, 256, 512, 512]

# LPIPS v0.1 scaling layer (reference networks.py:41-44) — NOT the
# ImageNet stats; applied to inputs as given (the reference callers
# pass [0,1] images straight through, metrics_segmentation.py:145)
_LPIPS_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_LPIPS_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def load_lin_weights(path: str | None):
    """LPIPS linear-head weights: official .pth
    ('lin{i}.model.1.weight') or tools/fetch_vgg_weights.py .npz
    (keys 'lin0'..'lin4')."""
    if not path or not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        z = np.load(path)
        if not all(f"lin{i}" in z.files for i in range(5)):
            return None
        return [np.asarray(z[f"lin{i}"], np.float32) for i in range(5)]
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    out = []
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                out.append(np.asarray(sd[key], np.float32)[:, :, 0, 0][0])
                break
        else:
            return None
    return out


def make_lpips(vgg_weights: str | None, lin_weights: str | None = None):
    """Returns lpips(img1, img2) -> scalar, or None without weights.

    img1/img2: (3,H,W) or (N,3,H,W) in [0,1].
    """
    weights = load_vgg_weights(vgg_weights) if vgg_weights else None
    if weights is None:
        return None
    fx = VGGFeatureExtractor(_LPIPS_LAYERS, VGG16_BLOCKS, weights,
                             normalization=(_LPIPS_SHIFT, _LPIPS_SCALE))
    lins = load_lin_weights(lin_weights)
    if lins is None:
        # uniform heads: still a valid perceptual distance, just not
        # the calibrated LPIPS v0.1 weighting
        print("[lpips] WARNING: no linear-head weights — using uniform "
              "heads. Reported values are a VGG perceptual distance, "
              "NOT calibrated LPIPS v0.1; do not compare against "
              "published LPIPS numbers (pass --lpips_weights).")
        lins = [np.full(c, 1.0 / c, np.float32) for c in _LPIPS_CHANNELS]
    lins = [jnp.asarray(w) for w in lins]

    def lpips(img1, img2):
        f1 = fx(img1)
        f2 = fx(img2)
        total = 0.0
        for name, w in zip(_LPIPS_LAYERS, lins):
            a, b = f1[name], f2[name]
            # reference normalize_activation: eps OUTSIDE the sqrt
            # (utils.py:6-8)
            a = a / (jnp.sqrt(jnp.sum(a * a, 1, keepdims=True)) + 1e-10)
            b = b / (jnp.sqrt(jnp.sum(b * b, 1, keepdims=True)) + 1e-10)
            d = (a - b) ** 2  # (N, C, H, W)
            total = total + jnp.einsum("nchw,c->n", d, w) / (
                d.shape[2] * d.shape[3])
        return total.mean()

    return lpips
