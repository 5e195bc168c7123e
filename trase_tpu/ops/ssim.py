"""Windowed SSIM in jnp (depthwise gaussian convolution).

Behavioral contract: utils/loss_utils.py:46-86 in the reference
(11x11 gaussian window, sigma 1.5, SAME padding, C1=0.01^2, C2=0.03^2).
The depthwise conv compiles to an XLA convolution that fuses with the
surrounding elementwise ops.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=8)
def _window_np(window_size: int, sigma: float):
    import numpy as np

    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
            for x in range(window_size)
        ]
    )
    g = g / g.sum()
    w2d = np.outer(g, g).astype(np.float32)
    return w2d


def _depthwise_conv(img: jnp.ndarray, window: jnp.ndarray) -> jnp.ndarray:
    """img: (C,H,W); window: (S,S) -> (C,H,W) SAME-padded depthwise conv."""
    c = img.shape[0]
    s = window.shape[0]
    kernel = jnp.broadcast_to(window, (c, 1, s, s))  # (O=C, I/g=1, S, S)
    out = lax.conv_general_dilated(
        img[None],  # (1, C, H, W)
        kernel,
        window_strides=(1, 1),
        padding=[(s // 2, s // 2), (s // 2, s // 2)],
        feature_group_count=c,
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out[0]


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
):
    """SSIM over (C,H,W) images in [0,1]."""
    window = jnp.asarray(_window_np(window_size, 1.5))
    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.reshape(ssim_map.shape[0], -1).mean(1)
