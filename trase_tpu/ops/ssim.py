"""Windowed SSIM in jnp.

Behavioral contract: utils/loss_utils.py:46-86 in the reference
(11x11 gaussian window, sigma 1.5, SAME zero padding, C1=0.01^2,
C2=0.03^2).

TPU note: the obvious depthwise grouped convolution does NOT map to
the MXU (grouped convs lower to slow VPU loops — 64 ms/image at 1K on
v5e). The separable gaussian is instead applied as two dense BANDED
matrix multiplies, (C*H, W) @ (W, W) then (H, H) @ ..., which ride the
MXU at full rate; rows near the border simply lack taps, which is
exactly SAME-with-zeros semantics.
"""
from __future__ import annotations

import functools
import math

import jax.numpy as jnp
from jax import lax


@functools.lru_cache(maxsize=8)
def _gauss_1d(window_size: int, sigma: float):
    import numpy as np

    g = np.array(
        [
            math.exp(-((x - window_size // 2) ** 2) / (2 * sigma**2))
            for x in range(window_size)
        ]
    )
    return (g / g.sum()).astype(np.float32)


def _depthwise_conv(img: jnp.ndarray, window_size: int = 11,
                    sigma: float = 1.5) -> jnp.ndarray:
    """img: (C,H,W) -> (C,H,W), separable gaussian as shifted adds.

    Exact f32, SAME-with-zeros semantics. Earlier banded (W,W)/(H,H)
    matmuls treated the 11-tap band as dense — 122x the needed FLOPs
    (measured 6.3 ms fwd+bwd at 1K on v5e); 2x11 scaled shifted
    slices are pure VPU streaming instead.
    """
    g = _gauss_1d(window_size, sigma)
    half = window_size // 2
    c, h, w = img.shape
    xp = jnp.pad(img, ((0, 0), (0, 0), (half, half)))
    y = sum(float(g[k]) * lax.dynamic_slice_in_dim(xp, k, w, axis=2)
            for k in range(window_size))
    yp = jnp.pad(y, ((0, 0), (half, half), (0, 0)))
    return sum(float(g[k]) * lax.dynamic_slice_in_dim(yp, k, h, axis=1)
               for k in range(window_size))


def ssim(
    img1: jnp.ndarray,
    img2: jnp.ndarray,
    window_size: int = 11,
    size_average: bool = True,
):
    """SSIM over (C,H,W) images in [0,1]."""
    # separate convs fuse better than one conv over a stacked tensor
    # (measured 4.1 vs 7.5 ms fwd+bwd at 1K on v5e)
    mu1 = _depthwise_conv(img1, window_size)
    mu2 = _depthwise_conv(img2, window_size)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window_size) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window_size) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window_size) - mu1_mu2
    c1, c2 = 0.01**2, 0.03**2
    ssim_map = ((2 * mu1_mu2 + c1) * (2 * sigma12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (sigma1_sq + sigma2_sq + c2)
    )
    if size_average:
        return ssim_map.mean()
    return ssim_map.reshape(ssim_map.shape[0], -1).mean(1)
