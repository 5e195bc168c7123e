"""Image metrics (jnp).

Behavioral contract: utils/image_utils.py in the reference (per-image
MSE/PSNR flattened over pixels, keeping the batch dim).
"""
from __future__ import annotations

import jax.numpy as jnp


def mse(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    return ((img1 - img2) ** 2).reshape(img1.shape[0], -1).mean(1, keepdims=True)


def psnr(img1: jnp.ndarray, img2: jnp.ndarray) -> jnp.ndarray:
    m = mse(img1, img2)
    return 20 * jnp.log10(1.0 / jnp.sqrt(m))


def bilinear_resize(img: jnp.ndarray, out_h: int, out_w: int,
                    channel_last: bool = True) -> jnp.ndarray:
    """torch.nn.functional.interpolate(mode="bilinear",
    align_corners=False, antialias=False) equivalent — the reference's
    feature-image resample (train.py:284). jax.image.resize is NOT this
    op: it antialiases on downscale (kernel widened by the scale
    factor), which shifts the contrastive losses ~0.4% on a 2x
    downsample. Separable two-pass gather + lerp; differentiable.

    img: (H, W, C) when channel_last else (C, H, W).
    """
    if not channel_last:
        return bilinear_resize(img.transpose(1, 2, 0), out_h,
                               out_w).transpose(2, 0, 1)
    h, w = img.shape[:2]

    def taps(out_size, in_size):
        dst = jnp.arange(out_size, dtype=jnp.float32)
        src = jnp.clip((dst + 0.5) * (in_size / out_size) - 0.5,
                       0.0, in_size - 1)
        i0 = jnp.floor(src).astype(jnp.int32)
        i1 = jnp.minimum(i0 + 1, in_size - 1)
        return i0, i1, src - i0

    y0, y1, wy = taps(out_h, h)
    x0, x1, wx = taps(out_w, w)
    rows = (img[y0] * (1.0 - wy)[:, None, None]
            + img[y1] * wy[:, None, None])  # (out_h, W, C)
    return (rows[:, x0] * (1.0 - wx)[None, :, None]
            + rows[:, x1] * wx[None, :, None])
