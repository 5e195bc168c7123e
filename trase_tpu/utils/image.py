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
