"""RGB losses (jnp).

Behavioral contract: utils/loss_utils.py:30-87 in the reference (L1,
masked L1, weighted L1, L2, windowed SSIM).
"""
from __future__ import annotations

import jax.numpy as jnp

from ..ops.ssim import ssim  # re-export: same call surface  # noqa: F401


def l1_loss(output: jnp.ndarray, gt: jnp.ndarray) -> jnp.ndarray:
    return jnp.abs(output - gt).mean()


def masked_l1_loss(output, gt, mask):
    m = jnp.broadcast_to(mask.astype(output.dtype)[None], gt.shape)
    loss = jnp.abs(output - gt) * m
    return loss.sum() / m.sum()


def weighted_l1_loss(output, gt, weight):
    return (jnp.abs(output - gt) * weight).mean()


def l2_loss(output, gt):
    return ((output - gt) ** 2).mean()
