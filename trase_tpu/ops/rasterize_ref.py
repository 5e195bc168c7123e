"""Slow-but-obvious reference compositor: O(N * H * W), pure jnp.

Serves as the correctness oracle for the tiled/Pallas rasterizer.
Implements the exact alpha-compositing semantics of the reference CUDA
kernel (diff-gaussian-rasterization forward, interface per SURVEY.md
§2.3a): per pixel, gaussians sorted front-to-back by view depth,
alpha = min(0.99, opacity * exp(-0.5 d^T conic d)), contributions
skipped below 1/255, termination when transmittance would drop below
1e-4, background blended with the residual transmittance (RGB only).

The sequential front-to-back loop is re-expressed as an exclusive
cumulative product over the depth-sorted axis, which XLA turns into a
log-depth scan — no per-pixel loops anywhere.
"""
from __future__ import annotations

import jax.numpy as jnp

from .projection import ALPHA_EPS, ProjectedGaussians

__all_constants__ = ("ALPHA_EPS",)  # re-export: source of truth lives
# in projection.py so the extent cull and the alpha thresholds can
# never drift apart
T_EPS = 1e-4
ALPHA_MAX = 0.99


def composite_weights(alphas: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Front-to-back compositing weights from per-sample alphas.

    alphas are ordered front-to-back along `axis`. Emulates the CUDA
    loop exactly: samples with alpha < 1/255 are skipped, and the loop
    terminates (sticky) when T * (1 - alpha) < 1e-4.

    Returns weights w_i = alpha_i * prod_{j<i}(1 - alpha_j) with the
    skip/termination mask applied; sum(w) = 1 - T_final.
    """
    alphas = jnp.where(alphas < ALPHA_EPS, 0.0, alphas)
    one_minus = 1.0 - alphas
    # exclusive cumprod: T_i = prod_{j<i} (1 - alpha_j), via shift
    T = jnp.concatenate(
        [
            jnp.ones_like(jnp.take(alphas, jnp.array([0]), axis=axis)),
            jnp.cumprod(one_minus, axis=axis).take(
                jnp.arange(alphas.shape[axis] - 1), axis=axis
            ),
        ],
        axis=axis,
    )
    done = (T * one_minus < T_EPS) & (alphas > 0.0)
    sticky_done = jnp.cumsum(done.astype(jnp.int32), axis=axis) > 0
    return jnp.where(sticky_done, 0.0, alphas * T)


def rasterize_reference(
    proj: ProjectedGaussians,
    extra_channels: jnp.ndarray | None,
    bg_color: jnp.ndarray,
    image_height: int,
    image_width: int,
):
    """Composite all gaussians against every pixel.

    extra_channels: optional (N, F) per-gaussian channels (e.g. the 32-dim
    segmentation features) composited with the same weights, no background.

    Returns dict with render (3,H,W), feats (F,H,W) or None, depth (1,H,W),
    alpha (1,H,W).
    """
    N = proj.mean2d.shape[0]
    order = jnp.argsort(jnp.where(proj.valid, proj.depth, jnp.inf))
    mean2d = proj.mean2d[order]
    conic = proj.conic[order]
    opacity = jnp.where(proj.valid, proj.opacity, 0.0)[order]
    color = proj.color[order]
    depth = proj.depth[order]
    extra = None if extra_channels is None else extra_channels[order]

    ys = jnp.arange(image_height, dtype=mean2d.dtype)
    xs = jnp.arange(image_width, dtype=mean2d.dtype)
    px, py = jnp.meshgrid(xs, ys)  # (H, W)
    pix = jnp.stack([px.ravel(), py.ravel()], axis=1)  # (P, 2)

    d = mean2d[:, None, :] - pix[None, :, :]  # (N, P, 2)
    power = (
        -0.5 * (conic[:, 0, None] * d[..., 0] ** 2 + conic[:, 2, None] * d[..., 1] ** 2)
        - conic[:, 1, None] * d[..., 0] * d[..., 1]
    )
    alpha = jnp.minimum(
        ALPHA_MAX, opacity[:, None] * jnp.exp(jnp.minimum(power, 0.0))
    )
    alpha = jnp.where(power > 0.0, 0.0, alpha)

    w = composite_weights(alpha, axis=0)  # (N, P)

    acc = w.sum(axis=0)  # (P,)
    rgb = w.T @ color  # (P, 3)
    rgb = rgb + (1.0 - acc)[:, None] * bg_color[None, :]
    out_depth = w.T @ depth[:, None]  # (P, 1)

    result = {
        "render": rgb.T.reshape(3, image_height, image_width),
        "depth": out_depth.T.reshape(1, image_height, image_width),
        "alpha": acc.reshape(1, image_height, image_width),
    }
    if extra is not None:
        feats = w.T @ extra  # (P, F)
        result["feats"] = feats.T.reshape(-1, image_height, image_width)
    return result
