"""Image metrics (jnp).

Behavioral contract: utils/image_utils.py in the reference (per-image
MSE/PSNR flattened over pixels, keeping the batch dim).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


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


def _lerp_matrix(out_size: int, in_size: int) -> np.ndarray:
    """(out_size, in_size) matrix with the two bilinear taps per row
    (align_corners=False, no antialias) — W @ x == the 1-D lerp
    resample. Built in numpy at trace time: the weights are static."""
    dst = np.arange(out_size, dtype=np.float64)
    src = np.clip((dst + 0.5) * (in_size / out_size) - 0.5,
                  0.0, in_size - 1)
    i0 = np.floor(src).astype(np.int64)
    i1 = np.minimum(i0 + 1, in_size - 1)
    f = (src - i0).astype(np.float32)
    m = np.zeros((out_size, in_size), np.float32)
    m[np.arange(out_size), i0] += 1.0 - f
    m[np.arange(out_size), i1] += f
    return m


def bilinear_resize_mm(img: jnp.ndarray, out_h: int,
                       out_w: int) -> jnp.ndarray:
    """bilinear_resize as two MXU contractions against static 2-tap
    lerp matrices. Same values (within MXU f32 accumulation rounding)
    and the same align_corners=False/no-antialias semantics, but the
    VJP is two transposed matmuls — fully dense, no scatter. The
    gather/scatter formulations (bilinear_resize's VJP, or the
    point-tap sampler's 4P-row scatter) make XLA choose a channel-
    major scatter layout and insert two ~5 ms while-loop relayouts at
    1K/33ch (r5 device trace, fstep while.1); this form costs ~2-3 ms
    fwd+bwd in plain dots. img: (H, W, C) -> (out_h, out_w, C)."""
    h, w = img.shape[:2]
    wh = jnp.asarray(_lerp_matrix(out_h, h))
    ww = jnp.asarray(_lerp_matrix(out_w, w))
    rows = jnp.einsum("oh,hwc->owc", wh, img,
                      precision=jax.lax.Precision.HIGHEST)
    return jnp.einsum("pw,owc->opc", ww, rows,
                      precision=jax.lax.Precision.HIGHEST)


def _bilinear_taps(dst: jnp.ndarray, in_size: int, out_size: int):
    """Source taps for output coordinates `dst` under the
    align_corners=False convention (same formula as bilinear_resize)."""
    src = jnp.clip((dst.astype(jnp.float32) + 0.5) * (in_size / out_size)
                   - 0.5, 0.0, in_size - 1)
    i0 = jnp.floor(src).astype(jnp.int32)
    i1 = jnp.minimum(i0 + 1, in_size - 1)
    return i0, i1, src - i0


def bilinear_sample_flat(img: jnp.ndarray, pixel_idx: jnp.ndarray,
                         out_h: int, out_w: int) -> jnp.ndarray:
    """Rows `pixel_idx` of
    ``bilinear_resize(img, out_h, out_w).reshape(-1, C)`` WITHOUT
    materializing the resized image or its dense VJP.

    The FEATURE-phase contrastive loss consumes only P sampled pixels
    of the mask-resolution feature image (reference train.py:284
    resizes the whole (H, W, 32) render first); gathering the four
    bilinear taps per sampled pixel is the same value with the same
    lerp association — P*4 point gathers forward and a 4P-point
    scatter-add backward instead of full-image traffic both ways.

    img: (H, W, C); pixel_idx: (P,) flat indices into the
    (out_h, out_w) grid. Returns (P, C).
    """
    h, w = img.shape[:2]
    y0, y1, wy = _bilinear_taps(pixel_idx // out_w, h, out_h)
    x0, x1, wx = _bilinear_taps(pixel_idx % out_w, w, out_w)
    wy = wy[:, None]
    wx = wx[:, None]
    r0 = img[y0, x0] * (1.0 - wy) + img[y1, x0] * wy
    r1 = img[y0, x1] * (1.0 - wy) + img[y1, x1] * wy
    return r0 * (1.0 - wx) + r1 * wx
