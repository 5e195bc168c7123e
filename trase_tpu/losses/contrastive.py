"""SAM-mask contrastive feature losses (static-shape jnp).

Behavioral contract: utils/feature_utils.py and
utils/loss_utils.py:274-406 in the reference. Differences forced by
XLA's static shapes, chosen to preserve the training distribution:

- the reference Bernoulli-samples pixels/masks (variable count ~ P);
  here we draw EXACTLY `num_sampled_pixels` pixels uniformly without
  replacement from the masked region (random-key top-k), with a
  validity flag when fewer masked pixels exist. Same for masks.
- every (P, P) quantity carries the pair-validity mask; invalid slots
  are excluded from both numerators and pair counts, so loss values
  match the reference's on the sampled set.

The (P, P) correspondence matrices are plain MXU matmuls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class PixelSample(NamedTuple):
    pixel_idx: jnp.ndarray  # (P,) flat indices into H*W
    pixel_valid: jnp.ndarray  # (P,) bool
    mask_sel: jnp.ndarray  # (M,) bool — which SAM masks participate


def sample_pixels_and_masks(
    rng: jax.Array,
    sam_masks: jnp.ndarray,  # (M, H, W) float/bool; padded masks all-zero
    mask_valid: jnp.ndarray,  # (M,) bool — real (non-padding) masks
    num_sampled_pixels: int,
    num_sampled_masks: int,
    extra_pixel_mask: jnp.ndarray | None = None,  # (H,W) bool, True = allowed
) -> PixelSample:
    """Fixed-size analogue of get_sample_pixel_and_mask
    (utils/feature_utils.py:17-26): pixels are drawn only from the
    union of the SAM masks; masks are subsampled to ~num_sampled_masks."""
    m, h, w = sam_masks.shape
    rng_p, rng_m = jax.random.split(rng)

    in_any_mask = (sam_masks.sum(axis=0) > 0).reshape(-1)
    if extra_pixel_mask is not None:
        in_any_mask = in_any_mask & extra_pixel_mask.reshape(-1)
    scores = jax.random.uniform(rng_p, (h * w,))
    scores = jnp.where(in_any_mask, scores, jnp.inf)
    neg_top, pixel_idx = jax.lax.top_k(-scores, num_sampled_pixels)
    pixel_valid = jnp.isfinite(-neg_top)

    mask_rate = num_sampled_masks / jnp.maximum(mask_valid.sum(), 1)
    mask_sel = (
        (jax.random.uniform(rng_m, (m,)) < mask_rate) & mask_valid
    )
    return PixelSample(pixel_idx=pixel_idx, pixel_valid=pixel_valid,
                       mask_sel=mask_sel)


def pixel_mask_correspondence_matrix(
    sam_masks: jnp.ndarray, sample: PixelSample
) -> jnp.ndarray:
    """C[h,j] = 1 iff some selected mask contains both sampled pixels
    (utils/feature_utils.py:40-48)."""
    m = sam_masks.shape[0]
    flat = sam_masks.reshape(m, -1)
    v = flat[:, sample.pixel_idx].astype(jnp.float32)  # (M, P)
    v = v * sample.mask_sel[:, None].astype(jnp.float32)
    corr = jnp.einsum("nh,nj->hj", v, v, preferred_element_type=jnp.float32)
    return (corr != 0).astype(jnp.float32)


def features_correspondence_matrix(
    rendered_features: jnp.ndarray, sample: PixelSample
) -> jnp.ndarray:
    """Cosine gram of L2-normalized rendered features at sampled pixels
    (utils/feature_utils.py:50-56). rendered_features: (F, H, W)."""
    f = rendered_features.reshape(rendered_features.shape[0], -1)
    s = f[:, sample.pixel_idx].T  # (P, F)
    return _cosine_gram(s)


def features_correspondence_matrix_hwc(
    rendered_features_hwc: jnp.ndarray, sample: PixelSample
) -> jnp.ndarray:
    """Same gram from a channels-last (H, W, F) feature image — the
    kernel-native layout; sampling becomes a cheap row gather."""
    f = rendered_features_hwc.reshape(-1, rendered_features_hwc.shape[-1])
    s = f[sample.pixel_idx]  # (P, F)
    return _cosine_gram(s)


def _cosine_gram(s: jnp.ndarray) -> jnp.ndarray:
    # safe normalize: linalg.norm has a NaN gradient at exactly 0, and
    # padded/invalid sample slots can land on zero-feature background px
    n = jnp.sqrt(jnp.sum(s * s, axis=-1, keepdims=True) + 1e-12)
    s = s / n
    return jnp.einsum("hc,jc->hj", s, s, preferred_element_type=jnp.float32)


def pixel_weights(sam_masks: jnp.ndarray, sample: PixelSample) -> jnp.ndarray:
    """Mask-size-balanced per-pair weights in [1, 10]
    (utils/feature_utils.py:28-38)."""
    m = sam_masks.shape[0]
    flat = sam_masks.astype(jnp.float32).reshape(m, -1)
    sizes = flat.sum(axis=1)  # (M,)
    per_pixel_size_sum = (flat * sizes[:, None]).sum(axis=0)  # (HW,)
    per_pixel_count = flat.sum(axis=0)
    mean_size = per_pixel_size_sum / (per_pixel_count + 1e-9)
    mean_size = mean_size[sample.pixel_idx]  # (P,)
    ptp = mean_size[None, :] * mean_size[:, None]
    ptp_max = ptp.max()
    ptp = jnp.where(ptp == 0, 1e10, ptp)
    wgt = jnp.clip(ptp_max / ptp, 1.0, None)
    wgt = (wgt - wgt.min()) / (wgt.max() - wgt.min() + 1e-12) * 9.0 + 1.0
    return wgt


def _pair_masks(C: jnp.ndarray, sample: PixelSample):
    p = C.shape[0]
    valid = sample.pixel_valid
    pair_valid = valid[:, None] & valid[None, :]
    diag = jnp.eye(p, dtype=bool)
    triu = jnp.triu(jnp.ones((p, p), dtype=bool))
    return pair_valid & ~diag & triu


def _masked_loss(values, select_mask, count_mask, weights, mode_mean: bool):
    """sum/mean of values over select_mask; 'all'/'soft' divide by
    |count_mask| (the reference's number_of_all_pixel_pair)."""
    if weights is not None:
        values = values * weights
    num = jnp.where(select_mask, values, 0.0).sum()
    if mode_mean:
        denom = select_mask.sum()
    else:
        denom = count_mask.sum()
    loss = num / jnp.maximum(denom, 1)
    return jnp.where(select_mask.sum() == 0, 0.0, loss)


def positive_loss_all(C, C_F, sample, positive_th=0.75, weights=None):
    base = _pair_masks(C, sample)
    col_has = jnp.any(C == 1, axis=0)  # (P,) broadcast over columns
    count_mask = base & col_has[None, :]
    select = count_mask & (C == 1)
    return _masked_loss(-C_F, select, count_mask, weights, mode_mean=False)


def negative_loss_all(C, C_F, sample, negative_th=0.5, weights=None):
    base = _pair_masks(C, sample)
    col_has = jnp.any(C == 0, axis=0)
    count_mask = base & col_has[None, :]
    select = count_mask & (C == 0)
    return _masked_loss(jax.nn.relu(C_F), select, count_mask, weights,
                        mode_mean=False)


def positive_loss_soft(C, C_F, sample, positive_th=0.75, weights=None):
    base = _pair_masks(C, sample)
    col_has = jnp.any((C_F < positive_th) & (C == 1), axis=0)
    count_mask = base & col_has[None, :]
    select = count_mask & (C == 1)
    return _masked_loss(-C_F, select, count_mask, weights, mode_mean=False)


def negative_loss_soft(C, C_F, sample, negative_th=0.5, weights=None):
    base = _pair_masks(C, sample)
    col_has = jnp.any((C_F > negative_th) & (C == 0), axis=0)
    count_mask = base & col_has[None, :]
    select = count_mask & (C == 0)
    return _masked_loss(jax.nn.relu(C_F), select, count_mask, weights,
                        mode_mean=False)


def positive_loss_hard(C, C_F, sample, positive_th=0.75, weights=None):
    base = _pair_masks(C, sample)
    select = base & (C_F < positive_th) & (C == 1)
    return _masked_loss(-C_F, select, select, weights, mode_mean=True)


def negative_loss_hard(C, C_F, sample, negative_th=0.5, weights=None):
    base = _pair_masks(C, sample)
    select = base & (C_F > negative_th) & (C == 0)
    return _masked_loss(jax.nn.relu(C_F), select, select, weights,
                        mode_mean=True)


positive_pixel_pair_loss = {
    "hard": positive_loss_hard,
    "all": positive_loss_all,
    "soft": positive_loss_soft,
}

negative_pixel_pair_loss = {
    "hard": negative_loss_hard,
    "all": negative_loss_all,
    "soft": negative_loss_soft,
}
