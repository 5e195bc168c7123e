"""Production tile-sorted differentiable rasterizer (XLA-native).

This is the TPU re-design of the reference's CUDA rasterizer
(submodules/diff-gaussian-rasterization; behavior contract per
SURVEY.md §2.3a). The CUDA algorithm — per-gaussian tile-range
assignment, global (tile, depth) key sort, then a sequential per-tile
front-to-back compositing loop with atomics in backward — maps onto
XLA/TPU as dense, static-shape ops:

1.  *Pair expansion*: each visible gaussian emits one (tile_id, depth)
    pair per covered tile. Variable counts become static shapes via a
    capacity buffer + searchsorted-over-cumsum gather (no scatter).
2.  *Binning*: one `lax.sort` over (tile_id, depth) keys; per-tile
    ranges recovered with searchsorted. This replaces CUDA's radix sort
    + per-tile ranges kernel.
3.  *Compositing*: per tile of 16x16 pixels, the front-to-back loop is
    an exclusive cumulative product over the depth-sorted axis followed
    by a (K x C)^T @ (K x P) matmul that composites RGB, the 32-dim
    segmentation features, and depth in ONE MXU contraction. Tiles are
    processed in rematerialized batches so backward memory stays flat.

Gradients flow through everything by XLA autodiff (gathers transpose to
scatter-adds — the moral equivalent of the CUDA backward's atomics).
The screen-space position gradient needed by densification
(train.py:366 in the reference) is exposed by the explicit
`mean2d_offset` input of `render()` in trase_tpu/renderer.py.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .projection import ProjectedGaussians
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

TILE = 16


class RasterConfig(NamedTuple):
    """Static rasterizer capacities (shape-defining; changing them
    recompiles)."""

    # Per-gaussian (tile, gaussian) pair budget, both backends. Rects
    # larger than this shrink to an aspect-balanced sub-rect around the
    # projected mean (dropped count reported as `overflow`). A
    # per-scene speed/quality knob: smaller K shrinks the sort, gather
    # and index maps linearly.
    pairs_per_gaussian: int = 8
    max_per_tile: int = 1024  # dense backend: gaussians composited/tile
    tile_batch: int = 32  # dense backend: tiles per remat batch
    # Drop (gaussian, tile) pairs whose best-case alpha over the tile is
    # below the 1/255 cutoff (exact: the kernel zeroes them anyway).
    # Off by default: measured on both isotropic and trained-like
    # anisotropic 100k scenes, the ~1 ms of bound math exceeds the
    # compositing saved — the aspect-balanced K-budget truncation
    # already drops the far tiles. Worth enabling for scenes with very
    # large splats or heavy overdraw. Pallas backend only.
    alpha_cull: bool = False
    # Unused since the Pallas kernels moved to fixed 16-tile row-segment
    # groups (their output blocks are image patches); kept so saved
    # configs stay loadable.
    tile_group: int = 16
    # Pack the extra (feature) channels bf16-paired inside the Pallas
    # payload stream: the FEATURE phase's 48-row payload becomes 32
    # rows, cutting the pair gather + kernel span-DMA traffic by a
    # third at bf16 feature precision (geometry/rgb/depth stay f32,
    # and so do all gradients). Pallas backend only; ignored when the
    # channel count is odd. Default ON since the r5 A/B: +3.5% FEATURE
    # step rate at quality parity (same-seed 1500-iter 1008px runs:
    # mIoU 0.709 vs 0.710, test PSNR 27.39 vs 27.09 — BASELINE.md r5).
    pack_features: bool = True


def _tile_grid(image_height: int, image_width: int):
    tw = -(-image_width // TILE)
    th = -(-image_height // TILE)
    return th, tw


def _tile_rects(proj: ProjectedGaussians, th: int, tw: int):
    """Per-gaussian covered tile rectangle.

    CUDA getRect semantics, but over the exact-support AABB
    (ProjectedGaussians.extent) when available instead of the circular
    3-sigma square — a strict subset whose dropped tiles composite
    exactly zero in every backend, so this is free pair-count
    reduction, not an approximation."""
    x, y = proj.mean2d[:, 0], proj.mean2d[:, 1]
    if proj.extent is not None:
        rx, ry = proj.extent[:, 0], proj.extent[:, 1]
    else:
        rx = ry = proj.radius
    tx0 = jnp.clip(jnp.floor((x - rx) / TILE), 0, tw).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((y - ry) / TILE), 0, th).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((x + rx) / TILE) + 1, 0, tw).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((y + ry) / TILE) + 1, 0, th).astype(jnp.int32)
    w = jnp.maximum(tx1 - tx0, 0)
    h = jnp.maximum(ty1 - ty0, 0)
    covered = proj.valid & (proj.radius > 0) & (rx > 0) & (ry > 0)
    count = jnp.where(covered, w * h, 0)
    return tx0, ty0, w, count


def clamp_rect_to_budget(tx0, ty0, rect_w, count, mean2d, K: int):
    """Aspect-balanced truncation of oversized tile rects (both
    backends): rects larger than K tiles shrink to a <= K-tile
    sub-rect centered on the projected mean, so the dropped tiles are
    the farthest (weakest) ones. Returns (x0, y0, w2, count2) with
    count2 <= K — CRITICAL for the dense backend's slot expansion,
    whose global pair buffer holds exactly n*K slots filled in
    gaussian-index order: unclamped rects overflow the buffer and
    silently starve every high-index gaussian (seen as whole objects
    vanishing at 1K resolutions)."""
    rect_h = count // jnp.maximum(rect_w, 1)
    w_f = jnp.maximum(rect_w, 1).astype(jnp.float32)
    h_f = jnp.maximum(rect_h, 1).astype(jnp.float32)
    ideal_w = jnp.sqrt(K * w_f / h_f)
    w2 = jnp.clip(jnp.round(ideal_w).astype(jnp.int32), 1,
                  jnp.minimum(rect_w, K))
    w2 = jnp.maximum(w2, 1)
    h2 = jnp.clip(K // w2, 1, jnp.maximum(rect_h, 1))
    count2 = jnp.where(count > 0, w2 * h2, 0)
    ct_x = jnp.floor(mean2d[:, 0] / TILE).astype(jnp.int32)
    ct_y = jnp.floor(mean2d[:, 1] / TILE).astype(jnp.int32)
    ct_x = jnp.clip(ct_x, tx0, tx0 + jnp.maximum(rect_w - 1, 0))
    ct_y = jnp.clip(ct_y, ty0, ty0 + jnp.maximum(rect_h - 1, 0))
    x0 = jnp.clip(ct_x - w2 // 2, tx0, tx0 + jnp.maximum(rect_w - w2, 0))
    y0 = jnp.clip(ct_y - h2 // 2, ty0, ty0 + jnp.maximum(rect_h - h2, 0))
    return x0, y0, w2, count2


def build_tile_lists(
    proj: ProjectedGaussians,
    image_height: int,
    image_width: int,
    cfg: RasterConfig,
):
    """Bin gaussians into depth-sorted per-tile lists.

    Returns (sorted_gauss_idx (P,), tile_start (T+1,), num_tiles, overflow)
    where `overflow` counts pairs dropped to the per-gaussian K budget
    or the per-tile cap (monitor; grow `pairs_per_gaussian` if nonzero).
    """
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    n = proj.mean2d.shape[0]
    K = cfg.pairs_per_gaussian
    p_cap = n * K

    tx0, ty0, rect_w, count = _tile_rects(proj, th, tw)
    x0, y0, w2, count2 = clamp_rect_to_budget(
        tx0, ty0, rect_w, count, proj.mean2d, K)
    overflow = jnp.sum(jnp.maximum(count - count2, 0))
    cum = jnp.cumsum(count2)  # inclusive; total <= p_cap by clamping
    total = cum[-1]

    slots = jnp.arange(p_cap, dtype=jnp.int32)
    g = jnp.searchsorted(cum, slots, side="right").astype(jnp.int32)
    g = jnp.minimum(g, n - 1)
    local = slots - (cum[g] - count2[g])
    w_g = jnp.maximum(w2[g], 1)
    dx = local % w_g
    dy = local // w_g
    tile_id = (y0[g] + dy) * tw + (x0[g] + dx)

    valid_pair = slots < total
    tile_key = jnp.where(valid_pair, tile_id, num_tiles).astype(jnp.int32)
    depth_key = jnp.where(valid_pair, proj.depth[g], jnp.inf)

    sorted_tile, _, sorted_gauss = jax.lax.sort(
        (tile_key, depth_key, g), num_keys=2
    )

    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32), side="left"
    ).astype(jnp.int32)
    # per-tile truncation by max_per_tile is real dropped work — count it
    tile_len = tile_start[1:] - tile_start[:-1]
    overflow = overflow + jnp.sum(
        jnp.maximum(tile_len - cfg.max_per_tile, 0))
    return sorted_gauss, tile_start, overflow


def _composite_tiles(
    tile_ids,  # (TB,) int32 tile indices in this batch
    sorted_gauss,  # (P,)
    tile_start,  # (T+1,)
    gdata,  # (N, C) packed per-gaussian channels [rgb|extra|depth]
    mean2d,  # (N, 2)
    conic,  # (N, 3)
    opacity,  # (N,)
    tw: int,
    K: int,
):
    """Composite a batch of tiles. Returns (TB, C, TILE*TILE) channels and
    (TB, TILE*TILE) accumulated alpha."""
    tb = tile_ids.shape[0]
    start = tile_start[tile_ids]  # (TB,)
    end = tile_start[tile_ids + 1]
    ks = jnp.arange(K, dtype=jnp.int32)
    idx = start[:, None] + ks[None, :]  # (TB, K)
    in_range = idx < end[:, None]
    idx = jnp.minimum(idx, sorted_gauss.shape[0] - 1)
    gs = sorted_gauss[idx]  # (TB, K)

    # Pixel centers of this tile batch.
    ty = tile_ids // tw
    tx = tile_ids % tw
    fx = jnp.arange(TILE, dtype=mean2d.dtype)
    local_x, local_y = jnp.meshgrid(fx, fx)  # (TILE, TILE): x varies fastest
    px = tx[:, None].astype(mean2d.dtype) * TILE + local_x.reshape(1, -1)
    py = ty[:, None].astype(mean2d.dtype) * TILE + local_y.reshape(1, -1)
    # px, py: (TB, 256)

    m2d = mean2d[gs]  # (TB, K, 2)
    con = conic[gs]  # (TB, K, 3)
    dx = m2d[..., 0:1] - px[:, None, :]  # (TB, K, 256)
    dy = m2d[..., 1:2] - py[:, None, :]
    power = (
        -0.5 * (con[..., 0:1] * dx * dx + con[..., 2:3] * dy * dy)
        - con[..., 1:2] * dx * dy
    )
    # Clamp before exp: power > 0 contributions are discarded below, but
    # exp(large) = inf would turn into inf * 0 = NaN in the backward pass.
    alpha = jnp.minimum(
        ALPHA_MAX, opacity[gs][..., None] * jnp.exp(jnp.minimum(power, 0.0))
    )
    alpha = jnp.where((power > 0.0) | ~in_range[..., None], 0.0, alpha)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)

    one_minus = 1.0 - alpha
    T = jnp.cumprod(one_minus, axis=1)
    T = jnp.concatenate([jnp.ones_like(T[:, :1]), T[:, :-1]], axis=1)
    done = (T * one_minus < T_EPS) & (alpha > 0.0)
    sticky = jnp.cumsum(done.astype(jnp.int32), axis=1) > 0
    w = jnp.where(sticky, 0.0, alpha * T)  # (TB, K, 256)

    vals = gdata[gs]  # (TB, K, C)
    out = jnp.einsum(
        "tkp,tkc->tcp", w, vals, preferred_element_type=jnp.float32
    )
    acc = w.sum(axis=1)  # (TB, 256)
    return out, acc


def rasterize_tiled(
    proj: ProjectedGaussians,
    extra_channels: jnp.ndarray | None,
    bg_color: jnp.ndarray,
    image_height: int,
    image_width: int,
    cfg: RasterConfig = RasterConfig(),
    with_color: bool = True,
):
    """Full-image tiled rasterization.

    Returns dict: render (3,H,W), feats (F,H,W) if extra_channels given,
    depth (1,H,W), alpha (1,H,W), overflow (scalar pair-drop count).

    with_color=False (requires extra_channels) composites ONLY the
    extra channels + alpha — the FEATURE-phase fast path: the rgb and
    depth rows carry zero cotangent in the contrastive loss, so
    dropping them is gradient-exact while cutting compositing and
    payload traffic (reference renders rgb unconditionally,
    gaussian_renderer/__init__.py:137-146; its FEATURE loss likewise
    never touches it, train.py:244-296).
    """
    if not with_color and extra_channels is None:
        raise ValueError("with_color=False requires extra_channels")
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    sorted_gauss, tile_start, overflow = build_tile_lists(
        proj, image_height, image_width, cfg
    )

    opacity = jnp.where(proj.valid, proj.opacity, 0.0)
    chans = [proj.color] if with_color else []
    if extra_channels is not None:
        chans.append(extra_channels)
    if with_color:
        chans.append(proj.depth[:, None])
    gdata = jnp.concatenate(chans, axis=1)  # (N, C)
    C = gdata.shape[1]

    tb = cfg.tile_batch
    n_batches = -(-num_tiles // tb)
    pad_tiles = n_batches * tb
    all_tiles = jnp.arange(pad_tiles, dtype=jnp.int32).reshape(n_batches, tb)
    all_tiles = jnp.minimum(all_tiles, num_tiles - 1)

    composite = functools.partial(
        _composite_tiles,
        sorted_gauss=sorted_gauss,
        tile_start=tile_start,
        gdata=gdata,
        mean2d=proj.mean2d,
        conic=proj.conic,
        opacity=opacity,
        tw=tw,
        K=cfg.max_per_tile,
    )
    composite = jax.checkpoint(composite)

    out, acc = jax.lax.map(composite, all_tiles)  # (B, TB, C, 256), (B, TB, 256)
    out = out.reshape(pad_tiles, C, TILE, TILE)
    acc = acc.reshape(pad_tiles, TILE, TILE)

    # Assemble tiles (row-major over the tile grid) into the padded image.
    out = out[:num_tiles].reshape(th, tw, C, TILE, TILE)
    out = out.transpose(2, 0, 3, 1, 4).reshape(C, th * TILE, tw * TILE)
    out = out[:, :image_height, :image_width]
    acc = acc[:num_tiles].reshape(th, tw, TILE, TILE)
    acc = acc.transpose(0, 2, 1, 3).reshape(th * TILE, tw * TILE)
    acc = acc[:image_height, :image_width]

    result = {
        "alpha": acc[None],
        "overflow": overflow,
        # K//2 would-drop prediction exists only on the pallas path;
        # -1 disables the trainer's pair-budget de-escalation here
        "overflow_half": jnp.float32(-1.0),
    }
    if with_color:
        rgb = out[:3] + (1.0 - acc)[None] * bg_color[:, None, None]
        result["render"] = rgb
        result["depth"] = out[-1:]
    feats = (out[3:-1] if with_color else out) \
        if extra_channels is not None else None
    if feats is not None:
        result["feats"] = feats
        # channels-last view for consumers that sample pixels (the
        # contrastive trainer): layout-free on this dense path, and
        # whichever key goes unused is dead-code-eliminated under jit
        result["feats_hwc"] = feats.transpose(1, 2, 0)
    return result
