"""Pallas TPU compositing kernels (forward + custom-VJP backward).

TPU-native replacement for the compositing stage of the reference's
CUDA rasterizer (submodules/diff-gaussian-rasterization, contract per
SURVEY.md §2.3a; call site gaussian_renderer/__init__.py:137-155). The
projection stage stays in XLA (ops/projection.py); binning and both
compositing passes live here.

Design — *span-roll window grid* over the sorted pair array:

- Pairs (gaussian, tile) are ordered by ONE unstable u32 sort on the
  composite key `tile << 19 | quantized_depth` (the CUDA rasterizer's
  radix-key trick): grouped by tile, front-to-back within the tile, no
  separate depth presort. 19 depth bits over the frame's depth range
  make order violations vanishingly rare and visually irrelevant. The
  sort payload is the PAIR id, so the backward can invert the
  permutation with one more sort.
- The per-gaussian payload — 8 geometry rows [mean2d(2), conic(3),
  log opacity, ONE, pad] + value rows [rgb, (feat32), depth] — is
  gathered once into pair order and stored TRANSPOSED (f_pad, nk):
  pairs ride the 128-lane axis. That is the ONLY gather in the
  pipeline: windows of 128 pairs are read at their natural unaligned
  offsets by fetching aligned (f_pad, (SUPER+1)*128) superblock spans
  with double-buffered manual DMA (any SUPER consecutive windows fit
  one span) and extracting each window with a dynamic lane rotate
  (positive shifts only — negative dynamic shifts mis-lower in
  Mosaic) plus a static slice. Index maps (window meta, window
  offsets, the pair->slot map) are built with scatter-jump segment
  fills + MXU triangular-matmul cumsums — element gathers and
  searchsorted cost ~12 ms per million on TPU and appear nowhere.
- Grid = one program per 16-tile row segment; each group's output
  block is an IMAGE PATCH (tile_row, y, tile_x, x, c), so assembling
  the image is a free reshape plus one small channel transpose.
- In-kernel math lives in the transposed (PIX=256 sublanes, 128-pair
  lanes) layout: splat power is direct VPU algebra in tile-local
  coordinates (the MXU is row-rate-bound — a (256,8)@(8,128) monomial
  matmul costs the same as K=128, so fewer matmuls win); the
  front-to-back transmittance scan is one (256,128)x(128,128) matmul
  of log(1-alpha) against an upper-triangular ones matrix; per-window
  totals are lane extracts of that scan; channel accumulation folds
  the alpha total in via a constant ONE payload row (c_out =
  [acc, values...]). The composite weight is a single exp of
  (log alpha + exclusive-scan + log T) — no division. Early
  termination is gated per SUPERBLOCK (a vector->scalar readback per
  window costs ~0.15 us of pipeline bubble); the gate also passes
  whenever a window opens a new tile, so skipping is state-safe, and
  the per-pair `live` mask keeps outputs exact regardless.

Backward (custom_vjp): ONE reverse superblocked pass per group — the
CUDA rasterizer's back-to-front strategy, in log space. The forward
stores, per tile, the log-transmittance at its early-termination point
and the stop window (the TPU analogue of CUDA's final_T / n_contrib);
the backward walks each tile's windows LAST-to-first from the stop
point, reconstructing the transmittance carry by subtraction
(log T_start = log T_end - window total — exact in log space, no
divisions that blow up on saturated windows) and accumulating the
suffix R_i = sum_{j>i} q_j w_j as it goes:

    dL/dv_i      = sum_p g(p) w_i(p)
    dL/dalpha_i  = q_i T_i [keep] - R_i / (1 - alpha_i)
    dL/dpower    = dL/dalpha * alpha        (gated by the clamp/cutoffs)

pulled back through the splat quadratic with ONE basis^T @ dpower
matmul (all six monomial-coefficient gradients at once), then chained
to mean2d / conic / log-opacity on (1,128) lane rows. Windows past a
tile's stop point have exactly zero gradient (the forward's hard
T_EPS cutoff) and are skipped wholesale; their slots read as zero from
the pre-zeroed (input_output_aliased) output. Each window's gradient
block DMAs kernel-native to its own aligned window block, and one
HBM-streaming transpose pass (_transpose_slots, MXU identity
contractions — DMA minor dims must be 128-aligned, so the kernel
cannot emit sub-128-lane row-major blocks itself) relayouts them to
(slot_cap, f_out) row-major — no scatter, no read-modify-write; wide
gradients (f_pad > 16) are emitted 128-lane-padded because XLA's row
gather of sub-lane-width rows costs ~4x more than full-lane rows
(tools/probe_unsort.py: 46.9 vs 12.6 ms at f_pad 48, 100k/K6). The
un-sort inverts the pair permutation by carrying the slot map through
one more sort (~2.6 ms; element-gathers would cost ~12 ms/M), then
ROW-gathers per-slot gradient rows pid-major and folds each
gaussian's K pair rows with a minor-axis reduce — the moral
equivalent of the CUDA backward's atomics, with zero atomics and zero
scatters. The screen-space mean gradient required by densification
(reference train.py:366, scene/gaussian_model.py:637-639) flows
through the mean2d rows.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectedGaussians
from .rasterize import TILE, RasterConfig, _tile_grid, _tile_rects
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

PAIR_CHUNK = 128  # window width = lane count
GEOM_COLS = 8  # mean2d(2) + conic(3) + log opacity(1) + one(1) + pad(1)
PIX = TILE * TILE  # 256
DEPTH_BITS = 19  # depth quantization inside the u32 sort key
SUPER = 8  # windows fetched per payload DMA (amortizes issue/wait cost)

LOG_ALPHA_MAX = float(np.log(ALPHA_MAX))
LOG_ALPHA_EPS = float(np.log(ALPHA_EPS))
LOG_T_EPS = float(np.log(T_EPS))
LOG_ZERO = float(np.log(1e-38))  # log-opacity of dead / padding rows


def _cumsum_small(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive int32 cumsum via MXU matmuls (recursive row tiling).

    jnp.cumsum lowers to a latency-bound multi-pass scan (~2.7 ms at
    1M elements measured on v5e); triangular matmuls do the same work
    in a fraction of that. Exact for values whose running totals stay
    below 2^24 (f32 mantissa).
    """
    n = x.shape[0]
    c = 128
    rows = -(-n // c)
    xp = jnp.pad(x.astype(jnp.float32), (0, rows * c - n)).reshape(rows, c)
    iu = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    ju = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    upper = (iu <= ju).astype(jnp.float32)  # x @ upper = row cumsums
    row_cum = jax.lax.dot_general(
        xp, upper, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    row_tot = row_cum[:, -1]  # (rows,)
    if rows > 1024:
        # recurse: exclusive offsets from the inclusive row-total cumsum
        offs = (_cumsum_small(row_tot.astype(jnp.int32))
                .astype(jnp.float32) - row_tot)
    else:
        ir = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
        jr = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
        strict = (ir < jr).astype(jnp.float32)
        offs = jax.lax.dot_general(
            row_tot[None, :], strict, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)[0]
    return (row_cum + offs[:, None]).reshape(-1)[:n].astype(jnp.int32)


def _segment_fill(boundary_pos, values, valid, size):
    """fill[p] = values[t*] where t* is the last valid boundary with
    boundary_pos[t*] <= p (0 before the first valid boundary).

    Built as scatter-ADD of telescoping value jumps at the boundary
    positions followed by one cumsum — duplicate positions telescope
    correctly, and everything is O(T) scatters + one MXU cumsum
    instead of a per-element gather (~12 ms/M on TPU).
    """
    t = boundary_pos.shape[0]
    idx = jnp.arange(t, dtype=jnp.int32)
    last_v = jax.lax.cummax(jnp.where(valid, idx, -1))
    prev_v = jnp.concatenate([jnp.full((1,), -1, jnp.int32), last_v[:-1]])
    prev_val = jnp.where(prev_v >= 0,
                         values[jnp.maximum(prev_v, 0)], 0)
    jumps = jnp.where(valid, values - prev_val, 0)
    pos = jnp.where(valid, boundary_pos, size)
    z = jnp.zeros((size + 1,), jnp.int32).at[pos].add(jumps)
    return _cumsum_small(z[:size])


def group_geometry(tw: int) -> tuple[int, int]:
    """(gx, gxn): tiles per group along x, and groups per tile row.

    Prefer a gx that divides tw EXACTLY so the kernels' patch grid
    reshapes to the image with no width padding — the padded grid's
    [:W] slice materializes a pad + copy pair in both the forward and
    its VJP (~4 ms of pure data movement per train step at 1K,
    trace ops pad.68/copy.85/copy.96). Falls back to the padded
    16-wide grouping when tw has no divisor in [6, 16]."""
    if tw <= 16:
        return tw, 1
    for gx in range(16, 5, -1):
        if tw % gx == 0:
            return gx, tw // gx
    return TILE, -(-tw // TILE)


class WindowLayout(NamedTuple):
    """Static-shape binning metadata shared by the kernels (all int32)."""

    meta_t: jnp.ndarray  # (S_cap,) tile<<9 | first<<8 | valid-lane count
    win_off: jnp.ndarray  # (S_cap,) window start in sorted-pair space
    win_start: jnp.ndarray  # (T+1,) first window of each tile
    group_start: jnp.ndarray  # (ngroups+1,) first window of each group
    total_win: jnp.ndarray  # () number of occupied windows


def build_window_layout(proj: ProjectedGaussians, image_height: int,
                        image_width: int, cfg: RasterConfig):
    """Fixed-K pair expansion + aligned per-tile window layout.

    Each gaussian emits up to K = cfg.pairs_per_gaussian (tile, gauss)
    pairs, row-major over its covered tile rect (CUDA getRect
    semantics); rects larger than K tiles shrink to an aspect-balanced
    sub-rect centered on the projected mean and the dropped pair count
    is reported as `overflow`.

    Ordering comes from ONE unstable u32 sort on the composite key
    `tile << DEPTH_BITS | quantized_depth` — grouped by tile,
    front-to-back within each tile; the sort payload is the PAIR id
    (gaussian = pid // K) so the backward can invert the permutation.
    Windows cover each tile's sorted range at its natural unaligned
    offsets (win_off); `slot_of_sorted` maps each sorted pair to its
    128-aligned gradient slot (window*128 + rank-in-tile) — used only
    by the backward and dead-code-eliminated in inference jits.

    Returns (sorted_pid (nk,), slot_of_sorted (nk,), WindowLayout,
    overflow (2,) = [dropped at K, would-drop at K//2]).
    """
    chunk = PAIR_CHUNK
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    n = proj.mean2d.shape[0]
    K = cfg.pairs_per_gaussian
    nk = n * K

    # The u32 composite key holds tile << depth_bits | depth: shrink the
    # depth quantization when the tile count needs more than the default
    # 32 - DEPTH_BITS = 13 bits (e.g. 1440p/4K frames; the sharded path
    # pads height upward). All shapes are static, so this is trace-time.
    depth_bits = DEPTH_BITS
    while (num_tiles + 1) > (1 << (32 - depth_bits)):
        depth_bits -= 1
    if depth_bits < 10:
        raise ValueError(
            f"{num_tiles} tiles needs more than 22 key bits; composite "
            "u32 sort key cannot represent this image size")

    # _cumsum_small / _segment_fill index maps are exact only while
    # running totals stay below 2^24 (f32 mantissa); the largest total
    # is the slot capacity nk + (num_tiles + 2) * chunk.
    if nk + (num_tiles + 2) * chunk >= 1 << 24:
        raise ValueError(
            f"pair budget n*K={nk} (+ {num_tiles} tiles) exceeds the "
            "2^24 exact-int32-in-f32 limit of the MXU cumsum index "
            "maps; reduce pairs_per_gaussian or shard the gaussians")

    tx0, ty0, rect_w, count = _tile_rects(proj, th, tw)
    # Aspect-balanced truncation of oversized rects (shared with the
    # dense backend): the dropped tiles are the farthest (weakest)
    # ones, bounding the quality cost of the static pair budget.
    from .rasterize import clamp_rect_to_budget

    x0, y0, w2, count2 = clamp_rect_to_budget(
        tx0, ty0, rect_w, count, proj.mean2d, K)
    # overflow[0] = pairs dropped at the configured budget K;
    # overflow[1] = pairs that WOULD drop at K//2 (exact, through the
    # same aspect-balanced clamp) — the trainer's pair-budget
    # de-escalation reads it to shrink K without thrash after
    # densification has shrunk per-gaussian tile coverage.
    k_half = max(K // 2, 1)
    _, _, _, count2h = clamp_rect_to_budget(
        tx0, ty0, rect_w, count, proj.mean2d, k_half)
    overflow = jnp.stack([
        jnp.sum(jnp.maximum(count - count2, 0)).astype(jnp.float32),
        jnp.sum(jnp.maximum(count - count2h, 0)).astype(jnp.float32),
    ])

    ks = jnp.arange(K, dtype=jnp.int32)[None, :]  # (1, K)
    dxk = ks % w2[:, None]
    dyk = ks // w2[:, None]
    tile_x = x0[:, None] + dxk  # (N, K)
    tile_y = y0[:, None] + dyk
    tile = (tile_y * tw + tile_x).astype(jnp.int32)
    pvalid = ks < count2[:, None]

    if cfg.alpha_cull:
        # Exact tile-level alpha culling: a pair whose best-case alpha
        # over the whole tile is below ALPHA_EPS is zeroed by the
        # kernel's cutoff anyway, so dropping it here is semantics-
        # preserving. Bound: alpha <= op * exp(-.5 lam_min(conic) d^2)
        # with d the distance from the projected mean to the tile rect.
        ca, cb, cc = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
        mid = 0.5 * (ca + cc)
        lam_min = mid - jnp.sqrt(jnp.maximum(
            (0.5 * (ca - cc)) ** 2 + cb * cb, 0.0))
        lam_min = jnp.maximum(lam_min, 0.0)[:, None]
        log_opc = jnp.log(jnp.maximum(
            jnp.where(proj.valid, proj.opacity, 0.0), 1e-38))[:, None]
        mx = proj.mean2d[:, 0:1]
        my = proj.mean2d[:, 1:2]
        rx0 = tile_x.astype(jnp.float32) * TILE
        ry0 = tile_y.astype(jnp.float32) * TILE
        ddx = jnp.clip(mx, rx0, rx0 + (TILE - 1)) - mx
        ddy = jnp.clip(my, ry0, ry0 + (TILE - 1)) - my
        max_alpha_log = log_opc - 0.5 * lam_min * (ddx * ddx + ddy * ddy)
        pvalid = pvalid & (max_alpha_log >= LOG_ALPHA_EPS)

    # Composite sort key: tile in the high bits, quantized view depth
    # in the low bits (front-to-back within each tile). Invalid pairs
    # get the num_tiles sentinel and sort to the tail.
    dvalid = count2 > 0
    depth = proj.depth
    dmin = jnp.min(jnp.where(dvalid, depth, jnp.inf))
    dmax = jnp.max(jnp.where(dvalid, depth, -jnp.inf))
    dscale = ((1 << depth_bits) - 1) / jnp.maximum(dmax - dmin, 1e-9)
    dq = jnp.clip((depth - dmin) * dscale, 0.0,
                  float((1 << depth_bits) - 1)).astype(jnp.uint32)
    key = (tile.astype(jnp.uint32) << depth_bits) | dq[:, None]
    key = jnp.where(pvalid, key,
                    jnp.uint32(num_tiles) << depth_bits)
    # carry the PAIR id through the sort (gaussian id = pid // K): the
    # backward inverts the permutation with one more sort and folds
    # per-pair gradients over each gaussian's K slots — no scatter-add
    pid = jnp.arange(nk, dtype=jnp.int32)
    sorted_key, sorted_pid = jax.lax.sort((key.ravel(), pid), num_keys=1)
    sorted_tile = (sorted_key >> depth_bits).astype(jnp.int32)

    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left", method="scan_unrolled").astype(jnp.int32)
    a = tile_start[:-1]  # (T,) first pair of tile
    b = tile_start[1:]  # (T,) one past last pair
    wcount = -(-(b - a) // chunk)  # windows per tile; 0 for empty tiles
    cumw = _cumsum_small(wcount)
    wstart = cumw - wcount
    total_win = cumw[-1]

    s_cap = nk // chunk + num_tiles + 2
    widx = jnp.arange(s_cap, dtype=jnp.int32)
    nonempty = b > a
    # window -> tile via a segment fill over the window axis (element
    # gathers / searchsorted over megarow arrays cost ~12 ms/M on TPU;
    # scatter-jumps + an MXU cumsum cost ~1 ms total)
    tidx = jnp.arange(num_tiles, dtype=jnp.int32)
    wt_c = jnp.minimum(
        _segment_fill(wstart, tidx, nonempty, s_cap), num_tiles - 1)
    in_range = widx < total_win
    first = (widx == wstart[wt_c]) & in_range
    # window start in sorted-pair space + valid-lane count; meta packs
    # tile<<9 | first<<8 | cnt so the kernels read ONE scalar per window
    off = a[wt_c] + (widx - wstart[wt_c]) * chunk  # (s_cap,)
    cnt = jnp.clip(b[wt_c] - off, 0, chunk)
    win_off = jnp.where(in_range, off, 0)
    meta_t = jnp.where(
        in_range,
        (wt_c << 9) | (first.astype(jnp.int32) << 8) | cnt,
        num_tiles << 9)

    # Sorted-pair -> aligned-slot map for the backward's K-fold
    # gradient unsort: pair at sorted position p sits in slot
    # wstart[tile]*chunk + (p - a[tile]) = p + delta[tile] with
    # delta = wstart*chunk - a piecewise-constant over each tile's
    # contiguous range — another segment fill, no megarow gathers.
    # Invalid (sentinel) pairs get the one-past-the-end slot (a zero
    # gradient column). Dead-code-eliminated in forward-only jits.
    pp = jnp.arange(nk, dtype=jnp.int32)
    slot_cap = s_cap * chunk
    delta = wstart * chunk - a
    fill = _segment_fill(a, delta, nonempty, nk)
    slot_of_sorted = jnp.where(pp < tile_start[num_tiles],
                               pp + fill, slot_cap)

    # Groups = gx-tile row segments (group_geometry: gx divides tw
    # when possible): each group's output block is one
    # (16, gx*16, 16, c) IMAGE patch — assembly becomes a free
    # reshape, with no width pad/slice when gx | tw.
    gx, gxn = group_geometry(tw)
    ngroups = th * gxn
    g = jnp.arange(ngroups, dtype=jnp.int32)
    tile_lo = (g // gxn) * tw + (g % gxn) * gx
    wstart_pad = jnp.concatenate(
        [wstart, jnp.full((1,), total_win, jnp.int32)])
    group_start = jnp.concatenate(
        [wstart_pad[tile_lo], total_win[None]])
    layout = WindowLayout(meta_t=meta_t, win_off=win_off,
                          win_start=wstart_pad,
                          group_start=group_start, total_win=total_win)
    return sorted_pid, slot_of_sorted, layout, overflow


def _scan_upper():
    """(chunk, chunk) upper-triangular ones: X @ U = inclusive prefix
    sums of X along its lane axis."""
    chunk = PAIR_CHUNK
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (rows <= cols).astype(jnp.float32)


def _monomial_basis_t():
    """(8, PIX) transpose of _monomial_basis, built without a relayout."""
    pix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    x = (pix % TILE).astype(jnp.float32)
    y = (pix // TILE).astype(jnp.float32)
    one = jnp.ones((1, PIX), jnp.float32)
    zero = jnp.zeros((2, PIX), jnp.float32)
    return jnp.concatenate([one, x, y, x * x, x * y, y * y, zero], axis=0)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


def _vals_ext_rows(block_t, n_val, n_packed, with_color=True):
    """(1 + n_val, chunk) value matrix [ONE, rgb, feats, depth] from a
    payload window, unpacking bf16-paired feature rows when the packed
    layout is active (n_packed > 0).

    Packed window layout: [geom 8, rgb 3, depth 1, packed n_packed]
    where packed row r carries feats[r] in its low 16 bits and
    feats[r + n_packed] in its high 16 bits (a bf16 pattern u16 becomes
    the f32 bit pattern u16 << 16). Unpack is two cheap VPU bit ops per
    packed row; the returned rows are in the UNPACKED payload's value
    order so the backward's gradient rows need no remapping.

    with_color=False (features-only payload, value rows = feats alone):
    the packed layout is just [geom 8, packed n_packed].
    """
    if n_packed == 0:
        return jnp.concatenate(
            [block_t[6:7, :],
             block_t[GEOM_COLS:GEOM_COLS + n_val, :]], axis=0)
    n_plain = 3 if with_color else 0  # rgb rows before the packed rows
    pk = block_t[GEOM_COLS + n_plain + (1 if with_color else 0):
                 GEOM_COLS + n_plain + (1 if with_color else 0)
                 + n_packed, :]
    u = jax.lax.bitcast_convert_type(pk, jnp.uint32)
    lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
    hi = jax.lax.bitcast_convert_type(
        u & jnp.uint32(0xFFFF0000), jnp.float32)
    # no zero-size slices: Mosaic rejects empty vector types that the
    # CPU interpreter tolerates (with_color=False has no rgb rows)
    rows = [block_t[6:7, :]]
    if n_plain:
        rows.append(block_t[GEOM_COLS:GEOM_COLS + n_plain, :])
    rows += [lo, hi]
    if with_color:
        rows.append(block_t[GEOM_COLS + 3:GEOM_COLS + 4, :])  # depth
    return jnp.concatenate(rows, axis=0)


def pack_feature_rows(payload, n_val, n_packed, with_color=True):
    """(N+1, f_pad) payload -> bf16-feature-packed table
    [geom 8, rgb 3, depth 1, packed n_packed, pad] (with_color) or
    [geom 8, packed n_packed, pad] (features-only).

    Halves the HBM traffic of the pair gather and the kernels' span
    DMAs for the 2*n_packed feature rows (the FEATURE phase's 48-row
    payload becomes 32 rows; 24 with with_color=False) at bf16 value
    precision; geometry, rgb and depth stay f32. Uses bitcasts, so it
    is NOT differentiable — it runs only inside pallas_composite's
    custom-vjp forward, and the backward emits gradients in the
    unpacked row layout directly.
    """
    n_feat = 2 * n_packed
    n_plain = 3 if with_color else 0
    geom = payload[:, :GEOM_COLS]
    rgb = payload[:, GEOM_COLS:GEOM_COLS + n_plain]
    feats = payload[:, GEOM_COLS + n_plain:GEOM_COLS + n_plain + n_feat]
    depth = payload[:, GEOM_COLS + n_plain + n_feat:GEOM_COLS + n_val]
    u16 = jax.lax.bitcast_convert_type(
        feats.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed = jax.lax.bitcast_convert_type(
        u16[:, :n_packed] | (u16[:, n_packed:] << 16), jnp.float32)
    f = GEOM_COLS + (4 if with_color else 0) + n_packed
    f_pad = -(-f // 8) * 8
    return jnp.concatenate(
        [geom, rgb, depth, packed,
         jnp.zeros((payload.shape[0], f_pad - f), payload.dtype)],
        axis=1)


def _splat_raw(block_t, t, tw):
    """Direct VPU evaluation of power + log_op in tile-local coords.

    block_t: (f_pad, chunk) payload window. Returns
    (raw (PIX, chunk), mxl, myl, ca, cb, cc) — the per-pair lane rows
    the backward chain reuses. Direct algebra beats an MXU
    monomial-basis matmul here: the MXU is row-rate-bound (a
    (256,8)@(8,128) pass costs the same as K=128), while these ~10 VPU
    ops overlap with the scan/accumulate matmuls — measured ~15%
    faster AND exactly matching the dense path's fp association.
    """
    tx0 = ((t % tw) * TILE).astype(jnp.float32)
    ty0 = ((t // tw) * TILE).astype(jnp.float32)
    mxl = block_t[0:1, :] - tx0  # (1, chunk) tile-local mean
    myl = block_t[1:2, :] - ty0
    ca, cb, cc = block_t[2:3, :], block_t[3:4, :], block_t[4:5, :]
    log_op = block_t[5:6, :]
    pix = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    xl = (pix % TILE).astype(jnp.float32)
    yl = (pix // TILE).astype(jnp.float32)
    dx = mxl - xl  # (PIX, chunk)
    dy = myl - yl
    raw = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy + log_op
    return raw, mxl, myl, ca, cb, cc


SPAN = (SUPER + 1) * PAIR_CHUNK  # superblock fetch width in lanes


def _span_walk(w_lo, w_hi, woff_ref, payload_hbm, pbuf, psem, tbuf,
               tsem, process, sb_gate=None):
    """Walk windows [w_lo, w_hi) of the PAIR-ORDERED payload, calling
    process(get_block, w, guarded) with a lazy (f_pad, 128) window
    extractor.

    Window w covers sorted pairs [win_off[w], +cnt) at an arbitrary
    (unaligned) offset. Any SUPER consecutive windows span at most
    SUPER*128 pairs, so one aligned (f_pad, SPAN) DMA covers a
    superblock (double-buffered, one issue/wait per SUPER windows);
    each window is extracted with a dynamic lane rotate (positive
    shifts only — negative dynamic shifts mis-lower in Mosaic) plus a
    static slice. A per-window tail loop covers the remainder.

    `sb_gate(w0)` (optional) decides once per superblock whether its
    SUPER windows run at all — the caller's early-termination test
    hoisted out of the window loop (a vector->scalar readback per
    window costs ~0.15 us of pipeline bubble). Gated interiors are
    called with guarded=True and skip their own liveness check; a
    skipped superblock must be a no-op for the caller's state, which
    holds when the gate passes whenever any window starts a new tile.
    """
    nsb = (w_hi - w_lo) // SUPER

    def base_of(w):
        return (woff_ref[w] // PAIR_CHUNK) * PAIR_CHUNK

    def sdma(slot, sb):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(base_of(w_lo + sb * SUPER), SPAN)],
            pbuf.at[slot], psem.at[slot])

    def tdma(w):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(base_of(w), 2 * PAIR_CHUNK)],
            tbuf, tsem)

    @pl.when(nsb > 0)
    def _():
        sdma(0, 0).start()

        def body(sb, carry):
            slot = jax.lax.rem(sb, 2)

            @pl.when(sb + 1 < nsb)
            def _():
                sdma(jax.lax.rem(sb + 1, 2), sb + 1).start()

            sdma(slot, sb).wait()
            w0 = w_lo + sb * SUPER
            base = base_of(w0)

            def run_all(guarded):
                for j in range(SUPER):
                    w = w0 + j

                    def get_block(w=w, slot=slot, base=base):
                        shift = jax.lax.rem(
                            SPAN - (woff_ref[w] - base), SPAN)
                        return pltpu.roll(pbuf[slot], shift,
                                          axis=1)[:, :PAIR_CHUNK]

                    process(get_block, w, guarded)

            if sb_gate is None:
                run_all(False)
            else:
                @pl.when(sb_gate(w0))
                def _():
                    run_all(True)
            return carry

        jax.lax.fori_loop(0, nsb, body, 0)

    def tail_body(w, carry):
        tdma(w).start()
        tdma(w).wait()

        def get_block(w=w):
            # roll the 2-block tail buffer, take the leading window
            off_l = woff_ref[w] - base_of(w)
            shift = jax.lax.rem(2 * PAIR_CHUNK - off_l, 2 * PAIR_CHUNK)
            return pltpu.roll(tbuf[...], shift, axis=1)[:, :PAIR_CHUNK]

        process(get_block, w, False)
        return carry

    jax.lax.fori_loop(w_lo + nsb * SUPER, w_hi, tail_body, 0)


def _fwd_group_kernel(goff_ref, gstart_ref, metat_ref, woff_ref,
                      payload_hbm, *rest, n_val: int, tw: int,
                      gxn: int, gx: int, num_tiles: int,
                      with_residuals: bool,
                      n_packed: int = 0, with_color: bool = True):
    """One grid step = one group (a gx-tile row segment).

    Reads the pair-ordered payload through the span walker — no
    aligned-slot relayout exists anywhere in the forward path. The
    group's output block is an image patch (16y, 16tiles, 16x, c)
    accumulated in VMEM; the per-tile log-transmittance carry lives in
    a (PIX, 1) scratch. Two small side outputs feed the backward (the
    CUDA final_T / n_contrib analogues): logt_out = each tile's
    per-pixel log-transmittance after its LAST processed window, and
    stop_out = that window's global index + 1 (as f32; windows >= stop
    were early-terminated and have exactly zero weight under the hard
    T_EPS cutoff). Last-write-wins per tile — skipped windows don't
    write.
    """
    if with_residuals:
        (out_ref, logt_out, stop_out, pbuf, psem, tbuf, tsem,
         logt) = rest
    else:
        out_ref, pbuf, psem, tbuf, tsem, logt = rest
        logt_out = stop_out = None
    gi = pl.program_id(0)
    g_abs = goff_ref[0] + gi  # global group id (sharded slabs offset)
    w_lo = gstart_ref[gi]
    w_hi = gstart_ref[gi + 1]
    tile_lo = (g_abs // gxn) * tw + (g_abs % gxn) * gx
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    if with_residuals:
        logt_out[...] = jnp.zeros(logt_out.shape, logt_out.dtype)
        stop_out[...] = jnp.zeros(stop_out.shape, stop_out.dtype)
    scan_upper = _scan_upper()

    def process(get_block, w, guarded):
        mt = metat_ref[w]
        t = mt >> 9
        first = (mt >> 8) & 1
        cnt = mt & 255

        @pl.when(first == 1)
        def _():
            logt[...] = jnp.zeros(logt.shape, logt.dtype)

        def math():
            block_t = get_block()
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_CHUNK), 1)
            okl = lane < cnt
            raw, *_ = _splat_raw(block_t, t, tw)
            alpha_log = jnp.minimum(raw, LOG_ALPHA_MAX)  # (PIX, chunk)
            ok = (alpha_log >= LOG_ALPHA_EPS) & okl
            alpha = jnp.where(ok, jnp.exp(alpha_log), 0.0)
            lg = jnp.log1p(-alpha)
            cum_incl = _dot(lg, scan_upper)
            cum_excl = cum_incl - lg
            live = ok & (cum_incl + logt[...] >= LOG_T_EPS)
            wgt = jnp.where(
                live, jnp.exp(alpha_log + cum_excl + logt[...]), 0.0)
            # value rows prefixed by the constant ONE row: one
            # matmul yields [alpha-total, channels...] per pixel.
            vals_ext = _vals_ext_rows(block_t, n_val, n_packed,
                                       with_color)
            contrib = jax.lax.dot_general(
                wgt, vals_ext, (((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (PIX, 1 + n_val)
            # full-window log(1-alpha) total = last lane of the
            # inclusive scan (masked lanes contribute lg == 0) —
            # a lane extract, not another row-rate-bound matmul.
            tot = cum_incl[:, PAIR_CHUNK - 1:PAIR_CHUNK]  # (PIX, 1)
            tx = t - tile_lo
            # out block is an image patch (16y, 16tiles, 16x, c):
            # pix = y*16 + x splits for free on the sublane side
            upd = contrib.reshape(TILE, TILE, 1 + n_val)
            out_ref[0, :, tx, :, :] = out_ref[0, :, tx, :, :] + upd
            logt[...] = logt[...] + tot
            if with_residuals:
                logt_out[0, tx] = logt[...]
                stop_out[0, tx] = (jnp.ones((8, 1), jnp.float32)
                                   * (w + 1))

        # Per-window liveness gate, applied EVEN inside a gated-in
        # superblock (`guarded` only means the superblock gate passed —
        # e.g. because a later window in it opens a new tile). Running a
        # dead window's math would contribute exactly nothing (all its
        # weights are zeroed by the hard T_EPS cutoff) but would advance
        # stop_out/logt_out past windows whose totals were never added
        # to logt (their whole superblock was skipped) — the backward's
        # log-space transmittance reconstruction then over-subtracts
        # those totals, exp()s a large POSITIVE log, and emits
        # finite-but-astronomical (~e^40) gradients. Gating here keeps
        # the live window set a contiguous prefix [first, stop), which
        # is exactly what the backward assumes.
        del guarded
        @pl.when(jnp.max(logt[...]) >= LOG_T_EPS)
        def _():
            math()

    def sb_gate(w0):
        # run the superblock if any window opens a new tile or the
        # current tile is still transmitting; a skipped superblock
        # therefore never misses a logt reset
        any_first = (metat_ref[w0] >> 8) & 1
        for j in range(1, SUPER):
            any_first = any_first | ((metat_ref[w0 + j] >> 8) & 1)
        return jnp.logical_or(any_first == 1,
                              jnp.max(logt[...]) >= LOG_T_EPS)

    _span_walk(w_lo, w_hi, woff_ref, payload_hbm, pbuf, psem, tbuf,
               tsem, process, sb_gate)


def _span_walk_rev(w_lo, w_hi, woff_ref, payload_hbm, pbuf, psem, tbuf,
                   tsem, process, sb_gate=None, sb_open=None,
                   sb_close=None, sb_empty=None):
    """Reverse-order twin of _span_walk: visits windows [w_lo, w_hi)
    in strictly DECREASING order (tail remainder first, then
    superblocks back-to-front, windows within each superblock
    reversed), with the same aligned-span double-buffered DMA scheme.
    `sb_gate(w0)` (optional) decides once per superblock whether its
    windows run at all — callers gate on the per-tile stop map, so a
    skipped superblock touches no state.

    `sb_open(w0)` / `sb_close(w0)` (optional) bracket each PROCESSED
    batch — the tail (as one batch based at the tail start) and each
    gated-in superblock — so the caller can stage per-batch output.
    `sb_empty(w0)` (optional) runs instead for a gated-OUT superblock
    — callers that stage output use it to emit an explicit zero batch
    so every window in [w_lo, w_hi) gets written without a pre-zeroed
    output buffer. `process(get_block, w, guarded, j)` receives the
    window's section index j within its batch (a python int for
    superblock windows, a traced value for tail windows; both valid
    in pl.ds offsets)."""
    nsb = (w_hi - w_lo) // SUPER

    def base_of(w):
        return (woff_ref[w] // PAIR_CHUNK) * PAIR_CHUNK

    def sdma(slot, sb):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(base_of(w_lo + sb * SUPER), SPAN)],
            pbuf.at[slot], psem.at[slot])

    def tdma(w):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(base_of(w), 2 * PAIR_CHUNK)],
            tbuf, tsem)

    n_tail = w_hi - (w_lo + nsb * SUPER)
    tail_start = w_lo + nsb * SUPER

    @pl.when(n_tail > 0)
    def _():
        if sb_open is not None:
            sb_open(tail_start)

        def tail_body(i, carry):
            w = w_hi - 1 - i
            tdma(w).start()
            tdma(w).wait()

            def get_block(w=w):
                off_l = woff_ref[w] - base_of(w)
                shift = jax.lax.rem(2 * PAIR_CHUNK - off_l,
                                    2 * PAIR_CHUNK)
                return pltpu.roll(tbuf[...], shift,
                                  axis=1)[:, :PAIR_CHUNK]

            process(get_block, w, False, w - tail_start)
            return carry

        jax.lax.fori_loop(0, n_tail, tail_body, 0)
        if sb_close is not None:
            sb_close(tail_start)

    @pl.when(nsb > 0)
    def _():
        sdma(0, nsb - 1).start()

        def body(i, carry):
            sb = nsb - 1 - i
            slot = jax.lax.rem(i, 2)

            @pl.when(sb > 0)
            def _():
                sdma(jax.lax.rem(i + 1, 2), sb - 1).start()

            sdma(slot, sb).wait()
            w0 = w_lo + sb * SUPER
            base = base_of(w0)

            def run_all(guarded):
                if sb_open is not None:
                    sb_open(w0)
                for j in range(SUPER - 1, -1, -1):
                    w = w0 + j

                    def get_block(w=w, slot=slot, base=base):
                        shift = jax.lax.rem(
                            SPAN - (woff_ref[w] - base), SPAN)
                        return pltpu.roll(pbuf[slot], shift,
                                          axis=1)[:, :PAIR_CHUNK]

                    process(get_block, w, guarded, j)
                if sb_close is not None:
                    sb_close(w0)

            if sb_gate is None:
                run_all(False)
            else:
                gate = sb_gate(w0)

                @pl.when(gate)
                def _():
                    run_all(True)

                if sb_empty is not None:
                    @pl.when(jnp.logical_not(gate))
                    def _():
                        sb_empty(w0)
            return carry

        jax.lax.fori_loop(0, nsb, body, 0)


def _bwd_group_kernel(goff_ref, gstart_ref, metat_ref, woff_ref,
                      stop_ref, payload_hbm, g_ref, logt_ref,
                      dpay_hbm, pbuf, psem, obuf, osem, tbuf, tsem,
                      logtc, rcarry, state, *, n_val: int, tw: int,
                      gxn: int, gx: int, num_tiles: int, f_pad: int,
                      n_packed: int = 0, with_color: bool = True,
                      emit_grads: bool = True,
                      values_only: bool = False):
    """Backward over one tile group: ONE reverse superblocked pass.

    Walks the group's windows last-to-first. On first (reverse) visit
    of a tile, loads the forward-stored per-pixel log-transmittance at
    the tile's stop point (logt_ref) and zeroes the suffix accumulator
    R; per window, reconstructs the window-start transmittance by
    log-space subtraction (log T_start = log T_end - window lg total)
    and emits exact gradients with R_i = R_carry + (S_win - prefix_i).
    Windows at/after the tile's stop (stop_ref, forward early-
    termination point) have exactly zero gradient under the hard T_EPS
    cutoff and are computation-skipped wholesale — their batch emits
    an explicit ZERO block (sb_empty), so the output needs no
    pre-zeroed aliased buffer (the zeros fill + alias clone measured
    ~2.3 ms/step at bench shape).

    Output staging is BATCHED per walker superblock: each batch
    accumulates its SUPER windows' kernel-native (f_pad, 128) blocks
    in a zeroed (SUPER * f_pad, 128) buffer and emits ONE DMA (a
    ~13k-window frame used to issue ~13k 8 KB DMAs — pure issue /
    wait overhead). The tail batch always writes full SUPER-window
    spans: the overrun rows beyond the group's last window carry
    zeros, land in the NEXT group's territory (or the staging pad of
    the final group), and are correct either way — grid steps run in
    ascending group order, so a later group's own batches (every
    batch now writes) overwrite them. Together the batches cover
    exactly this group's [w_lo, w_hi); windows outside every group's
    range ([win_hi, s_pad) and, in slab mode, other slabs' windows)
    are zeroed by _transpose_slots' win_range mask instead.
    _transpose_slots relayouts the staging array row-major afterwards
    so the un-sort is a row gather.

    state (SMEM): [0] = next obuf slot, [1]/[2] = in-flight batch base
    window of slot 0/1 (-1 none), [3] = tile currently walked (-1).
    """
    gi = pl.program_id(0)
    g_abs = goff_ref[0] + gi
    w_lo = gstart_ref[gi]
    w_hi = gstart_ref[gi + 1]
    tile_lo = (g_abs // gxn) * tw + (g_abs % gxn) * gx
    state[0] = 0
    state[1] = -1
    state[2] = -1
    state[3] = -1
    scan_upper = _scan_upper()
    basis_t = _monomial_basis_t()
    last = PAIR_CHUNK - 1

    def odma(slot, w0):
        return pltpu.make_async_copy(
            obuf.at[slot],
            dpay_hbm.at[pl.ds(w0 * f_pad, SUPER * f_pad), :],
            osem.at[slot])

    def sb_open(w0):
        del w0
        os = state[0]
        if emit_grads:
            @pl.when(state[1 + os] >= 0)
            def _():
                odma(os, state[1 + os]).wait()
        obuf[os] = jnp.zeros(obuf.shape[1:], obuf.dtype)

    def sb_close(w0):
        if emit_grads:  # False = DMA-cost ablation (tools/probe_bwd_kernel)
            os = state[0]
            odma(os, w0).start()
            state[1 + os] = w0
            state[0] = 1 - os

    def stop_of(w):
        mt = metat_ref[w]
        return stop_ref[gi * gx + ((mt >> 9) - tile_lo)]

    def process(get_block, w, guarded, j):
        mt = metat_ref[w]
        t = mt >> 9
        cnt = mt & 255
        tx = t - tile_lo

        @pl.when(w < stop_ref[gi * gx + tx])
        def _():
            @pl.when(t != state[3])
            def _():
                logtc[...] = logt_ref[0, tx]
                rcarry[...] = jnp.zeros(rcarry.shape, rcarry.dtype)

            state[3] = t
            block_t = get_block()
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, PAIR_CHUNK), 1)
            okl = lane < cnt
            raw, mxl, myl, ca, cb, cc = _splat_raw(block_t, t, tw)
            alpha_log = jnp.minimum(raw, LOG_ALPHA_MAX)
            ok = (raw >= LOG_ALPHA_EPS) & okl
            alpha = jnp.where(ok, jnp.exp(alpha_log), 0.0)
            lg = jnp.log1p(-alpha)
            cum = _dot(lg, scan_upper)  # (PIX, chunk) inclusive
            tot = cum[:, last:last + 1]
            t_start_log = logtc[...] - tot  # (PIX, 1) log T at win start
            excl_lin = jnp.exp(t_start_log + (cum - lg))  # T before i
            # keep-test in LOG space with the forward's exact window-
            # local expression (fwd: cum_incl + logt >= LOG_T_EPS), so
            # fwd/bwd can only disagree through the t_start_log
            # reconstruction itself, never through a second linear-
            # domain rounding of the same quantity (ADVICE r4)
            keep = (t_start_log + cum >= LOG_T_EPS).astype(jnp.float32)
            wgt = jnp.where(ok, alpha * excl_lin, 0.0) * keep
            vals_ext = _vals_ext_rows(block_t, n_val, n_packed,
                                       with_color)
            g_ext = g_ref[0, :, tx, :, :].reshape(PIX, 1 + n_val)
            dvals_ext = jax.lax.dot_general(
                g_ext, wgt, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )  # (1 + n_val, chunk): row 0 = d(ONE row), rest values
            if values_only:
                # dL/dv only (the FEATURE-phase post-densify contract:
                # geometry/opacity carry no consumed gradient) — skips
                # both 256-row matmuls of the alpha chain (q, the
                # suffix scan) and the whole quadratic pullback.
                del vals_ext
                parts = [jnp.zeros((GEOM_COLS - 2, PAIR_CHUNK),
                                   jnp.float32),
                         dvals_ext[0:1, :],
                         jnp.zeros((1, PAIR_CHUNK), jnp.float32),
                         dvals_ext[1:, :]]
            else:
                q = _dot(g_ext, vals_ext)  # (PIX, chunk)
                qw = q * wgt
                s_incl = _dot(qw, scan_upper)
                s_tot = s_incl[:, last:last + 1]  # lane extract
                suffix = (rcarry[...] + s_tot) - s_incl
                dalpha = q * excl_lin * keep - suffix / (1.0 - alpha)
                gate = (ok & (raw < LOG_ALPHA_MAX)).astype(jnp.float32)
                dpow = dalpha * gate * alpha
                dcoeff = _dot(basis_t, dpow)  # (8, chunk)
                g1 = dcoeff[0:1, :]
                gx = dcoeff[1:2, :]
                gy = dcoeff[2:3, :]
                gx2 = dcoeff[3:4, :]
                gxy = dcoeff[4:5, :]
                gy2 = dcoeff[5:6, :]
                c_x = ca * mxl + cb * myl
                c_y = cc * myl + cb * mxl
                dmx = -g1 * c_x + gx * ca + gy * cb
                dmy = -g1 * c_y + gx * cb + gy * cc
                d_ca = -0.5 * g1 * mxl * mxl + gx * mxl - 0.5 * gx2
                d_cb = -g1 * mxl * myl + gx * myl + gy * mxl - gxy
                d_cc = -0.5 * g1 * myl * myl + gy * myl - 0.5 * gy2
                parts = [dmx, dmy, d_ca, d_cb, d_cc, g1,
                         dvals_ext[0:1, :],
                         jnp.zeros((1, PAIR_CHUNK), jnp.float32),
                         dvals_ext[1:, :]]
            pad_rows = f_pad - GEOM_COLS - n_val
            if pad_rows:
                parts.append(jnp.zeros((pad_rows, PAIR_CHUNK),
                                       jnp.float32))
            # kernel-native (f_pad, chunk) block staged at batch
            # section j; the whole batch DMAs as SUPER * f_pad rows of
            # the staging array at sb_close (sub-128-lane VMEM can
            # never be a DMA party, so the row-major relayout happens
            # in _transpose_slots, a separate Pallas pass)
            obuf[state[0], pl.ds(j * f_pad, f_pad), :] = (
                jnp.concatenate(parts, axis=0))
            if not values_only:  # suffix carry feeds dalpha only
                rcarry[...] = rcarry[...] + s_tot
            logtc[...] = t_start_log

    def sb_gate(w0):
        any_run = w0 < stop_of(w0)
        for j in range(1, SUPER):
            any_run = jnp.logical_or(any_run, (w0 + j) < stop_of(w0 + j))
        return any_run

    def sb_empty(w0):
        # gated-out superblock: every window past its tile's stop has
        # exactly zero gradient — emit the zeroed batch so the output
        # needs no pre-zeroed aliased buffer
        sb_open(w0)
        sb_close(w0)

    _span_walk_rev(w_lo, w_hi, woff_ref, payload_hbm, pbuf, psem, tbuf,
                   tsem, process, sb_gate, sb_open=sb_open,
                   sb_close=sb_close, sb_empty=sb_empty)

    for s in range(2):
        @pl.when(state[1 + s] >= 0)
        def _(s=s):
            odma(s, state[1 + s]).wait()


def _forward_impl(sorted_payload, layout, *, num_tiles, tw, n_val,
                  interpret, g_lo=None, rows_local=None,
                  with_residuals=True, n_packed=0, with_color=True):
    """Composite forward. With g_lo/rows_local set, renders only the
    tile-row slab whose groups are [g_lo, g_lo + rows_local*gxn) — the
    per-device slice of the sharded renderer (g_lo may be traced).

    Returns (patches, logt_stop, stop_f): the image-patch
    accumulations plus the per-tile backward residuals
    (logt_stop (ngroups, gx, PIX, 1) f32, stop_f (ngroups, gx,
    8, 1) f32 window indices — see _fwd_group_kernel). With
    with_residuals=False (inference/fwd-only paths) the side outputs
    are not computed and return as None."""
    f_pad, p_cols = sorted_payload.shape
    th = num_tiles // tw
    gx, gxn = group_geometry(tw)
    if rows_local is None:
        rows_local = th
    ngroups = rows_local * gxn
    if g_lo is None:
        goff = jnp.zeros((1,), jnp.int32)
        gs = layout.group_start
    else:
        goff = jnp.asarray(g_lo, jnp.int32).reshape(1)
        gs = jax.lax.dynamic_slice(layout.group_start,
                                   (goff[0],), (ngroups + 1,))
    c_out = n_val + 1
    img_spec = pl.BlockSpec(
        (1, TILE, gx, TILE, c_out),
        lambda g, *_: (g // gxn, 0, g % gxn, 0, 0),
        memory_space=pltpu.VMEM)
    img_shape = jax.ShapeDtypeStruct(
        (rows_local, TILE, gxn * gx, TILE, c_out), jnp.float32)
    if with_residuals:
        out_specs = (
            img_spec,
            pl.BlockSpec((1, gx, PIX, 1),
                         lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, gx, 8, 1),
                         lambda g, *_: (g, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        )
        out_shape = (
            img_shape,
            jax.ShapeDtypeStruct((ngroups, gx, PIX, 1), jnp.float32),
            jax.ShapeDtypeStruct((ngroups, gx, 8, 1), jnp.float32),
        )
    else:
        out_specs = img_spec
        out_shape = img_shape
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ngroups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=out_specs,
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, SPAN), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((f_pad, 2 * PAIR_CHUNK), jnp.float32),  # tail
            pltpu.SemaphoreType.DMA(()),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_fwd_group_kernel, n_val=n_val, tw=tw,
                               gxn=gxn, gx=gx, num_tiles=num_tiles,
                               with_residuals=with_residuals,
                               n_packed=n_packed, with_color=with_color)
    out = pl.pallas_call(
        kernel,
        out_shape=out_shape,
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(goff, gs, layout.meta_t, layout.win_off, sorted_payload)
    if with_residuals:
        return out
    return out, None, None


def _backward_impl(ps_t, layout, g, logt_stop, stop, *, num_tiles, tw,
                   n_val, interpret, g_lo=None, rows_local=None,
                   n_packed=0, with_color=True, emit_grads=True,
                   values_only=False):
    """Gradient kernel: (slot_cap, f_pad) ROW-MAJOR per-slot gradients.

    logt_stop / stop are the forward's per-tile residuals (local to
    this call's group range). With g_lo/rows_local set, runs only the
    slab's groups — slots outside the slab's window range are zeroed
    by the transpose pass's win_range mask, so slab partials sum
    across devices."""
    f_in = ps_t.shape[0]  # payload rows (packed when n_packed > 0)
    # gradient rows are always the UNPACKED value layout — bf16 value
    # packing affects only the payload stream, never the cotangent
    f_pad = -(-(GEOM_COLS + n_val) // 8) * 8
    th = num_tiles // tw
    gx, gxn = group_geometry(tw)
    if rows_local is None:
        rows_local = th
    ngroups = rows_local * gxn
    if g_lo is None:
        goff = jnp.zeros((1,), jnp.int32)
        gs = layout.group_start
    else:
        goff = jnp.asarray(g_lo, jnp.int32).reshape(1)
        gs = jax.lax.dynamic_slice(layout.group_start,
                                   (goff[0],), (ngroups + 1,))
    c_out = n_val + 1
    s_cap = layout.meta_t.shape[0]
    slot_cap = s_cap * PAIR_CHUNK
    stop_flat = stop[:, :, 0, 0].astype(jnp.int32).reshape(-1)
    # row-major (slot_cap, f_pad) gradients, stored 128-lane-aligned as
    # (s_cap * f_pad, 128) — the kernel writes SUPER-window batch
    # blocks whose flat bytes are each window's (128 slots, f_pad)
    # block. SUPER extra window rows of staging pad absorb the last
    # group's full-span tail batch overrun. Every batch in the group
    # range writes (gated-out superblocks emit zero batches), so no
    # pre-zeroed aliased output is needed; windows outside the range
    # are zeroed by the transpose pass below.
    s_pad = s_cap + SUPER
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),  # payload
            pl.BlockSpec((1, TILE, gx, TILE, c_out),
                         lambda gi, *_: (gi // gxn, 0, gi % gxn, 0, 0),
                         memory_space=pltpu.VMEM),  # cotangent patches
            pl.BlockSpec((1, gx, PIX, 1),
                         lambda gi, *_: (gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),  # logt_stop
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f_in, SPAN), jnp.float32),  # pbuf
            pltpu.SemaphoreType.DMA((2,)),  # psem
            pltpu.VMEM((2, SUPER * f_pad, PAIR_CHUNK),
                       jnp.float32),  # obuf (one batch per slot)
            pltpu.SemaphoreType.DMA((2,)),  # osem
            pltpu.VMEM((f_in, 2 * PAIR_CHUNK), jnp.float32),  # tail
            pltpu.SemaphoreType.DMA(()),  # tail sem
            pltpu.VMEM((PIX, 1), jnp.float32),  # logtc
            pltpu.VMEM((PIX, 1), jnp.float32),  # rcarry
            pltpu.SMEM((4,), jnp.int32),  # state
        ],
    )
    kernel = functools.partial(_bwd_group_kernel, n_val=n_val, tw=tw,
                               gxn=gxn, gx=gx, num_tiles=num_tiles,
                               f_pad=f_pad, n_packed=n_packed,
                               with_color=with_color,
                               emit_grads=emit_grads,
                               values_only=values_only)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((s_pad * f_pad, PAIR_CHUNK),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
    )(goff, gs, layout.meta_t, layout.win_off, stop_flat, ps_t, g,
      logt_stop)
    # Lane-aligned (128-wide) per-slot rows for WIDE gradients: the
    # un-sort's row gather of 48-col rows costs ~4x more than full-
    # lane rows (probe_unsort @100k/K6: 46.9 -> 12.6 ms), worth the
    # extra streamed zero-column writes. At f_pad 16 (GAUSSIAN phase)
    # the narrow gather is already the faster one (10.9 vs 12.7 ms),
    # so the layout stays narrow there. win_range zeroes every window
    # outside this call's group coverage (unoccupied capacity, staging
    # pad, other slabs in sharded mode).
    f_out = PAIR_CHUNK if f_pad > 16 else f_pad
    win_range = jnp.stack([gs[0], gs[ngroups]]).astype(jnp.int32)
    return _transpose_slots(out, s_pad, f_pad, interpret=interpret,
                            f_out=f_out, win_range=win_range)


_TRANS_B = 8  # windows per transpose grid step


def _transpose_kernel(range_ref, x_ref, o_ref, *, f_pad: int,
                      f_out: int):
    eye = jnp.eye(PAIR_CHUNK, dtype=jnp.float32)
    i = pl.program_id(0)
    for j in range(_TRANS_B):
        g = x_ref[pl.ds(j * f_pad, f_pad), :]  # (f_pad, 128)
        if f_out > f_pad:
            # zero-pad the gradient rows so the transposed block is a
            # full 128-lane row per slot: XLA's row gather of sub-128-
            # lane rows runs ~4x slower than lane-aligned rows
            # (tools/probe_unsort.py: 46.9 -> 12.6 ms at f_pad 48),
            # so the un-sort gathers from this padded layout
            g = jnp.concatenate(
                [g, jnp.zeros((f_out - f_pad, PAIR_CHUNK), jnp.float32)],
                axis=0)
        gt = jax.lax.dot_general(
            eye, g, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)  # (128, f_out)
        # windows outside [win_lo, win_hi) were never written by the
        # backward kernel's batches (unoccupied capacity, staging pad,
        # other slabs in sharded mode): their slots must read zero
        wid = i * _TRANS_B + j
        in_r = jnp.logical_and(wid >= range_ref[0], wid < range_ref[1])
        gt = jnp.where(in_r, gt, 0.0)
        o_ref[pl.ds(j * PAIR_CHUNK, PAIR_CHUNK), :] = gt


def _transpose_slots(dpay_kmaj, s_cap, f_pad, *, interpret,
                     f_out=None, win_range=None):
    """(s_cap * f_pad, 128) window-blocked k-major gradients ->
    (s_cap * 128, f_out) row-major per-slot gradients (f_out defaults
    to f_pad; pass f_out=128 for the lane-aligned layout the un-sort's
    row gather wants — cols >= f_pad are zero). win_range (2,) int32
    [win_lo, win_hi): windows outside it emit zero blocks — the
    backward kernel only writes windows its groups cover, so this
    replaces a pre-zeroed aliased output (which cost a ~2.3 ms/step
    zeros fill + clone at bench shape).

    One MXU identity contraction per window block. A dedicated pass
    because DMA minor dims must be 128-aligned (so the backward kernel
    cannot emit sub-128-lane row-major blocks itself) and because
    XLA's own (f_pad, slots) -> (slots, f_pad) relayout measured
    ~52 ms at 48 rows — this kernel is HBM-streaming instead.
    """
    if f_out is None:
        f_out = f_pad
    if win_range is None:  # no masking: every window passes
        win_range = jnp.array([0, 1 << 30], jnp.int32)
    nblk = -(-s_cap // _TRANS_B)
    return pl.pallas_call(
        functools.partial(_transpose_kernel, f_pad=f_pad, f_out=f_out),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblk,),
            in_specs=[pl.BlockSpec((_TRANS_B * f_pad, PAIR_CHUNK),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((_TRANS_B * PAIR_CHUNK, f_out),
                                   lambda i, *_: (i, 0),
                                   memory_space=pltpu.VMEM),
        ),
        out_shape=jax.ShapeDtypeStruct((s_cap * PAIR_CHUNK, f_out),
                                       jnp.float32),
        interpret=interpret,
    )(win_range, dpay_kmaj)


def _gather_pairs(payload, sorted_pid):
    """(N+1, f_pad) table -> transposed pair-ordered payload.

    ONE row gather into sorted-pair order plus a SPAN-wide zero tail
    (superblock fetches may run past the last pair). Both kernels
    read windows at unaligned offsets directly from this via dynamic
    lane rotates — no aligned-slot relayout exists anywhere.
    """
    n = payload.shape[0] - 1
    k = sorted_pid.shape[0] // n
    ps = payload[sorted_pid // k]  # (nk, f_pad) — pair order
    f_pad = payload.shape[1]
    return jnp.concatenate(
        [ps.T, jnp.zeros((f_pad, SPAN), payload.dtype)], axis=1)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_composite(static_cfg, payload, sorted_pid, slot_of_sorted,
                     layout, g_lo=None):
    """Gather + composite -> image-patch accumulations
    (rows, 16, gxn*16, 16, 1 + n_val): axes (tile_row, y, tile_x, x,
    c), so `reshape(H_pad, W_pad, c)` IS the image — no transposes.

    static_cfg = (num_tiles, tw, n_val, interpret[, rows_local]).
    payload is the (N + 1, f_pad) per-gaussian table (dead row last);
    sorted_pid / slot_of_sorted the layout's index maps
    (slot_of_sorted is used only by the backward — dead code in
    inference jits). Output channel 0 is the alpha total, channels 1..
    the composited values. Differentiable in payload — the backward
    materializes the aligned-padded slot payload, runs the Pallas
    gradient kernel, then reduces the per-slot gradients over each
    gaussian's slots.

    Slab mode (the sharded path): pass rows_local in static_cfg and a
    traced g_lo (first group index); forward renders only that tile-row
    slab and the backward emits gradients only for the slab's windows —
    partial per-gaussian gradients that sum exactly across devices
    (the transpose of the projection all-gather does the psum).
    """
    (num_tiles, tw, n_val, interpret, rows_local, n_packed,
     with_color, _) = _pc_cfg(static_cfg)
    if n_packed:
        payload = pack_feature_rows(payload, n_val, n_packed, with_color)
    ps_t = _gather_pairs(payload, sorted_pid)
    out, _, _ = _forward_impl(ps_t, layout, num_tiles=num_tiles, tw=tw,
                              n_val=n_val, interpret=interpret,
                              g_lo=g_lo, rows_local=rows_local,
                              with_residuals=False, n_packed=n_packed,
                              with_color=with_color)
    return out


def _pc_cfg(static_cfg):
    # (num_tiles, tw, n_val, interpret[, rows_local[, n_packed
    #  [, with_color[, grad_values_only]]]])
    pad = (None, 0, True, False)
    n_opt = len(static_cfg) - 4
    return (*static_cfg, *pad[n_opt:])


def _pc_fwd(static_cfg, payload, sorted_pid, slot_of_sorted, layout,
            g_lo=None):
    (num_tiles, tw, n_val, interpret, rows_local, n_packed,
     with_color, _) = _pc_cfg(static_cfg)
    n_rows = payload.shape[0]
    if n_packed:
        payload = pack_feature_rows(payload, n_val, n_packed, with_color)
    ps_t = _gather_pairs(payload, sorted_pid)
    out, logt_stop, stop = _forward_impl(
        ps_t, layout, num_tiles=num_tiles, tw=tw, n_val=n_val,
        interpret=interpret, g_lo=g_lo, rows_local=rows_local,
        n_packed=n_packed, with_color=with_color)
    return out, (ps_t, sorted_pid, slot_of_sorted, layout,
                 n_rows, logt_stop, stop, g_lo)


def _pc_bwd(static_cfg, res, g):
    (num_tiles, tw, n_val, interpret, rows_local, n_packed,
     with_color, values_only) = _pc_cfg(static_cfg)
    (ps_t, sorted_pid, slot_of_sorted, layout, n_rows, logt_stop, stop,
     g_lo) = res
    dpay = _backward_impl(ps_t, layout, g, logt_stop, stop,
                          num_tiles=num_tiles, tw=tw, n_val=n_val,
                          interpret=interpret, g_lo=g_lo,
                          rows_local=rows_local, n_packed=n_packed,
                          with_color=with_color,
                          values_only=values_only)
    f_pad = -(-(GEOM_COLS + n_val) // 8) * 8
    dpayload = unsort_slot_gradients(dpay, sorted_pid, slot_of_sorted,
                                     n_rows, f_pad=f_pad)
    return dpayload, None, None, None, None


def unsort_slot_gradients(dpay, sorted_pid, slot_of_sorted, n_rows,
                          f_pad=None):
    """(slot_rows, f_lane) per-slot gradients -> (n_rows, f_pad)
    per-gaussian payload gradients (f_pad defaults to dpay's width;
    when dpay is the lane-aligned 128-wide layout the extra columns
    are zero and are sliced off after the K-fold).

    Un-sort without a scatter: ONE more sort inverts the pair
    permutation AND carries the slot map along as a payload
    (element-gathers are ~12 ms/M on TPU; a sort payload column is
    ~0.4 ms), then a ROW gather pulls per-slot gradient rows pid-major
    and a minor-axis reduce folds each gaussian's K pair rows. The
    gather reads the 128-lane-aligned layout: XLA's row gather of
    sub-128-lane rows costs ~4x more (probe_unsort: 46.9 vs 12.6 ms at
    f_pad 48). The invalid-pair sentinel (slot_cap, one past the last
    real slot) indexes the staging pad, which is zero by construction
    (pre-zeroed aliased output + zero-carrying tail overruns), so no
    select is needed on the gathered rows.
    """
    nk = sorted_pid.shape[0]
    slot_rows, f_lane = dpay.shape
    if f_pad is None:
        f_pad = f_lane
    _, idx = jax.lax.sort((sorted_pid, slot_of_sorted),
                          num_keys=1)  # pid -> slot (slot_cap = invalid)
    nn = n_rows - 1
    k = nk // nn
    # gather with (nn, k) indices directly: a flat (nk, f) gather
    # followed by reshape costs a full relayout copy of the gathered
    # array (~2.2 ms at bench shape, trace ops reshape.30 + copy.90)
    idx2 = jnp.minimum(idx, slot_rows - 1).reshape(nn, k)
    dreal = jnp.sum(dpay[idx2], axis=1)[:, :f_pad]
    return jnp.concatenate(
        [dreal, jnp.zeros((1, f_pad), dreal.dtype)], axis=0)


pallas_composite.defvjp(_pc_fwd, _pc_bwd)


def build_payload(proj: ProjectedGaussians,
                  extra_channels: jnp.ndarray | None,
                  with_color: bool = True):
    """Sanitized (N + 1, f_pad) per-gaussian payload table + n_val.

    Invalid rows are zeroed (keeps garbage projections from poisoning
    exp() and blocks their gradients). Row 5 carries log(opacity) —
    the kernels work in log space and the log's VJP (1/op chain)
    happens here in XLA. Row 6 is the constant ONE that folds the
    alpha-total into the channel matmul; a dead row (alpha == 0) is
    appended last for the layout's padding slots. with_color=False
    drops the rgb and depth value rows (the FEATURE-phase fast path).
    """
    n = proj.mean2d.shape[0]
    vmask = proj.valid
    opacity = jnp.where(vmask, proj.opacity, 0.0)
    log_op = jnp.log(jnp.maximum(opacity, 1e-38))
    mean2d = jnp.where(vmask[:, None], proj.mean2d, 0.0)
    conic = jnp.where(vmask[:, None], proj.conic, 0.0)
    val_cols = [proj.color] if with_color else []
    if extra_channels is not None:
        val_cols.append(extra_channels)
    if with_color:
        val_cols.append(proj.depth[:, None])
    vals = jnp.concatenate(val_cols, axis=1)
    n_val = vals.shape[1]
    f = GEOM_COLS + n_val
    f_pad = -(-f // 8) * 8
    payload = jnp.concatenate(
        [mean2d, conic, log_op[:, None], jnp.ones((n, 1), mean2d.dtype),
         jnp.zeros((n, 1), mean2d.dtype), vals,
         jnp.zeros((n, f_pad - f), mean2d.dtype)], axis=1)  # (N, f_pad)
    dead = jnp.zeros((1, f_pad), payload.dtype).at[0, 5].set(LOG_ZERO)
    return jnp.concatenate([payload, dead], axis=0), n_val


def rasterize_tiled_pallas(
    proj: ProjectedGaussians,
    extra_channels: jnp.ndarray | None,
    bg_color: jnp.ndarray,
    image_height: int,
    image_width: int,
    cfg: RasterConfig = RasterConfig(),
    interpret: bool = False,
    with_color: bool = True,
    grad_values_only: bool = False,
):
    """Drop-in replacement for ops.rasterize.rasterize_tiled (fwd + bwd).

    Same outputs: render (3,H,W), feats (F,H,W) when extra_channels is
    given, depth (1,H,W), alpha (1,H,W), overflow (scalar).

    with_color=False (requires extra_channels) composites ONLY the
    feature channels + alpha — the FEATURE-phase fast path: the rgb
    and depth rows carry zero cotangent in the contrastive loss, so
    dropping them is gradient-exact while cutting the payload stream
    (48 -> 40 rows unpacked; 32 -> 24 packed) and both kernels' value
    matmuls.

    grad_values_only=True is a CALLER CONTRACT that only the VALUE-row
    gradients (features/rgb/depth) of the payload will be consumed:
    the backward kernel emits exact dL/dv and zeros for the geometry/
    opacity rows, skipping both 256-row alpha-chain matmuls and the
    quadratic pullback. Use when the upstream loss differentiates only
    feature values (FEATURE phase once densification has ended —
    reference train.py:362 gates add_densification_stats the same
    way); wrong-mode use silently zeroes geometry grads, so callers
    must gate it on their argnums.
    """
    if not with_color and extra_channels is None:
        raise ValueError("with_color=False requires extra_channels")
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    sorted_pid, slot_of_sorted, layout, overflow = build_window_layout(
        proj, image_height, image_width, cfg)

    payload, n_val = build_payload(proj, extra_channels, with_color)

    n_packed = 0
    if (cfg.pack_features and extra_channels is not None
            and extra_channels.shape[1] % 2 == 0):
        n_packed = extra_channels.shape[1] // 2
    out = pallas_composite(
        (num_tiles, tw, n_val, interpret, None, n_packed, with_color,
         grad_values_only),
        payload, sorted_pid, slot_of_sorted, layout
    )  # (th, 16, gxn*16, 16, 1 + n_val) — image patches
    gxt = out.shape[2] * TILE
    hwc = out.reshape(th * TILE, gxt, n_val + 1)[
        :image_height, :image_width]  # free reshape + slice
    acc = hwc[..., 0]
    result = {
        "alpha": acc[None],
        "overflow": overflow[0],
        "overflow_half": overflow[1],
    }
    if with_color:
        rgb = (hwc[..., 1:4]
               + (1.0 - acc)[..., None] * bg_color[None, None, :])
        result["render"] = rgb.transpose(2, 0, 1)
        result["depth"] = hwc[..., -1][None]
    feats_hwc = None
    if extra_channels is not None:
        feats_hwc = hwc[..., 4:-1] if with_color else hwc[..., 1:]
    if not with_color:
        # [acc | feats] channels-last, UNSLICED on the channel axis:
        # the [..., 1:] minor-dim slice above materializes a ~350 MB
        # copy at 1K/32ch (trace op slice.194, ~2 ms + its VJP pad) —
        # losses that can consume the accumulator column too (the
        # FEATURE phase reads |feats| via total^2 - acc^2) skip it
        result["feats_acc_hwc"] = hwc
    if feats_hwc is not None:
        # hwc is the kernel-native layout; the CHW transpose costs
        # ~170 MB each way at 1K/32ch, so expose both and let jit
        # dead-code-eliminate whichever the consumer ignores
        result["feats_hwc"] = feats_hwc
        result["feats"] = feats_hwc.transpose(2, 0, 1)
    return result
