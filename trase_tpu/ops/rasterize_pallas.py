"""Pallas TPU compositing kernels (forward + custom-VJP backward).

TPU-native replacement for the compositing stage of the reference's
CUDA rasterizer (submodules/diff-gaussian-rasterization, contract per
SURVEY.md §2.3a; call site gaussian_renderer/__init__.py:137-155). The
projection / tile-binning stages stay in XLA (ops/projection.py,
build_window_layout below); these kernels replace the dense jnp
compositor (ops/rasterize.py:_composite_tiles) on the hot path.

Design — *window grid* over the depth-sorted pair array:

- Pairs (gaussian, tile) are emitted in front-to-back gaussian order
  (one N-sized depth presort) and grouped per tile by ONE single-key
  stable sort on tile id. The per-gaussian payload — 8 geometry columns
  [mean2d(2), conic(3), log opacity, 0, 0] + value channels
  [rgb, (feat32), depth] — is gathered once into pair order:
  sorted_payload (N*K + chunk, F_pad), row-major.
- Each tile's pair range [A, B) is covered by 128-aligned windows
  ("slabs") of sorted_payload rows. The kernels read window blocks
  DIRECTLY via a scalar-prefetched block-index array — no slab
  relayout, no second gather, no transposes. Lanes outside the tile's
  [lo, hi) range within a window are masked in-kernel (they belong to
  neighboring tiles). Empty tiles get one degenerate window (lo == hi)
  so their output block is still zeroed; trailing unoccupied slabs
  carry a `num_tiles` sentinel and are skipped.
- Forward grid = one program per slab. Per-tile state (log-space
  transmittance carry) lives in VMEM scratch, persisted across the
  sequential grid; the per-tile output block accumulates in VMEM while
  consecutive slabs map to the same tile (the standard reduction-block
  pattern) and is flushed when the tile changes.
- Per slab: splat power is direct VPU math on (128, 256) blocks
  (pair-chunk x pixels); the front-to-back transmittance scan is ONE
  (128,128)x(128,256) MXU matmul of log(1-alpha) against a lower-
  triangular ones matrix; channel accumulation is one
  (n_val,128)x(128,256) MXU matmul. The composite weight is a single
  exp of (log alpha + exclusive scan + log T) — no division. Early-out
  skips compute (not DMA) once every pixel in the tile saturates
  (T < 1e-4), matching the CUDA kernel's termination rule.
- Forward also emits T at each slab entry (S, 256): the residual that
  makes the backward embarrassingly slab-parallel.

Backward (custom_vjp): one reverse pass over slabs. Recomputes
alpha/T/w from the payload + saved slab-entry transmittance, carries
the suffix accumulator R_i = sum_{j>i} q_j w_j across a tile's slabs
in VMEM scratch (reverse grid order), and emits exact gradients for
mean2d / conic / log-opacity / values:

    dL/dv_i      = sum_p g(p) w_i(p)
    dL/dalpha_i  = q_i T_i [keep] - R_i / (1 - alpha_i)
    dL/dpower    = dL/dalpha * alpha        (gated by the clamp/cutoffs)
    dL/dlog_op   = row-sum of dL/dpower

Window blocks shared by two tiles are accumulated in VMEM across the
(consecutive) revisits. The screen-space mean gradient required by
densification (reference train.py:366, scene/gaussian_model.py:637-639)
flows through the mean2d columns. Gradients land on sorted_payload;
XLA autodiff transposes the payload gather into the scatter-add over
gaussians (the moral equivalent of the CUDA backward's atomics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectedGaussians
from .rasterize import TILE, RasterConfig, _tile_grid, _tile_rects
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

PAIR_CHUNK = 128  # window width = lane count
GEOM_COLS = 8  # mean2d(2) + conic(3) + log opacity(1) + pad(2)
PIX = TILE * TILE  # 256

LOG_ALPHA_MAX = float(np.log(ALPHA_MAX))
LOG_ALPHA_EPS = float(np.log(ALPHA_EPS))
LOG_T_EPS = float(np.log(T_EPS))
LOG_ZERO = float(np.log(1e-38))  # log-opacity of dead / padding rows


def _cumsum_small(x: jnp.ndarray) -> jnp.ndarray:
    """Inclusive int32 cumsum via two tiny MXU matmuls.

    jnp.cumsum on a few-thousand-element vector lowers to a
    latency-bound multi-pass scan (~2.7 ms measured on v5e); two
    triangular matmuls do it in ~0.1 ms. Exact for values < 2^24
    (f32 mantissa).
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
    ir = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 0)
    jr = jax.lax.broadcasted_iota(jnp.int32, (rows, rows), 1)
    strict = (ir < jr).astype(jnp.float32)
    offs = jax.lax.dot_general(
        row_tot[None, :], strict, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)[0]
    return (row_cum + offs[:, None]).reshape(-1)[:n].astype(jnp.int32)


def build_window_layout(proj: ProjectedGaussians, image_height: int,
                        image_width: int, cfg: RasterConfig):
    """Fixed-K pair expansion + depth-ordered per-tile window layout.

    Each gaussian emits up to K = cfg.pairs_per_gaussian (tile, gauss)
    pairs, row-major over its covered tile rect (CUDA getRect
    semantics); rects larger than K tiles are truncated and the dropped
    pair count reported as `overflow`.

    Depth ordering comes from a cheap N-sized presort (gaussians ranked
    by view depth), after which ONE single-key *stable* sort on tile id
    groups pairs per tile while preserving front-to-back order. Each
    tile's sorted-pair range [A, B) is then covered by PAIR_CHUNK-
    aligned windows; per window the valid lane range [lo, hi) is pure
    index arithmetic — no scatter histogram, no slab-relayout gather.

    Returns (sorted_gauss (N*K,), slab_tile (S,), win (S,), lohi (S,),
    overflow) with S = N*K//chunk + num_tiles + 2. `slab_tile` holds
    `num_tiles` for unoccupied trailing slabs (the kernels skip those);
    their `win` entries cover the sorted-payload tail blocks so the
    backward kernel zeroes every gradient block exactly once. `lohi`
    packs the lane range as lo * 256 + hi.
    """
    chunk = PAIR_CHUNK
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    n = proj.mean2d.shape[0]
    K = cfg.pairs_per_gaussian
    nk = n * K

    tx0, ty0, rect_w, count = _tile_rects(proj, th, tw)
    rect_h = count // jnp.maximum(rect_w, 1)

    # Rects larger than K tiles shrink to an aspect-balanced sub-rect
    # centered on the projected mean — the dropped tiles are the
    # farthest (weakest) ones, bounding the quality cost of the static
    # per-gaussian pair budget.
    w_f = jnp.maximum(rect_w, 1).astype(jnp.float32)
    h_f = jnp.maximum(rect_h, 1).astype(jnp.float32)
    ideal_w = jnp.sqrt(K * w_f / h_f)
    w2 = jnp.clip(jnp.round(ideal_w).astype(jnp.int32), 1,
                  jnp.minimum(rect_w, K))
    w2 = jnp.maximum(w2, 1)
    h2 = jnp.clip(K // w2, 1, jnp.maximum(rect_h, 1))
    count2 = jnp.where(count > 0, w2 * h2, 0)
    overflow = jnp.sum(jnp.maximum(count - count2, 0))

    ct_x = jnp.floor(proj.mean2d[:, 0] / TILE).astype(jnp.int32)
    ct_y = jnp.floor(proj.mean2d[:, 1] / TILE).astype(jnp.int32)
    ct_x = jnp.clip(ct_x, tx0, tx0 + jnp.maximum(rect_w - 1, 0))
    ct_y = jnp.clip(ct_y, ty0, ty0 + jnp.maximum(rect_h - 1, 0))
    x0 = jnp.clip(ct_x - w2 // 2, tx0, tx0 + jnp.maximum(rect_w - w2, 0))
    y0 = jnp.clip(ct_y - h2 // 2, ty0, ty0 + jnp.maximum(rect_h - h2, 0))

    # Depth presort at N; ONE packed gather reorders the rect data.
    depth_key = jnp.where(count2 > 0, proj.depth, jnp.inf)
    _, order = jax.lax.sort(
        (depth_key, jnp.arange(n, dtype=jnp.int32)), num_keys=1)
    packed = jnp.stack([x0, y0, jnp.maximum(w2, 1), count2], axis=1)[order]
    x0_r, y0_r, w2_r, c2_r = (packed[:, 0], packed[:, 1], packed[:, 2],
                              packed[:, 3])

    ks = jnp.arange(K, dtype=jnp.int32)[None, :]  # (1, K)
    dx = ks % w2_r[:, None]
    dy = ks // w2_r[:, None]
    tile = (y0_r[:, None] + dy) * tw + (x0_r[:, None] + dx)  # (N, K)
    pvalid = ks < c2_r[:, None]
    tile = jnp.where(pvalid, tile, num_tiles).astype(jnp.int32)
    gauss = jnp.broadcast_to(order[:, None], (n, K))

    # Stable single-key sort: groups by tile, preserves depth order.
    sorted_tile, sorted_gauss = jax.lax.sort(
        (tile.ravel(), gauss.ravel()), num_keys=1, is_stable=True)

    tile_start = jnp.searchsorted(
        sorted_tile, jnp.arange(num_tiles + 1, dtype=jnp.int32),
        side="left", method="scan_unrolled").astype(jnp.int32)
    a = tile_start[:-1]  # (T,) first pair of tile
    b = tile_start[1:]  # (T,) one past last pair
    w0 = a // chunk  # first window block
    nwin = jnp.maximum(-(-b // chunk) - w0, 1)  # >= 1 even for empty tiles
    cum = _cumsum_small(nwin)
    win_start = cum - nwin
    total_win = cum[-1]

    s_cap = nk // chunk + num_tiles + 2
    slab_tile = jnp.searchsorted(
        cum, jnp.arange(s_cap, dtype=jnp.int32), side="right",
        method="scan_unrolled").astype(jnp.int32)  # [0..T]; T = unoccupied
    t_c = jnp.minimum(slab_tile, num_tiles - 1)
    k = jnp.arange(s_cap, dtype=jnp.int32) - win_start[t_c]
    win = w0[t_c] + k  # block index into sorted_payload
    base = win * chunk
    lo = jnp.clip(a[t_c] - base, 0, chunk)
    hi = jnp.clip(b[t_c] - base, 0, chunk)

    # Unoccupied trailing slabs cover the sorted-payload tail blocks
    # (starting strictly after the last real-covered block) so the
    # backward pass zeroes every gradient block exactly once.
    blocks_total = nk // chunk + 1  # sorted_payload has one pad block
    covered_end = -(-tile_start[num_tiles] // chunk)
    g_idx = jnp.arange(s_cap, dtype=jnp.int32) - total_win
    win_g = jnp.minimum(covered_end + g_idx, blocks_total - 1)
    unoccupied = slab_tile >= num_tiles
    win = jnp.where(unoccupied, win_g, win)
    lo = jnp.where(unoccupied, 0, lo)
    hi = jnp.where(unoccupied, 0, hi)
    lohi = lo * 256 + hi
    return sorted_gauss, slab_tile, win, lohi, overflow


def _lane_range(lohi):
    lane = jax.lax.broadcasted_iota(jnp.int32, (PAIR_CHUNK, 1), 0)
    lo = lohi // 256
    hi = lohi - lo * 256
    return (lane >= lo) & (lane < hi)


def _splat_weights(block, okl, t_prev, t, tw, scan_lower):
    """Backward-path recompute: alpha, transmittances, weights, AND the
    (chunk, PIX) dx/dy blocks the gradient formulas need.

    block: (chunk, F_pad) payload window with column 5 = log(opacity);
    okl: (chunk, 1) lane-validity mask; t_prev: (1, PIX) transmittance
    at slab entry.
    """
    mx, my = block[:, 0:1], block[:, 1:2]
    ca, cb, cc = block[:, 2:3], block[:, 3:4], block[:, 4:5]
    log_op = block[:, 5:6]

    pix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = ((pix % TILE) + (t % tw) * TILE).astype(jnp.float32)
    py = ((pix // TILE) + (t // tw) * TILE).astype(jnp.float32)
    dx = mx - px  # (chunk, PIX)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_un = jnp.exp(jnp.minimum(power, 0.0) + log_op)
    alpha = jnp.minimum(alpha_un, ALPHA_MAX)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_EPS) | ~okl, 0.0,
                      alpha)
    lg = jnp.log1p(-alpha)
    cum = jax.lax.dot_general(
        scan_lower, lg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # inclusive prefix sums of log(1-alpha) along the chunk axis
    incl = jnp.exp(cum) * t_prev  # T after each pair
    excl = incl / (1.0 - alpha)  # T before each pair
    w = jnp.where(incl >= T_EPS, alpha * excl, 0.0)
    return dict(power=power, alpha_un=alpha_un, alpha=alpha, incl=incl,
                excl=excl, w=w, dx=dx, dy=dy, ca=ca, cb=cb, cc=cc)


# NOTE: a variant evaluating splat power as an MXU monomial-basis
# matmul ((chunk,6) x (6,PIX)) was tried and measured SLOWER on v5e
# than the direct VPU algebra — a contraction depth of 6 leaves the
# 128x128 systolic array ~95% idle while adding relayouts.


def _splat_weights_fwd(block, okl, logt_prev, t, tw, scan_lower):
    """Forward-only variant, fully in log space.

    Opacity arrives pre-folded as log(op) (payload column 5), the
    transmittance carry is log T, and the composite weight is ONE exp
    of (alpha_log + exclusive-scan + log T) — no division, no
    opacity multiply, no separate exp of the scan. Valid payloads have
    PD conics (power <= 0) and sanitized rows carry log op ~= -87
    (alpha -> 0). Matches _splat_weights up to fp reassociation.

    Returns (w (chunk, PIX), new_logt (1, PIX)).
    """
    mx, my = block[:, 0:1], block[:, 1:2]
    ca, cb, cc = block[:, 2:3], block[:, 3:4], block[:, 4:5]
    log_op = block[:, 5:6]

    pix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = ((pix % TILE) + (t % tw) * TILE).astype(jnp.float32)
    py = ((pix // TILE) + (t // tw) * TILE).astype(jnp.float32)
    dx = mx - px  # (chunk, PIX)
    dy = my - py
    alpha_log = jnp.minimum(
        -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy + log_op,
        LOG_ALPHA_MAX,
    )
    ok = (alpha_log >= LOG_ALPHA_EPS) & okl
    alpha = jnp.where(ok, jnp.exp(alpha_log), 0.0)
    lg = jnp.log1p(-alpha)
    cum_incl = jax.lax.dot_general(
        scan_lower, lg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # inclusive prefix sums of log(1-alpha)
    cum_excl = cum_incl - lg
    live = ok & (cum_incl + logt_prev >= LOG_T_EPS)
    w = jnp.where(live, jnp.exp(alpha_log + cum_excl + logt_prev), 0.0)
    return w, logt_prev + cum_incl[-1:, :]


def _scan_lower():
    chunk = PAIR_CHUNK
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (cols <= rows).astype(jnp.float32)


def _fwd_kernel(st_ref, win_ref, lohi_ref, payload_ref, out_ref,
                tentry_ref, logt_carry, *, n_val: int, tw: int,
                num_tiles: int):
    s = pl.program_id(0)
    t = st_ref[s]
    prev_t = st_ref[jnp.maximum(s - 1, 0)]
    occupied = t < num_tiles  # trailing unoccupied slabs are skipped
    first = jnp.logical_and(
        jnp.logical_or(s == 0, prev_t != t), occupied)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        logt_carry[...] = jnp.zeros(logt_carry.shape, logt_carry.dtype)

    tentry_ref[0] = jnp.exp(logt_carry[...])
    alive = jnp.logical_and(occupied,
                            jnp.max(logt_carry[...]) >= LOG_T_EPS)

    @pl.when(alive)
    def _():
        block = payload_ref[...]  # (chunk, F_pad)
        okl = _lane_range(lohi_ref[s])
        w, new_logt = _splat_weights_fwd(
            block, okl, logt_carry[...], t, tw, _scan_lower())
        vals = block[:, GEOM_COLS:GEOM_COLS + n_val]  # (chunk, n_val)
        contrib = jax.lax.dot_general(
            vals, w, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_val, PIX)
        out_ref[0, 0:n_val, :] += contrib
        out_ref[0, n_val:n_val + 1, :] += jnp.sum(w, axis=0, keepdims=True)
        logt_carry[...] = new_logt


def _bwd_kernel(st_ref, win_ref, lohi_ref, payload_ref, g_ref, tentry_ref,
                dpay_ref, r_carry, *, n_val: int, tw: int, s_count: int,
                f_pad: int, num_tiles: int):
    si = pl.program_id(0)
    s = s_count - 1 - si  # reverse traversal
    t = st_ref[s]
    occupied = t < num_tiles
    nxt_t = st_ref[jnp.minimum(s + 1, s_count - 1)]
    is_tile_tail = jnp.logical_or(s == s_count - 1, nxt_t != t)

    @pl.when(is_tile_tail)
    def _():
        r_carry[...] = jnp.zeros(r_carry.shape, r_carry.dtype)

    # A payload block on a tile boundary is visited by two consecutive
    # slabs — zero it on first (reverse-order) visit, accumulate after.
    prev_win = win_ref[jnp.minimum(s + 1, s_count - 1)]
    new_block = jnp.logical_or(s == s_count - 1, prev_win != win_ref[s])

    @pl.when(new_block)
    def _():
        dpay_ref[...] = jnp.zeros(dpay_ref.shape, dpay_ref.dtype)

    t_in = tentry_ref[0]  # (1, PIX) transmittance at slab entry
    alive = jnp.logical_and(occupied, jnp.max(t_in) >= T_EPS)

    @pl.when(alive)
    def _():
        chunk = PAIR_CHUNK
        scan_lower = _scan_lower()
        block = payload_ref[...]
        okl = _lane_range(lohi_ref[s])
        sw = _splat_weights(block, okl, t_in, t, tw, scan_lower)
        vals = block[:, GEOM_COLS:GEOM_COLS + n_val]  # (chunk, n_val)
        g_vals = g_ref[0, 0:n_val, :]  # (n_val, PIX)
        g_acc = g_ref[0, n_val:n_val + 1, :]  # (1, PIX)

        # q_i(p) = dL/dw_i(p) = g(p) . v_i + g_acc(p)
        q = jax.lax.dot_general(
            vals, g_vals, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ) + g_acc  # (chunk, PIX)
        qw = q * sw["w"]
        s_incl = jax.lax.dot_general(
            scan_lower, qw, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        s_tot = s_incl[-1:, :]
        suffix = r_carry[...] + (s_tot - s_incl)  # R_i: strictly-after sum

        keep = (sw["incl"] >= T_EPS).astype(jnp.float32)
        dalpha = q * sw["excl"] * keep - suffix / (1.0 - sw["alpha"])
        gate = ((sw["power"] <= 0.0)
                & (sw["alpha_un"] < ALPHA_MAX)
                & (sw["alpha_un"] >= ALPHA_EPS)
                & okl).astype(jnp.float32)
        dpow = dalpha * gate * sw["alpha_un"]

        dx, dy = sw["dx"], sw["dy"]
        ca, cb, cc = sw["ca"], sw["cb"], sw["cc"]
        dmx = jnp.sum(dpow * -(ca * dx + cb * dy), axis=1, keepdims=True)
        dmy = jnp.sum(dpow * -(cc * dy + cb * dx), axis=1, keepdims=True)
        d_a = jnp.sum(dpow * (-0.5) * dx * dx, axis=1, keepdims=True)
        d_b = jnp.sum(dpow * -(dx * dy), axis=1, keepdims=True)
        d_c = jnp.sum(dpow * (-0.5) * dy * dy, axis=1, keepdims=True)
        # payload column 5 is log(op): d alpha_un / d log_op = alpha_un,
        # so d_logop is just the row-sum of dpow.
        d_logop = jnp.sum(dpow, axis=1, keepdims=True)
        zc = jnp.zeros_like(dmx)

        dvals = jax.lax.dot_general(
            sw["w"], g_vals, (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (chunk, n_val)

        parts = [dmx, dmy, d_a, d_b, d_c, d_logop, zc, zc, dvals]
        pad_cols = f_pad - GEOM_COLS - n_val
        if pad_cols:
            parts.append(jnp.zeros((chunk, pad_cols), jnp.float32))
        dpay_ref[...] += jnp.concatenate(parts, axis=1)
        r_carry[...] = r_carry[...] + s_tot


def _forward_impl(sorted_payload, slab_tile, win, lohi, *, num_tiles, tw,
                  n_val, interpret):
    p_rows, f_pad = sorted_payload.shape
    s_count = slab_tile.shape[0]
    c_out = n_val + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_count,),
        in_specs=[
            pl.BlockSpec((PAIR_CHUNK, f_pad),
                         lambda s, st, wn, lh: (wn[s], 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c_out, PIX),
                         lambda s, st, wn, lh: (
                             jnp.minimum(st[s], num_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda s, st, wn, lh: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, PIX), jnp.float32)],
    )
    kernel = functools.partial(_fwd_kernel, n_val=n_val, tw=tw,
                               num_tiles=num_tiles)
    return pl.pallas_call(
        kernel,
        out_shape=[
            jax.ShapeDtypeStruct((num_tiles, c_out, PIX), jnp.float32),
            jax.ShapeDtypeStruct((s_count, 1, PIX), jnp.float32),
        ],
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slab_tile, win, lohi, sorted_payload)


def _backward_impl(sorted_payload, slab_tile, win, lohi, t_entry, g, *,
                   num_tiles, tw, n_val, interpret):
    p_rows, f_pad = sorted_payload.shape
    s_count = slab_tile.shape[0]
    c_out = n_val + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(s_count,),
        in_specs=[
            pl.BlockSpec((PAIR_CHUNK, f_pad),
                         lambda si, st, wn, lh: (wn[s_count - 1 - si], 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out, PIX),
                         lambda si, st, wn, lh: (
                             jnp.minimum(st[s_count - 1 - si],
                                         num_tiles - 1), 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX),
                         lambda si, st, wn, lh: (s_count - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((PAIR_CHUNK, f_pad),
                               lambda si, st, wn, lh: (
                                   wn[s_count - 1 - si], 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, PIX), jnp.float32)],
    )
    kernel = functools.partial(_bwd_kernel, n_val=n_val, tw=tw,
                               s_count=s_count, f_pad=f_pad,
                               num_tiles=num_tiles)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((p_rows, f_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slab_tile, win, lohi, sorted_payload, g, t_entry)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_composite(static_cfg, sorted_payload, slab_tile, win, lohi):
    """Composite windows -> (num_tiles, n_val + 1, 256) accumulations.

    static_cfg = (num_tiles, tw, n_val, interpret). Differentiable in
    sorted_payload via the Pallas backward kernel.
    """
    num_tiles, tw, n_val, interpret = static_cfg
    out, _ = _forward_impl(sorted_payload, slab_tile, win, lohi,
                           num_tiles=num_tiles, tw=tw, n_val=n_val,
                           interpret=interpret)
    return out


def _pc_fwd(static_cfg, sorted_payload, slab_tile, win, lohi):
    num_tiles, tw, n_val, interpret = static_cfg
    out, t_entry = _forward_impl(sorted_payload, slab_tile, win, lohi,
                                 num_tiles=num_tiles, tw=tw, n_val=n_val,
                                 interpret=interpret)
    return out, (sorted_payload, slab_tile, win, lohi, t_entry)


def _pc_bwd(static_cfg, res, g):
    num_tiles, tw, n_val, interpret = static_cfg
    sorted_payload, slab_tile, win, lohi, t_entry = res
    dpay = _backward_impl(sorted_payload, slab_tile, win, lohi, t_entry, g,
                          num_tiles=num_tiles, tw=tw, n_val=n_val,
                          interpret=interpret)
    return dpay, None, None, None


pallas_composite.defvjp(_pc_fwd, _pc_bwd)


def rasterize_tiled_pallas(
    proj: ProjectedGaussians,
    extra_channels: jnp.ndarray | None,
    bg_color: jnp.ndarray,
    image_height: int,
    image_width: int,
    cfg: RasterConfig = RasterConfig(),
    interpret: bool = False,
):
    """Drop-in replacement for ops.rasterize.rasterize_tiled (fwd + bwd).

    Same outputs: render (3,H,W), feats (F,H,W) when extra_channels is
    given, depth (1,H,W), alpha (1,H,W), overflow (scalar).
    """
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    sorted_gauss, slab_tile, win, lohi, overflow = build_window_layout(
        proj, image_height, image_width, cfg)

    n = proj.mean2d.shape[0]
    # Sanitized per-gaussian payload (invalid rows zeroed: keeps garbage
    # projections from poisoning exp() and blocks their gradients).
    # Column 5 carries log(opacity): the kernels work in log space, and
    # the log's VJP (1/op chain) happens here in XLA, outside the kernel.
    vmask = proj.valid
    opacity = jnp.where(vmask, proj.opacity, 0.0)
    log_op = jnp.log(jnp.maximum(opacity, 1e-38))
    mean2d = jnp.where(vmask[:, None], proj.mean2d, 0.0)
    conic = jnp.where(vmask[:, None], proj.conic, 0.0)
    val_cols = [proj.color]
    if extra_channels is not None:
        val_cols.append(extra_channels)
    val_cols.append(proj.depth[:, None])
    vals = jnp.concatenate(val_cols, axis=1)
    n_val = vals.shape[1]
    f = GEOM_COLS + n_val
    f_pad = -(-f // 8) * 8
    payload = jnp.concatenate(
        [mean2d, conic, log_op[:, None],
         jnp.zeros((n, 2), mean2d.dtype), vals,
         jnp.zeros((n, f_pad - f), mean2d.dtype)], axis=1)  # (N, f_pad)

    sorted_payload = payload[sorted_gauss]  # (N*K, f_pad) — the one gather
    # one zero pad block: windows may extend past the last pair; padding
    # rows are outside every [lo, hi) lane range anyway.
    sorted_payload = jnp.concatenate(
        [sorted_payload,
         jnp.zeros((PAIR_CHUNK, f_pad), sorted_payload.dtype)], axis=0)

    out = pallas_composite(
        (num_tiles, tw, n_val, interpret), sorted_payload, slab_tile,
        win, lohi
    )  # (T, n_val + 1, PIX)

    acc = out[:, n_val, :]
    img = out[:, :n_val, :].reshape(th, tw, n_val, TILE, TILE)
    img = img.transpose(2, 0, 3, 1, 4).reshape(
        n_val, th * TILE, tw * TILE)[:, :image_height, :image_width]
    acc = acc.reshape(th, tw, TILE, TILE).transpose(0, 2, 1, 3).reshape(
        th * TILE, tw * TILE)[:image_height, :image_width]

    rgb = img[:3] + (1.0 - acc)[None] * bg_color[:, None, None]
    result = {
        "render": rgb,
        "depth": img[-1:],
        "alpha": acc[None],
        "overflow": overflow,
    }
    if extra_channels is not None:
        result["feats"] = img[3:-1]
    return result
