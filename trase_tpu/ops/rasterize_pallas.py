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
  stable sort on tile id. The per-gaussian payload — 8 geometry rows
  [mean2d(2), conic(3), log opacity, 0, 0] + value channels
  [rgb, (feat32), depth] — is gathered once into pair order and stored
  TRANSPOSED: sorted_payload (F_pad, N*K + chunk), pairs in lanes.
  Manual-DMA HBM slices must be 128-lane aligned on the minor dim; the
  transposed layout makes every window block a native
  (F_pad, 128) lane slice at a 128-aligned offset.
- Each tile's pair range [A, B) is covered by 128-aligned windows
  ("slabs") of sorted_payload lanes. The kernels read window blocks
  DIRECTLY via double-buffered manual DMA driven by a scalar-prefetched
  block-index array — no slab relayout, no second gather, no
  transposes. Lanes outside the tile's [lo, hi) range within a window
  are masked in-kernel (they belong to neighboring tiles). Empty tiles
  get one degenerate window (lo == hi) so their output block is still
  zeroed; trailing unoccupied slabs carry a `num_tiles` sentinel and
  are skipped.
- Grid = one program per *group* of `cfg.tile_group` consecutive
  tiles; an inner fori_loop walks the group's windows (amortizes the
  ~0.5 us/step sequential-grid overhead over ~dozens of windows).
  Per-tile state (log-space transmittance carry) lives in VMEM
  scratch; the group's (group, PIX, c_out) output accumulates in the
  VMEM out block with dynamic per-tile indexing.
- All in-kernel math is in the transposed (PIX=256 sublanes,
  chunk=128 lanes) layout: splat power is direct VPU algebra; the
  front-to-back transmittance scan is ONE (256,128)x(128,128) MXU
  matmul of log(1-alpha) against an upper-triangular ones matrix;
  channel accumulation, lane totals, and every pixel-reduction in the
  backward are MXU matmuls too — no cross-lane shuffles anywhere.
  The composite weight is a single exp of (log alpha + exclusive scan
  + log T) — no division. Early-out skips compute (not DMA) once every
  pixel in the tile saturates (T < 1e-4), matching the CUDA kernel's
  termination rule.

Backward (custom_vjp): a linear *visit* stream walks each tile's
windows twice (pass 1: per-pixel total S = sum q w and transmittance
recompute; pass 2: gradients via the forward-prefix form
R_i = S - prefix_i of the suffix accumulator), so no reverse sweep and
no saved per-slab state are needed. Exact gradients for mean2d /
conic / log-opacity / values:

    dL/dv_i      = sum_p g(p) w_i(p)
    dL/dalpha_i  = q_i T_i [keep] - R_i / (1 - alpha_i)
    dL/dpower    = dL/dalpha * alpha        (gated by the clamp/cutoffs)
    dL/dlog_op   = row-sum of dL/dpower

Gradient blocks accumulate in double-buffered VMEM and flush to HBM by
manual DMA when the payload block advances; window blocks shared by
two tiles accumulate across the (consecutive) revisits, and a block
shared across a *group* boundary is read-modify-written (rmw flag).
The screen-space mean gradient required by densification (reference
train.py:366, scene/gaussian_model.py:637-639) flows through the
mean2d rows. Gradients land on sorted_payload; XLA autodiff transposes
the payload gather into the scatter-add over gaussians (the moral
equivalent of the CUDA backward's atomics).
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

    Returns (sorted_gauss (N*K,), WindowLayout, overflow) with
    S = N*K//chunk + num_tiles + 2 windows. `slab_tile` holds
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
    tile_x = x0_r[:, None] + dx  # (N, K)
    tile_y = y0_r[:, None] + dy
    tile = (tile_y * tw + tile_x).astype(jnp.int32)
    pvalid = ks < c2_r[:, None]

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
        lam_min = jnp.maximum(lam_min, 0.0)
        log_opc = jnp.log(jnp.maximum(
            jnp.where(proj.valid, proj.opacity, 0.0), 1e-38))
        packed_f = jnp.stack(
            [proj.mean2d[:, 0], proj.mean2d[:, 1], lam_min, log_opc],
            axis=1)[order]  # one rank-order gather
        mx_r = packed_f[:, 0:1]
        my_r = packed_f[:, 1:2]
        lam_r = packed_f[:, 2:3]
        logop_r = packed_f[:, 3:4]
        rx0 = tile_x.astype(jnp.float32) * TILE
        ry0 = tile_y.astype(jnp.float32) * TILE
        ddx = jnp.clip(mx_r, rx0, rx0 + (TILE - 1)) - mx_r
        ddy = jnp.clip(my_r, ry0, ry0 + (TILE - 1)) - my_r
        max_alpha_log = logop_r - 0.5 * lam_r * (ddx * ddx + ddy * ddy)
        pvalid = pvalid & (max_alpha_log >= LOG_ALPHA_EPS)

    tile = jnp.where(pvalid, tile, num_tiles)
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

    # Group metadata for the tile-group mega-kernels: per-window
    # meta_t = tile*2 + is_first_window_of_tile, plus per-tile-group
    # window ranges. Unoccupied trailing slabs keep meta as tile
    # sentinel with an empty lane range — the backward visit stream
    # appends them after the last group to zero the gradient tail.
    group = max(int(cfg.tile_group), 1)
    t_pad = -(-num_tiles // group) * group
    first = (jnp.arange(s_cap, dtype=jnp.int32) == win_start[t_c])
    first = first & ~unoccupied
    meta_t = jnp.where(unoccupied, num_tiles * 2,
                       t_c * 2 + first.astype(jnp.int32))
    win_start_pad = jnp.concatenate(
        [win_start, jnp.full((t_pad + 1 - num_tiles,), total_win,
                             jnp.int32)])
    group_start = win_start_pad[::group]
    layout = WindowLayout(
        win=win, meta_t=meta_t, lohi=lohi, slab_tile=slab_tile,
        win_start=win_start_pad, group_start=group_start,
        total_win=total_win, covered_end=covered_end,
    )
    return sorted_gauss, layout, overflow


def _scan_upper():
    """(chunk, chunk) upper-triangular ones: X @ U = inclusive prefix
    sums of X along its lane axis."""
    chunk = PAIR_CHUNK
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (rows <= cols).astype(jnp.float32)


def _dot(a, b):
    return jax.lax.dot_general(a, b, (((1,), (0,)), ((), ())),
                               preferred_element_type=jnp.float32)


# All kernel math lives in the transposed (PIX sublanes, chunk lanes)
# layout so the DMA'd (f_pad, chunk) payload blocks feed it directly:
# per-pair geometry rows are (1, chunk) lane vectors, pixel coordinates
# are (PIX, 1) sublane iotas, and every reduction over pixels or pairs
# is an MXU matmul (ones-row / ones-column / triangular contractions) —
# no cross-lane shuffles, no relayouts.
#
# NOTE: a variant evaluating splat power as an MXU monomial-basis
# matmul was tried and measured SLOWER on v5e than the direct VPU
# algebra — a contraction depth of 6 leaves the 128x128 systolic array
# ~95% idle while adding relayouts.


def _splat_weights(block_t, okl, t_prev, t, tw, scan_upper, ones_col):
    """Backward-path recompute: alpha, transmittances, weights, AND the
    (PIX, chunk) dx/dy blocks the gradient formulas need.

    block_t: (f_pad, chunk) payload window with row 5 = log(opacity);
    okl: (1, chunk) lane-validity mask; t_prev: (PIX, 1) transmittance
    at window entry.
    """
    mx, my = block_t[0:1, :], block_t[1:2, :]
    ca, cb, cc = block_t[2:3, :], block_t[3:4, :], block_t[4:5, :]
    log_op = block_t[5:6, :]

    pix = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = ((pix % TILE) + (t % tw) * TILE).astype(jnp.float32)
    py = ((pix // TILE) + (t // tw) * TILE).astype(jnp.float32)
    dx = mx - px  # (PIX, chunk)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    alpha_un = jnp.exp(jnp.minimum(power, 0.0) + log_op)
    alpha = jnp.minimum(alpha_un, ALPHA_MAX)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_EPS) | ~okl, 0.0,
                      alpha)
    lg = jnp.log1p(-alpha)
    cum = _dot(lg, scan_upper)  # inclusive prefix of log(1-alpha), lanes
    tot = _dot(lg, ones_col)  # (PIX, 1) full-window log(1-alpha) sum
    incl = jnp.exp(cum) * t_prev  # T after each pair
    excl = incl / (1.0 - alpha)  # T before each pair
    w = jnp.where(incl >= T_EPS, alpha * excl, 0.0)
    incl_tot = jnp.exp(tot) * t_prev
    return dict(power=power, alpha_un=alpha_un, alpha=alpha, incl=incl,
                excl=excl, w=w, dx=dx, dy=dy, ca=ca, cb=cb, cc=cc,
                incl_tot=incl_tot)


def _splat_weights_fwd(block_t, okl, logt_prev, t, tw, scan_upper,
                       ones_col):
    """Forward-only variant, fully in log space.

    Opacity arrives pre-folded as log(op) (payload row 5), the
    transmittance carry is log T (PIX, 1), and the composite weight is
    ONE exp of (alpha_log + exclusive-scan + log T) — no division, no
    opacity multiply, no separate exp of the scan. Valid payloads have
    PD conics (power <= 0) and sanitized rows carry log op ~= -87
    (alpha -> 0). Matches _splat_weights up to fp reassociation.

    Returns (w (PIX, chunk), new_logt (PIX, 1)).
    """
    mx, my = block_t[0:1, :], block_t[1:2, :]
    ca, cb, cc = block_t[2:3, :], block_t[3:4, :], block_t[4:5, :]
    log_op = block_t[5:6, :]

    pix = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    px = ((pix % TILE) + (t % tw) * TILE).astype(jnp.float32)
    py = ((pix // TILE) + (t // tw) * TILE).astype(jnp.float32)
    dx = mx - px  # (PIX, chunk)
    dy = my - py
    alpha_log = jnp.minimum(
        -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy + log_op,
        LOG_ALPHA_MAX,
    )
    ok = (alpha_log >= LOG_ALPHA_EPS) & okl
    alpha = jnp.where(ok, jnp.exp(alpha_log), 0.0)
    lg = jnp.log1p(-alpha)
    cum_incl = _dot(lg, scan_upper)  # inclusive prefix along lanes
    cum_excl = cum_incl - lg
    live = ok & (cum_incl + logt_prev >= LOG_T_EPS)
    w = jnp.where(live, jnp.exp(alpha_log + cum_excl + logt_prev), 0.0)
    tot = _dot(lg, ones_col)  # (PIX, 1)
    return w, logt_prev + tot


def _fwd_group_kernel(gstart_ref, win_ref, metat_ref, lohi_ref,
                      payload_hbm, out_ref, pbuf, psem, logt,
                      *, n_val: int, tw: int, group: int, num_tiles: int):
    """One grid step = one group of `group` consecutive tiles.

    Inner fori_loop walks the group's windows with double-buffered
    manual DMA of (f_pad, chunk) payload blocks from HBM; the group's
    (group, PIX, c_out) output accumulates in the VMEM out block with
    dynamic per-tile indexing. This amortizes the ~0.5 us/step
    sequential-grid overhead (measured: a NULL kernel at one window
    per step costs ~7 ms at 13.5k steps) over ~dozens of windows per
    step.
    """
    gi = pl.program_id(0)
    w_lo = gstart_ref[gi]
    w_hi = gstart_ref[gi + 1]
    out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
    scan_upper = _scan_upper()
    ones_col = jnp.ones((PAIR_CHUNK, 1), jnp.float32)

    def pdma(slot, w):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(win_ref[w] * PAIR_CHUNK, PAIR_CHUNK)],
            pbuf.at[slot], psem.at[slot])

    @pl.when(w_lo < w_hi)
    def _():
        pdma(0, w_lo).start()

        def body(w, carry):
            i = w - w_lo
            slot = jax.lax.rem(i, 2)

            @pl.when(w + 1 < w_hi)
            def _():
                pdma(jax.lax.rem(i + 1, 2), w + 1).start()

            pdma(slot, w).wait()
            mt = metat_ref[w]
            t = mt // 2
            first = mt - 2 * t
            lh = lohi_ref[w]
            lo = lh // 256
            hi = lh - lo * 256

            @pl.when(first == 1)
            def _():
                logt[...] = jnp.zeros(logt.shape, logt.dtype)

            alive = jnp.logical_and(
                jnp.max(logt[...]) >= LOG_T_EPS,
                jnp.logical_and(hi > lo, t < num_tiles))

            @pl.when(alive)
            def _():
                block_t = pbuf[slot]
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, PAIR_CHUNK), 1)
                okl = (lane >= lo) & (lane < hi)
                wgt, new_logt = _splat_weights_fwd(
                    block_t, okl, logt[...], t, tw, scan_upper, ones_col)
                vals_t = block_t[GEOM_COLS:GEOM_COLS + n_val, :]
                contrib = jax.lax.dot_general(
                    wgt, vals_t, (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )  # (PIX, n_val)
                acc = _dot(wgt, ones_col)  # (PIX, 1)
                upd = jnp.concatenate([contrib, acc], axis=1)
                tx = t - gi * group
                out_ref[0, tx] = out_ref[0, tx] + upd
                logt[...] = new_logt

            return carry

        jax.lax.fori_loop(w_lo, w_hi, body, 0)


def _bwd_group_kernel(vgstart_ref, vwin_ref, vmetat_ref, vlohi_ref,
                      vpass_ref, rmw_ref, payload_hbm, g_ref, dpay_hbm,
                      pbuf, psem, obuf, osem, ibuf, isem, tcarry, stot,
                      prefix, state, *, n_val: int, tw: int, group: int,
                      num_tiles: int, f_pad: int):
    """Backward over one tile group via a linear *visit* stream.

    Each tile's windows appear twice: pass 1 accumulates the per-pixel
    total S = sum q*w (and recomputes the transmittance carry), pass 2
    recomputes weights and emits gradients, using the forward-prefix
    form R_i = S - prefix_i of the suffix accumulator. Gradient blocks
    accumulate in a double-buffered VMEM slot and flush to HBM when the
    payload block advances; the first block of a group is read-modify-
    written when it is shared with the previous group (rmw flag), and
    trailing garbage visits zero the gradient tail.

    state (SMEM): [0]=cur block (-1 none), [1]=cur obuf slot,
    [2]=inflight block of slot 0 (-1 none), [3]=inflight of slot 1,
    [4]=first-writer-of-group pending flag.
    """
    gi = pl.program_id(0)
    v_lo = vgstart_ref[gi]
    v_hi = vgstart_ref[gi + 1]
    state[0] = -1
    state[1] = 0
    state[2] = -1
    state[3] = -1
    state[4] = 1
    scan_upper = _scan_upper()
    ones_col = jnp.ones((PAIR_CHUNK, 1), jnp.float32)
    ones_row = jnp.ones((1, PIX), jnp.float32)
    czero = jnp.zeros((f_pad, PAIR_CHUNK), jnp.float32)

    def pdma(slot, v):
        return pltpu.make_async_copy(
            payload_hbm.at[:, pl.ds(vwin_ref[v] * PAIR_CHUNK, PAIR_CHUNK)],
            pbuf.at[slot], psem.at[slot])

    def odma(slot, blk):
        return pltpu.make_async_copy(
            obuf.at[slot],
            dpay_hbm.at[:, pl.ds(blk * PAIR_CHUNK, PAIR_CHUNK)],
            osem.at[slot])

    def idma(blk):
        return pltpu.make_async_copy(
            dpay_hbm.at[:, pl.ds(blk * PAIR_CHUNK, PAIR_CHUNK)],
            ibuf, isem)

    def flush_cur():
        cur, cur_slot = state[0], state[1]

        @pl.when(cur >= 0)
        def _():
            odma(cur_slot, cur).start()
            state[2 + cur_slot] = cur

    def advance_to(blk):
        flush_cur()
        new_slot = 1 - state[1]
        inflight = state[2 + new_slot]

        @pl.when(inflight >= 0)
        def _():
            odma(new_slot, inflight).wait()

        state[2 + new_slot] = -1
        use_rmw = jnp.logical_and(state[4] == 1, rmw_ref[gi] == 1)

        @pl.when(use_rmw)
        def _():
            idma(blk).start()
            idma(blk).wait()
            obuf[new_slot] = ibuf[...]

        @pl.when(jnp.logical_not(use_rmw))
        def _():
            obuf[new_slot] = czero

        state[4] = 0
        state[0] = blk
        state[1] = new_slot

    @pl.when(v_lo < v_hi)
    def _():
        pdma(0, v_lo).start()

        def body(v, carry):
            i = v - v_lo
            slot = jax.lax.rem(i, 2)

            @pl.when(v + 1 < v_hi)
            def _():
                pdma(jax.lax.rem(i + 1, 2), v + 1).start()

            pdma(slot, v).wait()
            mt = vmetat_ref[v]
            t = mt // 2
            first = mt - 2 * t
            lh = vlohi_ref[v]
            lo = lh // 256
            hi = lh - lo * 256
            is_p2 = vpass_ref[v] == 1
            blk = vwin_ref[v]
            occupied = t < num_tiles

            # writer visits drive the gradient-block lifecycle — also
            # for garbage visits, which flush zero blocks over the tail
            @pl.when(jnp.logical_and(is_p2, blk != state[0]))
            def _():
                advance_to(blk)

            @pl.when(jnp.logical_and(first == 1, jnp.logical_not(is_p2)))
            def _():
                tcarry[...] = jnp.ones(tcarry.shape, tcarry.dtype)
                stot[...] = jnp.zeros(stot.shape, stot.dtype)

            @pl.when(jnp.logical_and(first == 1, is_p2))
            def _():
                tcarry[...] = jnp.ones(tcarry.shape, tcarry.dtype)
                prefix[...] = jnp.zeros(prefix.shape, prefix.dtype)

            alive = jnp.logical_and(
                jnp.max(tcarry[...]) >= T_EPS,
                jnp.logical_and(hi > lo, occupied))

            @pl.when(alive)
            def _():
                block_t = pbuf[slot]
                lane = jax.lax.broadcasted_iota(
                    jnp.int32, (1, PAIR_CHUNK), 1)
                okl = (lane >= lo) & (lane < hi)
                sw = _splat_weights(block_t, okl, tcarry[...], t, tw,
                                    scan_upper, ones_col)
                vals_t = block_t[GEOM_COLS:GEOM_COLS + n_val, :]
                tx = t - gi * group
                g_vals = g_ref[0, tx, :, 0:n_val]  # (PIX, n_val)
                g_acc = g_ref[0, tx, :, n_val:n_val + 1]  # (PIX, 1)
                q = _dot(g_vals, vals_t) + g_acc  # (PIX, chunk)
                qw = q * sw["w"]
                s_incl = _dot(qw, scan_upper)  # (PIX, chunk)
                s_tot = _dot(qw, ones_col)  # (PIX, 1)

                @pl.when(jnp.logical_not(is_p2))
                def _():
                    stot[...] = stot[...] + s_tot

                @pl.when(is_p2)
                def _():
                    # R_i = S_tile - prefix_before - s_incl_i
                    suffix = (stot[...] - prefix[...]) - s_incl
                    keep = (sw["incl"] >= T_EPS).astype(jnp.float32)
                    dalpha = (q * sw["excl"] * keep
                              - suffix / (1.0 - sw["alpha"]))
                    gate = ((sw["power"] <= 0.0)
                            & (sw["alpha_un"] < ALPHA_MAX)
                            & (sw["alpha_un"] >= ALPHA_EPS)
                            & okl).astype(jnp.float32)
                    dpow = dalpha * gate * sw["alpha_un"]
                    dx, dy = sw["dx"], sw["dy"]
                    ca, cb, cc = sw["ca"], sw["cb"], sw["cc"]

                    def psum(x):  # pixel reduction -> (1, chunk)
                        return _dot(ones_row, x)

                    dmx = psum(dpow * -(ca * dx + cb * dy))
                    dmy = psum(dpow * -(cc * dy + cb * dx))
                    d_a = psum(dpow * (-0.5) * dx * dx)
                    d_b = psum(dpow * -(dx * dy))
                    d_c = psum(dpow * (-0.5) * dy * dy)
                    # payload row 5 is log(op):
                    # d alpha_un / d log_op = alpha_un => pix-sum of dpow
                    d_logop = psum(dpow)
                    zr = jnp.zeros((1, PAIR_CHUNK), jnp.float32)
                    dvals = jax.lax.dot_general(
                        g_vals, sw["w"], (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )  # (n_val, chunk)
                    parts = [dmx, dmy, d_a, d_b, d_c, d_logop, zr, zr,
                             dvals]
                    pad_rows = f_pad - GEOM_COLS - n_val
                    if pad_rows:
                        parts.append(
                            jnp.zeros((pad_rows, PAIR_CHUNK), jnp.float32))
                    dgrad = jnp.concatenate(parts, axis=0)
                    cs = state[1]
                    obuf[cs] = obuf[cs] + dgrad
                    prefix[...] = prefix[...] + s_tot

                tcarry[...] = sw["incl_tot"]

            return carry

        jax.lax.fori_loop(v_lo, v_hi, body, 0)

        # drain: flush the final block and wait out all in-flight DMAs
        flush_cur()
        for s in range(2):
            @pl.when(state[2 + s] >= 0)
            def _(s=s):
                odma(s, state[2 + s]).wait()


def _forward_impl(sorted_payload, layout, *, num_tiles, tw, n_val, group,
                  interpret):
    f_pad, p_cols = sorted_payload.shape
    ngroups = (layout.group_start.shape[0] - 1)
    c_out = n_val + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(ngroups,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (1, group, PIX, c_out), lambda g, *_: (g, 0, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, PAIR_CHUNK), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.VMEM((PIX, 1), jnp.float32),
        ],
    )
    kernel = functools.partial(_fwd_group_kernel, n_val=n_val, tw=tw,
                               group=group, num_tiles=num_tiles)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((ngroups, group, PIX, c_out),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(layout.group_start, layout.win, layout.meta_t, layout.lohi,
      sorted_payload)


def _build_visits(layout, num_tiles: int, nk: int):
    """Backward visit stream: each tile's windows twice (pass 1 totals,
    pass 2 gradients), then garbage visits covering the payload tail
    blocks, all grouped like the forward. Pure index arithmetic at
    S-cap size. Also computes the per-group first-block RMW flags."""
    chunk = PAIR_CHUNK
    win_start = layout.win_start  # (T_pad + 1,)
    t_pad = win_start.shape[0] - 1
    s_cap = layout.win.shape[0]
    total_win = layout.total_win
    nwin = win_start[1:] - win_start[:-1]  # (T_pad,)
    vcum = 2 * win_start[1:]  # cumulative visits (= 2 * cum windows)

    v_cap = 2 * s_cap
    vi = jnp.arange(v_cap, dtype=jnp.int32)
    vt = jnp.searchsorted(vcum, vi, side="right",
                          method="scan_unrolled").astype(jnp.int32)
    vt_c = jnp.minimum(vt, t_pad - 1)
    j = vi - 2 * win_start[vt_c]
    p2 = j >= nwin[vt_c]
    widx = win_start[vt_c] + jnp.where(p2, j - nwin[vt_c], j)

    # garbage visits: one per tail block, appended after the real ones;
    # they live at slab indices >= total_win in the window arrays
    garbage = vi >= 2 * total_win
    widx_g = total_win + (vi - 2 * total_win)
    widx = jnp.where(garbage, widx_g, widx)
    widx = jnp.clip(widx, 0, s_cap - 1)
    vwin = layout.win[widx]
    vmeta = jnp.where(garbage, num_tiles * 2, layout.meta_t[widx])
    vlohi = jnp.where(garbage, 0, layout.lohi[widx])
    vpass = jnp.where(garbage, 1, p2.astype(jnp.int32))

    blocks_total = nk // chunk + 1
    n_garbage = blocks_total - layout.covered_end
    vend = 2 * total_win + jnp.maximum(n_garbage, 0)
    vgroup_start = jnp.concatenate(
        [2 * layout.group_start[:-1], vend[None]])

    # RMW flag: group g's first gradient block equals group g-1's last
    gs = layout.group_start
    ngroups = gs.shape[0] - 1
    first_blk = layout.win[jnp.minimum(gs[:-1], s_cap - 1)]
    prev_last = layout.win[jnp.clip(gs[:-1] - 1, 0, s_cap - 1)]
    nonempty = gs[:-1] < gs[1:]
    rmw = (jnp.arange(ngroups) > 0) & nonempty & (first_blk == prev_last)
    return vgroup_start, vwin, vmeta, vlohi, vpass, rmw.astype(jnp.int32)


def _backward_impl(sorted_payload, layout, g, *, num_tiles, tw, n_val,
                   group, interpret):
    f_pad, p_cols = sorted_payload.shape
    ngroups = layout.group_start.shape[0] - 1
    c_out = n_val + 1
    nk = p_cols - PAIR_CHUNK
    vgroup_start, vwin, vmeta, vlohi, vpass, rmw = _build_visits(
        layout, num_tiles, nk)
    g4 = g.reshape(ngroups, group, PIX, c_out)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(ngroups,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),
            pl.BlockSpec((1, group, PIX, c_out),
                         lambda gi, *_: (gi, 0, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[
            pltpu.VMEM((2, f_pad, PAIR_CHUNK), jnp.float32),  # pbuf
            pltpu.SemaphoreType.DMA((2,)),  # psem
            pltpu.VMEM((2, f_pad, PAIR_CHUNK), jnp.float32),  # obuf
            pltpu.SemaphoreType.DMA((2,)),  # osem
            pltpu.VMEM((f_pad, PAIR_CHUNK), jnp.float32),  # ibuf
            pltpu.SemaphoreType.DMA(()),  # isem
            pltpu.VMEM((PIX, 1), jnp.float32),  # tcarry
            pltpu.VMEM((PIX, 1), jnp.float32),  # stot
            pltpu.VMEM((PIX, 1), jnp.float32),  # prefix
            pltpu.SMEM((8,), jnp.int32),  # state
        ],
    )
    kernel = functools.partial(_bwd_group_kernel, n_val=n_val, tw=tw,
                               group=group, num_tiles=num_tiles,
                               f_pad=f_pad)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f_pad, p_cols), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
            has_side_effects=True),
    )(vgroup_start, vwin, vmeta, vlohi, vpass, rmw, sorted_payload, g4)


class WindowLayout(NamedTuple):
    """Static-shape binning metadata shared by the kernels (all int32)."""

    win: jnp.ndarray  # (S,) payload block index per window
    meta_t: jnp.ndarray  # (S,) tile*2 + first-window-of-tile flag
    lohi: jnp.ndarray  # (S,) valid lane range, lo*256 + hi
    slab_tile: jnp.ndarray  # (S,) tile id, num_tiles = unoccupied
    win_start: jnp.ndarray  # (T_pad+1,) first window of each tile
    group_start: jnp.ndarray  # (ngroups+1,) first window of each group
    total_win: jnp.ndarray  # () number of occupied windows
    covered_end: jnp.ndarray  # () first payload block past real windows


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_composite(static_cfg, sorted_payload, layout):
    """Composite windows -> (T_pad, 256, n_val + 1) tile accumulations.

    static_cfg = (num_tiles, tw, n_val, group, interpret).
    sorted_payload is the TRANSPOSED (f_pad, N*K + chunk) pair payload.
    Differentiable in sorted_payload via the Pallas backward kernel.
    """
    num_tiles, tw, n_val, group, interpret = static_cfg
    out = _forward_impl(sorted_payload, layout, num_tiles=num_tiles,
                        tw=tw, n_val=n_val, group=group,
                        interpret=interpret)
    return out.reshape(-1, PIX, n_val + 1)


def _pc_fwd(static_cfg, sorted_payload, layout):
    out = pallas_composite(static_cfg, sorted_payload, layout)
    return out, (sorted_payload, layout)


def _pc_bwd(static_cfg, res, g):
    num_tiles, tw, n_val, group, interpret = static_cfg
    sorted_payload, layout = res
    dpay = _backward_impl(sorted_payload, layout, g, num_tiles=num_tiles,
                          tw=tw, n_val=n_val, group=group,
                          interpret=interpret)
    return dpay, None


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
    sorted_gauss, layout, overflow = build_window_layout(
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

    # The one gather, then the kernel-facing transpose: (f_pad, N*K)
    # pairs-in-lanes, plus one zero pad block (windows may extend past
    # the last pair; padding lanes are outside every [lo, hi) range).
    sorted_payload = payload[sorted_gauss].T
    sorted_payload = jnp.concatenate(
        [sorted_payload,
         jnp.zeros((f_pad, PAIR_CHUNK), sorted_payload.dtype)], axis=1)

    group = max(int(cfg.tile_group), 1)
    out = pallas_composite(
        (num_tiles, tw, n_val, group, interpret), sorted_payload, layout
    )[:num_tiles]  # (T, PIX, n_val + 1)
    out = out.transpose(0, 2, 1)  # (T, n_val + 1, PIX)

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
