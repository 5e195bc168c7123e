"""Pallas TPU compositing kernels (forward + custom-VJP backward).

TPU-native replacement for the compositing stage of the reference's
CUDA rasterizer (submodules/diff-gaussian-rasterization, contract per
SURVEY.md §2.3a; call site gaussian_renderer/__init__.py:137-155). The
projection / tile-binning stages stay in XLA (ops/projection.py,
ops/rasterize.py:build_tile_lists); these kernels replace the dense
jnp compositor (ops/rasterize.py:_composite_tiles) on the hot path.

Design — *slab grid*, not tile grid:

- Each tile's depth-sorted pair list is padded to a multiple of 128
  columns ("slabs"), with at least one slab per tile, via one
  searchsorted+gather relayout (build_slab_layout). Static capacity:
  P_pad = pair_cap + num_tiles * 128.
- The payload is a (F_pad, P_pad) f32 matrix in slab order: 8 geometry
  rows [mean2d(2), conic(3), opacity, 0, 0] then the value channels
  [rgb, (feat32), depth]. One XLA gather builds it per frame.
- Forward grid = one program per slab. Blocks are plain BlockSpecs, so
  Pallas double-buffers the payload DMA automatically. Per-tile state
  (transmittance carry) lives in VMEM scratch, persisted across the
  sequential grid; the per-tile output block accumulates in VMEM while
  consecutive slabs map to the same tile (the standard reduction-block
  pattern) and is flushed when the tile changes.
- Per slab: splat power is direct VPU math on (128, 256) blocks
  (pair-chunk x pixels); the front-to-back transmittance scan is ONE
  (128,128)x(128,256) MXU matmul of log(1-alpha) against a lower-
  triangular ones matrix; channel accumulation is one
  (n_val,128)x(128,256) MXU matmul. Early-out skips compute (not DMA)
  once every pixel in the tile saturates (T < 1e-4), matching the
  CUDA kernel's termination rule.
- Forward also emits T at each slab entry (S, 256): the residual that
  makes the backward embarrassingly slab-parallel.

Backward (custom_vjp): one reverse pass over slabs. Recomputes
alpha/T/w from the payload + saved slab-entry transmittance, carries
the suffix accumulator R_i = sum_{j>i} q_j w_j across a tile's slabs
in VMEM scratch (reverse grid order), and emits exact gradients for
mean2d / conic / opacity / values:

    dL/dv_i      = sum_p g(p) w_i(p)
    dL/dalpha_i  = q_i T_i [keep] - R_i / (1 - alpha_i)
    dL/dpower    = dL/dalpha * alpha        (gated by the clamp/cutoffs)

The screen-space mean gradient required by densification
(reference train.py:366, scene/gaussian_model.py:637-639) flows
through the mean2d rows. Gradients land on the (F_pad, P_pad) payload;
XLA autodiff transposes the payload gather into the scatter-add over
gaussians (the moral equivalent of the CUDA backward's atomics).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectedGaussians
from .rasterize import TILE, RasterConfig, _tile_grid, _tile_rects
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

PAIR_CHUNK = 128  # slab width = lane count
GEOM_ROWS = 8  # mean2d(2) + conic(3) + opacity(1) + pad(2)
PIX = TILE * TILE  # 256


def build_padded_pairs(proj: ProjectedGaussians, image_height: int,
                       image_width: int, cfg: RasterConfig):
    """Fixed-K pair expansion + pre-padded (tile, depth) sort.

    Each gaussian emits up to K = cfg.pairs_per_gaussian (tile, depth,
    gauss) pairs, row-major over its covered tile rect (CUDA getRect
    semantics); rects larger than K tiles are truncated and the dropped
    pair count reported as `overflow`. Per-tile dummy pairs (depth=inf)
    pad every tile's segment to a multiple of PAIR_CHUNK — at least one
    slab even for empty tiles — so ONE lax.sort yields the final slab
    structure directly: slab s belongs to tile sorted_tile[s*128]. No
    searchsorted / big gathers anywhere (those are 10-70ms ops on TPU
    at this size; the sort is ~10ms).

    Returns (sorted_gauss (P,), sorted_valid (P,), slab_tile (S,),
    overflow) with P = N*K + num_tiles*PAIR_CHUNK, S = P // PAIR_CHUNK.
    """
    chunk = PAIR_CHUNK
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    n = proj.mean2d.shape[0]
    K = cfg.pairs_per_gaussian

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

    ks = jnp.arange(K, dtype=jnp.int32)[None, :]  # (1, K)
    w_g = jnp.maximum(w2, 1)[:, None]
    dx = ks % w_g
    dy = ks // w_g
    tile = (y0[:, None] + dy) * tw + (x0[:, None] + dx)  # (N, K)
    pvalid = ks < count2[:, None]
    tile = jnp.where(pvalid, tile, num_tiles).astype(jnp.int32)
    depth = jnp.where(pvalid, proj.depth[:, None], jnp.inf)
    gauss = jnp.broadcast_to(
        jnp.arange(n, dtype=jnp.int32)[:, None], (n, K))

    # per-tile deficits to the next chunk multiple (>= 1 slab per tile)
    counts = jnp.zeros((num_tiles,), jnp.int32).at[tile.ravel()].add(
        pvalid.ravel().astype(jnp.int32), mode="drop")
    deficit = jnp.where(counts == 0, chunk, (-counts) % chunk)
    dk = jnp.arange(chunk, dtype=jnp.int32)[None, :]
    dvalid = dk < deficit[:, None]  # (T, chunk)
    dtile = jnp.where(
        dvalid, jnp.arange(num_tiles, dtype=jnp.int32)[:, None], num_tiles)
    ddepth = jnp.full((num_tiles, chunk), jnp.inf, depth.dtype)
    dgauss = jnp.zeros((num_tiles, chunk), jnp.int32)

    tile_all = jnp.concatenate([tile.ravel(), dtile.ravel()])
    depth_all = jnp.concatenate([depth.ravel(), ddepth.ravel()])
    gauss_all = jnp.concatenate([gauss.ravel(), dgauss.ravel()])

    sorted_tile, sorted_depth, sorted_gauss = jax.lax.sort(
        (tile_all, depth_all, gauss_all), num_keys=2)
    sorted_valid = jnp.isfinite(sorted_depth)
    slab_tile = jnp.minimum(sorted_tile[0::chunk], num_tiles - 1)
    return sorted_gauss, sorted_valid, slab_tile, overflow


def _finish_weights(power, op, t_prev, scan_lower):
    """alpha + transmittance scan from splat power (shared math)."""
    exp_pneg = jnp.exp(jnp.minimum(power, 0.0))
    alpha_un = op * exp_pneg
    alpha = jnp.minimum(alpha_un, ALPHA_MAX)
    alpha = jnp.where((power > 0.0) | (alpha < ALPHA_EPS), 0.0, alpha)
    return _transmittance(alpha, t_prev, scan_lower,
                          dict(op=op, power=power, exp_pneg=exp_pneg,
                               alpha_un=alpha_un))


def _transmittance(alpha, t_prev, scan_lower, extra):
    lg = jnp.log1p(-alpha)
    cum = jax.lax.dot_general(
        scan_lower, lg, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # inclusive prefix sums of log(1-alpha) along the chunk axis
    incl = jnp.exp(cum) * t_prev  # T after each pair
    excl = incl / (1.0 - alpha)  # T before each pair
    w = jnp.where(incl >= T_EPS, alpha * excl, 0.0)
    extra.update(alpha=alpha, incl=incl, excl=excl, w=w)
    return extra


def _splat_weights(payload, t_prev, t, tw, scan_lower):
    """Backward-path recompute: alpha, transmittances, weights, AND the
    (chunk, PIX) dx/dy blocks the gradient formulas need.

    payload: (F_pad, chunk) block; t_prev: (1, PIX) transmittance at
    slab entry.
    """
    gt = payload[0:GEOM_ROWS, :].T  # (chunk, 8)
    mx, my = gt[:, 0:1], gt[:, 1:2]
    ca, cb, cc = gt[:, 2:3], gt[:, 3:4], gt[:, 4:5]
    op = gt[:, 5:6]

    pix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = ((pix % TILE) + (t % tw) * TILE).astype(jnp.float32)
    py = ((pix // TILE) + (t // tw) * TILE).astype(jnp.float32)
    dx = mx - px  # (chunk, PIX)
    dy = my - py
    power = -0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
    sw = _finish_weights(power, op, t_prev, scan_lower)
    sw.update(dx=dx, dy=dy, ca=ca, cb=cb, cc=cc)
    return sw


# NOTE: a variant evaluating splat power as an MXU monomial-basis
# matmul ((chunk,6) x (6,PIX)) was tried and measured SLOWER on v5e
# than the direct VPU algebra — a contraction depth of 6 leaves the
# 128x128 systolic array ~95% idle while adding relayouts.


def _splat_weights_fwd(payload, t_prev, t, tw, scan_lower):
    """Forward-only variant: opacity folded into the splat power in log
    space (log on a (chunk, 1) column), saving the per-pixel opacity
    multiply and the power>0 clamps — valid payloads have PD conics
    (power <= 0) and sanitized/dummy rows have op == 0 (log -> -inf ->
    alpha 0). Bit-equivalent up to fp reassociation with
    _splat_weights."""
    gt = payload[0:GEOM_ROWS, :].T  # (chunk, 8)
    mx, my = gt[:, 0:1], gt[:, 1:2]
    ca, cb, cc = gt[:, 2:3], gt[:, 3:4], gt[:, 4:5]
    log_op = jnp.log(jnp.maximum(gt[:, 5:6], 1e-38))

    pix = jax.lax.broadcasted_iota(jnp.int32, (1, PIX), 1)
    px = ((pix % TILE) + (t % tw) * TILE).astype(jnp.float32)
    py = ((pix // TILE) + (t // tw) * TILE).astype(jnp.float32)
    dx = mx - px  # (chunk, PIX)
    dy = my - py
    power = (-0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
             + log_op)
    alpha = jnp.minimum(jnp.exp(power), ALPHA_MAX)
    alpha = jnp.where(alpha < ALPHA_EPS, 0.0, alpha)
    return _transmittance(alpha, t_prev, scan_lower, {})


def _scan_lower():
    chunk = PAIR_CHUNK
    rows = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    return (cols <= rows).astype(jnp.float32)


def _fwd_kernel(st_ref, payload_ref, out_ref, tentry_ref, t_carry,
                *, n_val: int, tw: int):
    s = pl.program_id(0)
    t = st_ref[s]
    prev_t = st_ref[jnp.maximum(s - 1, 0)]
    first = jnp.logical_or(s == 0, prev_t != t)

    @pl.when(first)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)
        t_carry[...] = jnp.ones(t_carry.shape, t_carry.dtype)

    tentry_ref[0] = t_carry[...]
    alive = jnp.max(t_carry[...]) >= T_EPS

    @pl.when(alive)
    def _():
        sw = _splat_weights_fwd(payload_ref[...], t_carry[...], t, tw,
                                _scan_lower())
        vals = payload_ref[GEOM_ROWS:GEOM_ROWS + n_val, :]  # (n_val, chunk)
        contrib = jax.lax.dot_general(
            vals, sw["w"], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_val, PIX)
        out_ref[0, 0:n_val, :] += contrib
        out_ref[0, n_val:n_val + 1, :] += jnp.sum(
            sw["w"], axis=0, keepdims=True)
        t_carry[...] = sw["incl"][-1:, :]


def _bwd_kernel(st_ref, payload_ref, g_ref, tentry_ref, dpay_ref, r_carry,
                *, n_val: int, tw: int, s_count: int, f_pad: int):
    si = pl.program_id(0)
    s = s_count - 1 - si  # reverse traversal
    t = st_ref[s]
    nxt_t = st_ref[jnp.minimum(s + 1, s_count - 1)]
    is_tile_tail = jnp.logical_or(s == s_count - 1, nxt_t != t)

    @pl.when(is_tile_tail)
    def _():
        r_carry[...] = jnp.zeros(r_carry.shape, r_carry.dtype)

    t_in = tentry_ref[0]  # (1, PIX) transmittance at slab entry
    alive = jnp.max(t_in) >= T_EPS

    @pl.when(alive)
    def _():
        chunk = PAIR_CHUNK
        scan_lower = _scan_lower()
        sw = _splat_weights(payload_ref[...], t_in, t, tw, scan_lower)
        vals = payload_ref[GEOM_ROWS:GEOM_ROWS + n_val, :]
        g_vals = g_ref[0, 0:n_val, :]  # (n_val, PIX)
        g_acc = g_ref[0, n_val:n_val + 1, :]  # (1, PIX)

        # q_i(p) = dL/dw_i(p) = g(p) . v_i + g_acc(p)
        q = jax.lax.dot_general(
            vals, g_vals, (((0,), (0,)), ((), ())),
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
                & (sw["alpha_un"] >= ALPHA_EPS)).astype(jnp.float32)
        dal = dalpha * gate
        dpow = dal * sw["alpha_un"]

        dx, dy = sw["dx"], sw["dy"]
        ca, cb, cc = sw["ca"], sw["cb"], sw["cc"]
        dmx = jnp.sum(dpow * -(ca * dx + cb * dy), axis=1, keepdims=True)
        dmy = jnp.sum(dpow * -(cc * dy + cb * dx), axis=1, keepdims=True)
        d_a = jnp.sum(dpow * (-0.5) * dx * dx, axis=1, keepdims=True)
        d_b = jnp.sum(dpow * -(dx * dy), axis=1, keepdims=True)
        d_c = jnp.sum(dpow * (-0.5) * dy * dy, axis=1, keepdims=True)
        d_op = jnp.sum(dal * sw["exp_pneg"], axis=1, keepdims=True)
        zc = jnp.zeros_like(dmx)
        dgeom = jnp.concatenate(
            [dmx, dmy, d_a, d_b, d_c, d_op, zc, zc], axis=1)  # (chunk, 8)

        dvals = jax.lax.dot_general(
            g_vals, sw["w"], (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (n_val, chunk)

        parts = [dgeom.T, dvals]
        pad_rows = f_pad - GEOM_ROWS - n_val
        if pad_rows:
            parts.append(jnp.zeros((pad_rows, chunk), jnp.float32))
        dpay_ref[...] = jnp.concatenate(parts, axis=0)
        r_carry[...] = r_carry[...] + s_tot

    @pl.when(jnp.logical_not(alive))
    def _():
        dpay_ref[...] = jnp.zeros(dpay_ref.shape, dpay_ref.dtype)


def _forward_impl(payload_t, slab_tile, *, num_tiles, tw, n_val, interpret):
    f_pad, p_pad = payload_t.shape
    s_count = p_pad // PAIR_CHUNK
    c_out = n_val + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_count,),
        in_specs=[
            pl.BlockSpec((f_pad, PAIR_CHUNK), lambda s, st: (0, s),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, c_out, PIX), lambda s, st: (st[s], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda s, st: (s, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[pltpu.VMEM((1, PIX), jnp.float32)],
    )
    kernel = functools.partial(_fwd_kernel, n_val=n_val, tw=tw)
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
    )(slab_tile, payload_t)


def _backward_impl(payload_t, slab_tile, t_entry, g, *, num_tiles, tw,
                   n_val, interpret):
    f_pad, p_pad = payload_t.shape
    s_count = p_pad // PAIR_CHUNK
    c_out = n_val + 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(s_count,),
        in_specs=[
            pl.BlockSpec((f_pad, PAIR_CHUNK),
                         lambda si, st: (0, s_count - 1 - si),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, c_out, PIX),
                         lambda si, st: (st[s_count - 1 - si], 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, PIX), lambda si, st: (s_count - 1 - si, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((f_pad, PAIR_CHUNK),
                               lambda si, st: (0, s_count - 1 - si),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((1, PIX), jnp.float32)],
    )
    kernel = functools.partial(_bwd_kernel, n_val=n_val, tw=tw,
                               s_count=s_count, f_pad=f_pad)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((f_pad, p_pad), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",)),
    )(slab_tile, payload_t, g, t_entry)


@functools.partial(jax.custom_vjp, nondiff_argnums=(0,))
def pallas_composite(static_cfg, payload_t, slab_tile):
    """Composite slabs -> (num_tiles, n_val + 1, 256) accumulations.

    static_cfg = (num_tiles, tw, n_val, interpret). Differentiable in
    payload_t via the Pallas backward kernel.
    """
    num_tiles, tw, n_val, interpret = static_cfg
    out, _ = _forward_impl(payload_t, slab_tile, num_tiles=num_tiles,
                           tw=tw, n_val=n_val, interpret=interpret)
    return out


def _pc_fwd(static_cfg, payload_t, slab_tile):
    num_tiles, tw, n_val, interpret = static_cfg
    out, t_entry = _forward_impl(payload_t, slab_tile, num_tiles=num_tiles,
                                 tw=tw, n_val=n_val, interpret=interpret)
    return out, (payload_t, slab_tile, t_entry)


def _pc_bwd(static_cfg, res, g):
    num_tiles, tw, n_val, interpret = static_cfg
    payload_t, slab_tile, t_entry = res
    dpay = _backward_impl(payload_t, slab_tile, t_entry, g,
                          num_tiles=num_tiles, tw=tw, n_val=n_val,
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
    sorted_gauss, sorted_valid, slab_tile, overflow = build_padded_pairs(
        proj, image_height, image_width, cfg)

    n = proj.mean2d.shape[0]
    # Sanitized per-gaussian payload (invalid rows zeroed: keeps garbage
    # projections from poisoning exp() and blocks their gradients).
    vmask = proj.valid
    opacity = jnp.where(vmask, proj.opacity, 0.0)
    mean2d = jnp.where(vmask[:, None], proj.mean2d, 0.0)
    conic = jnp.where(vmask[:, None], proj.conic, 0.0)
    val_cols = [proj.color]
    if extra_channels is not None:
        val_cols.append(extra_channels)
    val_cols.append(proj.depth[:, None])
    vals = jnp.concatenate(val_cols, axis=1)
    n_val = vals.shape[1]
    payload = jnp.concatenate(
        [mean2d, conic, opacity[:, None],
         jnp.zeros((n, 2), mean2d.dtype), vals], axis=1)  # (N, 8 + n_val)

    gathered = payload[sorted_gauss]  # (P_pad, F) — the one big gather
    # dummy slots must not splat: zero their opacity column
    op_col = jnp.where(sorted_valid, gathered[:, 5], 0.0)
    gathered = jnp.concatenate(
        [gathered[:, :5], op_col[:, None], gathered[:, 6:]], axis=1)

    f = payload.shape[1]
    f_pad = -(-f // 8) * 8
    payload_t = jnp.pad(gathered.T, ((0, f_pad - f), (0, 0)))

    out = pallas_composite(
        (num_tiles, tw, n_val, interpret), payload_t, slab_tile
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
