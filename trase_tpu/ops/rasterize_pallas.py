"""Pallas TPU forward-compositing kernel for the tile-sorted rasterizer.

Replaces the dense jnp compositor (ops/rasterize.py) on the inference
path. The CUDA original (diff-gaussian-rasterization forward, contract
per SURVEY.md §2.3a) walks each 16x16 tile's depth-sorted gaussian list
front-to-back with early termination; the jnp version instead pays for
a fixed `max_per_tile` gaussians on EVERY tile. This kernel restores
occupancy-dependence:

- the per-gaussian payload is pre-gathered into depth-sorted pair order
  ONCE per frame (an XLA gather), so each tile's gaussians are
  CONTIGUOUS rows — DMA-friendly, no gathers inside the kernel;
- grid = one program per tile; the tile's row range [start, end) comes
  from a scalar-prefetched tile_start array;
- the kernel loops over CHUNK-row slabs: alpha evaluation is VPU work
  on (CHUNK, 256) blocks, the front-to-back weights come from a
  cumulative product along the chunk axis, and the weighted channel
  accumulation is one (256, CHUNK) x (CHUNK, C) MXU matmul per slab;
- a `while_loop` stops as soon as every pixel saturates (the reference
  kernel's per-pixel termination, T < 1e-4) or the list is exhausted.

The splat-power evaluation rides the MXU: the quadratic
  power(p, g) = -0.5 d^T conic d + log(opacity)
is expanded in the pixel-monomial basis [1, x, y, x^2, y^2, xy], so per
chunk it is one (PIX, 6) x (6, CHUNK) matmul instead of ~20 VPU ops per
(pixel, gaussian) pair. Coefficients are re-centered to tile-local
pixel coordinates in-kernel (x, y in [0,16)) to keep the quadratic
terms well-conditioned in f32. The power>0 degenerate-conic cull of the
reference kernel is subsumed: projection zeroes the opacity of invalid
gaussians, and valid conics are positive definite so power <= 0.

Layout: payload rows are the 6 polynomial coefficients followed by the
value channels [rgb, (feat32), depth]; the kernel emits
(num_tiles, 256, C_val + 1) with accumulated alpha in the last channel.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .projection import ProjectedGaussians
from .rasterize import TILE, RasterConfig, _tile_grid, build_tile_lists
from .rasterize_ref import ALPHA_EPS, ALPHA_MAX, T_EPS

GEOM = 6  # mean2d(2) + conic(3) + opacity(1)
PIX = TILE * TILE  # 256


def _composite_kernel(
    tile_start_ref,  # scalar-prefetch: (T+1,) int32 row offsets
    gdata_hbm,  # (F_pad, P_pad) float32 payload in HBM, sorted pair order
    out_ref,  # (1, PIX, C_out) VMEM block for this tile
    buf,  # (F_pad, CHUNK) VMEM chunk buffer
    acc_vmem,  # (PIX, C_out + 1) VMEM: value channels + alpha + T
    sem,  # DMA semaphore
    *,
    chunk: int,
    n_val: int,
    tw: int,
    max_chunks: int,
):
    t = pl.program_id(0)
    start = tile_start_ref[t]
    end = tile_start_ref[t + 1]
    # DMA slices must start at lane-tile boundaries: align the chunk
    # window down and mask columns outside [start, end). chunk is a
    # multiple of 128, so base stays provably 128-aligned.
    base = pl.multiple_of((start // chunk) * chunk, chunk)

    # tile-local pixel-monomial basis (x varies fastest in the block)
    ty = t // tw
    tx = t % tw
    ox = (tx * TILE).astype(jnp.float32)
    oy = (ty * TILE).astype(jnp.float32)
    pix_lin = jax.lax.broadcasted_iota(jnp.int32, (PIX, 1), 0)
    lx = jnp.mod(pix_lin, TILE).astype(jnp.float32)  # (PIX, 1)
    ly = (pix_lin // TILE).astype(jnp.float32)
    ones = jnp.ones_like(lx)
    basis = jnp.concatenate(
        [ones, lx, ly, lx * lx, ly * ly, lx * ly], axis=1)  # (PIX, 6)

    col_ids = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)
    acc_cols = jax.lax.broadcasted_iota(
        jnp.int32, (PIX, acc_vmem.shape[1]), 1)
    t_col = acc_vmem.shape[1] - 1

    # inclusive-scan matrix: M[j, i] = 1 iff j <= i; the front-to-back
    # transmittance scan is exp(cumsum(log1p(-alpha))) as ONE MXU matmul
    # instead of log2(chunk) cross-lane rolls
    rows_m = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 0)
    cols_m = jax.lax.broadcasted_iota(jnp.int32, (chunk, chunk), 1)
    scan_m = (rows_m <= cols_m).astype(jnp.float32)

    # acc: value channels + accumulated alpha zeroed; T column = 1
    acc_vmem[...] = jnp.where(acc_cols == t_col, 1.0, 0.0)

    log_eps = jnp.float32(jnp.log(ALPHA_EPS))

    def process(data, chunk_start):
        """Composite one (F_pad, CHUNK) slab; returns pixel-liveness."""
        acc = acc_vmem[...]
        t_prev = acc[:, t_col:t_col + 1]  # (PIX, 1)

        gcol = chunk_start + col_ids
        in_range = (gcol >= start) & (gcol < end)  # (1, CHUNK)

        # re-center global-pixel coefficients to tile-local coords
        c1, cx, cy, cxx, cyy, cxy = (data[i:i + 1, :] for i in range(6))
        l1 = (c1 + cx * ox + cy * oy + cxx * ox * ox + cyy * oy * oy
              + cxy * ox * oy)
        lx_c = cx + 2.0 * cxx * ox + cxy * oy
        ly_c = cy + 2.0 * cyy * oy + cxy * ox
        coeffs = jnp.concatenate(
            [l1, lx_c, ly_c, cxx, cyy, cxy], axis=0)  # (6, CHUNK)

        power = jax.lax.dot_general(
            basis, coeffs, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PIX, CHUNK), includes log(opacity)
        power = jnp.where(in_range, power, -jnp.inf)
        alpha = jnp.where(power < log_eps, 0.0,
                          jnp.minimum(ALPHA_MAX, jnp.exp(power)))

        lg = jnp.log1p(-alpha)  # (PIX, CHUNK), in [log(0.01), 0]
        cum = jax.lax.dot_general(
            lg, scan_m, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # inclusive cumsum of logs
        incl = jnp.exp(cum) * t_prev  # T after each column
        excl = jnp.exp(cum - lg) * t_prev  # T before each column

        # the reference stops a pixel once T would drop below 1e-4
        # (break-before-contribute); T is monotone along the list, so
        # the sticky cut is a single comparison
        w = jnp.where(incl >= T_EPS, alpha * excl, 0.0)

        vals = data[GEOM:GEOM + n_val, :]  # (C_val, CHUNK)
        contrib = jax.lax.dot_general(
            w, vals, dimension_numbers=(((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # (PIX, C_val)
        w_sum = jnp.sum(w, axis=1, keepdims=True)
        new_t = incl[:, -1:]

        upd = jnp.concatenate([contrib, w_sum, new_t - t_prev], axis=1)
        acc_vmem[...] = acc + upd
        return jnp.max(new_t) >= T_EPS

    def fetch(offset, buf_ref):
        cp = pltpu.make_async_copy(
            gdata_hbm.at[:, pl.ds(offset, chunk)], buf_ref, sem)
        cp.start()
        cp.wait()

    # first chunk (the only one for most tiles)
    fetch(base, buf)
    alive0 = jax.lax.cond(
        base < end,
        lambda: jnp.bool_(process(buf[...], base)),
        lambda: jnp.bool_(False),
    )

    # overflow chunks for tiles longer than one chunk
    def body(carry):
        ci, _ = carry
        offset = pl.multiple_of(base + ci * chunk, chunk)
        fetch(offset, buf)
        alive = process(buf[...], offset)
        more = base + (ci + 1) * chunk < end
        return ci + 1, alive & more & (ci + 1 < max_chunks)

    def cond(carry):
        return carry[1]

    more0 = base + chunk < end
    jax.lax.while_loop(cond, body, (jnp.int32(1), alive0 & more0))

    out_ref[0] = acc_vmem[:, :t_col]


def build_poly_payload(proj: ProjectedGaussians,
                       extra_channels: jnp.ndarray | None) -> jnp.ndarray:
    """(N, 6 + C_val) payload: pixel-monomial coefficients of
    power + log(opacity), then value channels."""
    opacity = jnp.where(proj.valid, proj.opacity, 0.0)
    mx, my = proj.mean2d[:, 0], proj.mean2d[:, 1]
    a, b, c = proj.conic[:, 0], proj.conic[:, 1], proj.conic[:, 2]
    log_op = jnp.log(jnp.maximum(opacity, 1e-12))
    c1 = -0.5 * (a * mx * mx + c * my * my) - b * mx * my + log_op
    cx = a * mx + b * my
    cy = c * my + b * mx
    cxx = -0.5 * a
    cyy = -0.5 * c
    cxy = -b
    chans = [jnp.stack([c1, cx, cy, cxx, cyy, cxy], axis=1), proj.color]
    if extra_channels is not None:
        chans.append(extra_channels)
    chans.append(proj.depth[:, None])
    return jnp.concatenate(chans, axis=1)


def composite_tiles_pallas(
    sorted_gdata: jnp.ndarray,  # (F_pad, P_pad) payload, sorted pair order
    tile_start: jnp.ndarray,  # (T+1,) int32
    num_tiles: int,
    tw: int,
    n_val: int,
    chunk: int = 256,
    max_chunks: int = 64,
    interpret: bool = False,
):
    """Run the per-tile compositor. Returns (T, 256, C_val + 1).

    sorted_gdata's leading (channel) dim must be a multiple of 8
    (f32 sublane tile) so DMA slices stay aligned; `n_val` counts the
    real value channels before padding.
    """
    f = sorted_gdata.shape[0]
    assert f % 8 == 0, f
    c_out = n_val + 1

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(num_tiles,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
        out_specs=pl.BlockSpec(
            (1, PIX, c_out), lambda t, *_: (t, 0, 0),
            memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((f, chunk), jnp.float32),
            pltpu.VMEM((PIX, c_out + 1), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
    )
    kernel = functools.partial(
        _composite_kernel, chunk=chunk, n_val=n_val, tw=tw,
        max_chunks=max_chunks,
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((num_tiles, PIX, c_out),
                                       jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(tile_start, sorted_gdata)


def rasterize_tiled_pallas(
    proj: ProjectedGaussians,
    extra_channels: jnp.ndarray | None,
    bg_color: jnp.ndarray,
    image_height: int,
    image_width: int,
    cfg: RasterConfig = RasterConfig(),
    chunk: int = 128,
    max_chunks: int = 128,
    interpret: bool = False,
):
    """Drop-in replacement for rasterize_tiled (forward only)."""
    th, tw = _tile_grid(image_height, image_width)
    num_tiles = th * tw
    sorted_gauss, tile_start, overflow = build_tile_lists(
        proj, image_height, image_width, cfg)

    gdata = build_poly_payload(proj, extra_channels)  # (N, F)

    # one gather puts every tile's gaussians in contiguous columns of a
    # transposed (F, P) payload — lane-aligned chunk slices for DMA;
    # channel dim padded to a multiple of 8 for sublane alignment
    n_val = gdata.shape[1] - GEOM
    f_pad = -(-gdata.shape[1] // 8) * 8
    sorted_gdata = gdata[sorted_gauss].T
    sorted_gdata = jnp.pad(
        sorted_gdata,
        ((0, f_pad - gdata.shape[1]), (0, chunk)),
    )

    out = composite_tiles_pallas(
        sorted_gdata, tile_start, num_tiles, tw, n_val,
        chunk=chunk, max_chunks=max_chunks, interpret=interpret,
    )  # (T, 256, C_val + 1)
    acc = out[:, :, n_val]
    vals = out[:, :, :n_val]

    # (T, 256, C) -> (C, H, W)
    vals = vals.reshape(th, tw, TILE, TILE, n_val)
    img = vals.transpose(4, 0, 2, 1, 3).reshape(
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
