#!/usr/bin/env python
"""Window-level bisect of a Pallas backward explosion.

Replays a dumped step (tools/probe_nan.py --dump) through the Pallas
compositor ONLY, captures the kernel's per-slot gradients before the
unsort, finds the windows whose gradients blow up, and replicates those
windows' backward math in numpy (f32 and f64) from the exact same
inputs — separating precision loss from logic error.

    python tools/probe_bwd_window.py --dump /tmp/probe_nan_state.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def np_window_bwd(block, gpatch, logt_stop_px, rcarry, n_val, tile_xy,
                  cnt, dtype):
    """Numpy replica of one window of _bwd_group_kernel.process.

    block: (f_pad, 128) payload window (pair-major transposed);
    gpatch: (256, 1 + n_val) cotangent; logt_stop_px: (256,) log T at
    the NEXT (later) window's start (i.e. this window's end);
    rcarry: (256,) suffix carry from later windows.
    Returns (dblock rows dict, new logt (window start), new rcarry,
    internals dict).
    """
    from trase_tpu.ops.rasterize_pallas import (
        LOG_ALPHA_EPS, LOG_ALPHA_MAX, GEOM_COLS)
    from trase_tpu.ops.rasterize_ref import T_EPS

    f = dtype
    block = block.astype(f)
    gpatch = gpatch.astype(f)
    logt_end = logt_stop_px.astype(f)
    rcarry = rcarry.astype(f)
    tx0, ty0 = tile_xy
    mxl = block[0] - tx0  # (128,)
    myl = block[1] - ty0
    ca, cb, cc = block[2], block[3], block[4]
    log_op = block[5]
    pix = np.arange(256)
    xl = (pix % 16).astype(f)[:, None]
    yl = (pix // 16).astype(f)[:, None]
    dx = mxl[None, :] - xl  # (256,128)
    dy = myl[None, :] - yl
    raw = (-0.5 * (ca * dx * dx + cc * dy * dy) - cb * dx * dy
           + log_op)
    lane_ok = np.arange(128) < cnt
    alpha_log = np.minimum(raw, f(LOG_ALPHA_MAX))
    ok = (raw >= f(LOG_ALPHA_EPS)) & lane_ok[None, :]
    alpha = np.where(ok, np.exp(alpha_log), f(0))
    lg = np.log1p(-alpha)
    cum = np.cumsum(lg, axis=1)  # inclusive
    tot = cum[:, -1:]
    t_start_log = logt_end[:, None] - tot
    excl_lin = np.exp(t_start_log + (cum - lg))
    incl_lin = np.exp(t_start_log + cum)
    keep = (incl_lin >= f(T_EPS)).astype(f)
    wgt = np.where(ok, alpha * excl_lin, f(0)) * keep
    vals_ext = np.concatenate(
        [block[6:7], block[GEOM_COLS:GEOM_COLS + n_val]], axis=0)
    q = gpatch @ vals_ext  # (256, 128)
    qw = q * wgt
    s_incl = np.cumsum(qw, axis=1)
    s_tot = s_incl[:, -1:]
    suffix = (rcarry[:, None] + s_tot) - s_incl
    dalpha = q * excl_lin * keep - suffix / (1.0 - alpha)
    gate = (ok & (raw < f(LOG_ALPHA_MAX))).astype(f)
    dpow = dalpha * gate * alpha
    one = np.ones((1, 256), f)
    basis = np.concatenate([one, xl.T, yl.T, (xl * xl).T, (xl * yl).T,
                            (yl * yl).T], axis=0)
    dcoeff = basis @ dpow  # (6, 128)
    g1, gx, gy, gx2, gxy, gy2 = dcoeff
    c_x = ca * mxl + cb * myl
    c_y = cc * myl + cb * mxl
    dmx = -g1 * c_x + gx * ca + gy * cb
    dmy = -g1 * c_y + gx * cb + gy * cc
    d_ca = -0.5 * g1 * mxl * mxl + gx * mxl - 0.5 * gx2
    d_cb = -g1 * mxl * myl + gx * myl + gy * mxl - gxy
    d_cc = -0.5 * g1 * myl * myl + gy * myl - 0.5 * gy2
    internals = dict(
        raw=raw, alpha=alpha, tot=tot, t_start_log=t_start_log,
        excl_lin=excl_lin, incl_lin=incl_lin, wgt=wgt, q=q,
        suffix=suffix, dalpha=dalpha, dpow=dpow, dcoeff=dcoeff,
    )
    grads = dict(dmx=dmx, dmy=dmy, d_ca=d_ca, d_cb=d_cb, d_cc=d_cc,
                 d_logop=g1)
    return grads, t_start_log[:, 0], rcarry + s_tot[:, 0], internals


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default="/tmp/probe_nan_state.npz")
    ap.add_argument("--pairs_per_gaussian", type=int, default=32)
    ap.add_argument("--max_per_tile", type=int, default=1024)
    ap.add_argument("--thresh", type=float, default=1e6)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from trase_tpu.engine import trainer as T
    from trase_tpu.losses.image_losses import l1_loss
    from trase_tpu.models.deform import make_deform_network
    from trase_tpu.models.gaussians import GaussianParams
    from trase_tpu.ops import rasterize_pallas as RP
    from trase_tpu.ops.projection import (
        CameraBuffers, compute_cov3d, project_gaussians)
    from trase_tpu.ops.rasterize import RasterConfig, _tile_grid
    from trase_tpu.ops.ssim import ssim
    from trase_tpu.renderer import apply_deformation

    z = np.load(args.dump)
    n = z["xyz"].shape[0]
    p = GaussianParams(
        xyz=jnp.asarray(z["xyz"]),
        features_dc=jnp.asarray(z["features_dc"]),
        features_rest=jnp.asarray(z["features_rest"]),
        scaling=jnp.asarray(z["scaling"]),
        rotation=jnp.asarray(z["rotation"]),
        opacity=jnp.asarray(z["opacity"]),
        gaussian_features=jnp.asarray(z["gaussian_features"]),
        cluster_id=jnp.zeros((n, 1), jnp.float32),
    )
    alive = jnp.asarray(z["alive"])
    H, W = int(z["image_height"]), int(z["image_width"])
    buffers = CameraBuffers(
        world_view=jnp.asarray(z["world_view"]),
        full_proj=jnp.asarray(z["full_proj"]),
        campos=jnp.asarray(z["campos"]),
        tanfovx=jnp.asarray(z["tanfovx"]),
        tanfovy=jnp.asarray(z["tanfovy"]),
    )
    deform_vars = {"params": {}}
    for k in z.files:
        if k.startswith("deform__"):
            path = k[len("deform__"):]
            layer = path.split("'")[3]
            leaf = path.split("'")[5]
            deform_vars["params"].setdefault(layer, {})[leaf] = (
                jnp.asarray(z[k]))
    deform_net = make_deform_network("DeformNetwork", is_blender=True)
    fid = jnp.float32(float(z["fid"]))
    ast = jnp.float32(float(z["ast"]))
    cfg = RasterConfig(pairs_per_gaussian=args.pairs_per_gaussian,
                       max_per_tile=args.max_per_tile)

    # projection (stop-grad: we bisect the compositor only)
    d_xyz, d_rot, d_scale = T._apply_deform(
        deform_net, deform_vars, p.xyz, fid, ast, True, True,
        gaussian_features=p.gaussian_features)
    means3d, scales, rots = apply_deformation(p, d_xyz, d_rot, d_scale,
                                              False)
    cov3d = compute_cov3d(scales, rots)
    opa = jnp.where(alive, jax.nn.sigmoid(p.opacity[:, 0]), 0.0)
    sh = jnp.concatenate([p.features_dc, p.features_rest], axis=1)
    proj = project_gaussians(means3d, cov3d, opa, buffers, H, W,
                             sh_coeffs=sh, sh_degree=3)

    th, tw = _tile_grid(H, W)
    num_tiles = th * tw
    sorted_pid, slot_of_sorted, layout, overflow = (
        RP.build_window_layout(proj, H, W, cfg))
    payload, n_val = RP.build_payload(proj, None)
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)
    static_cfg = (num_tiles, tw, n_val, False, None, 0)

    def assemble_loss(patches):
        gxt = patches.shape[2] * 16
        hwc = patches.reshape(th * 16, gxt, n_val + 1)[:H, :W]
        acc = hwc[..., 0]
        rgb = hwc[..., 1:4] + (1.0 - acc)[..., None] * bg[None, None, :]
        image = rgb.transpose(2, 0, 1)
        return 0.8 * l1_loss(image, gt) + 0.2 * (1 - ssim(image, gt))

    # forward w/ residuals + cotangent patches
    fwd = jax.jit(lambda ps: RP._forward_impl(
        ps, layout, num_tiles=num_tiles, tw=tw, n_val=n_val,
        interpret=False))
    ps_t = jax.jit(RP._gather_pairs)(payload, sorted_pid)
    patches, logt_stop, stop = fwd(ps_t)
    loss, gpatches = jax.jit(jax.value_and_grad(assemble_loss))(patches)
    print(f"loss={float(loss):.6f} overflow={float(overflow[0]):.1f}")

    dpay = jax.jit(lambda *a: RP._backward_impl(
        *a, num_tiles=num_tiles, tw=tw, n_val=n_val, interpret=False))(
            ps_t, layout, gpatches, logt_stop, stop)
    dpay_np = np.asarray(dpay)  # (slot_cap, f_pad)
    mag = np.abs(dpay_np).max(axis=1)
    w_mag = mag.reshape(-1, 128).max(axis=1)  # per window
    bad_windows = np.where(w_mag > args.thresh)[0]
    print(f"slot-grad max={mag.max():.3e}; windows>thresh: "
          f"{len(bad_windows)} of {len(w_mag)}")

    meta_t = np.asarray(layout.meta_t)
    gs = np.asarray(layout.group_start)
    gx_, gxn = RP.group_geometry(tw)
    logt_np = np.asarray(logt_stop)  # (ngroups, TILE, 256, 1)
    stop_np = np.asarray(stop)[:, :, 0, 0].astype(np.int64)
    ps_np = np.asarray(ps_t)  # (f_pad, pairs + SPAN)
    g_np = np.asarray(gpatches)

    # replicate the FULL reverse walk of each bad window's tile
    for w in bad_windows[:6]:
        gi = int(np.searchsorted(gs, w, side="right") - 1)
        mt = int(meta_t[w])
        t = mt >> 9
        tile_lo = (gi // gxn) * tw + (gi % gxn) * gx_
        tx = t - tile_lo
        stop_w = int(stop_np[gi, tx])
        print(f"\nwindow {w}: group {gi} tile {t} (tx {tx}) "
              f"cnt={mt & 255} first={(mt >> 8) & 1} stop={stop_w} "
              f"kernel max|d|={w_mag[w]:.3e}")
        # walk this tile's windows in reverse from stop-1 down to w
        tile_ws = [wi for wi in range(gs[gi], gs[gi + 1])
                   if (int(meta_t[wi]) >> 9) == t and wi < stop_w]
        r, gx = gi // gxn, gi % gxn
        gpatch = g_np[r, :, gx * gx_ + tx, :, :].reshape(
            256, 1 + n_val)
        woff = np.asarray(layout.win_off)
        for dtype in (np.float32, np.float64):
            logt_px = logt_np[gi, tx, :, 0].copy()
            rcarry = np.zeros(256, dtype)
            for wi in reversed(tile_ws):
                base = woff[wi]
                block = ps_np[:, base:base + 128]
                cntw = int(meta_t[wi]) & 255
                grads, logt_px, rcarry, intern = np_window_bwd(
                    block, gpatch, logt_px, rcarry, n_val,
                    ((t % tw) * 16, (t // tw) * 16), cntw, dtype)
                if wi == w:
                    gmax = {k: float(np.abs(v).max())
                            for k, v in grads.items()}
                    print(f"  [{np.dtype(dtype).name}] grads "
                          + " ".join(f"{k}={v:.3e}"
                                     for k, v in gmax.items()))
                    for k in ("t_start_log", "excl_lin", "suffix",
                              "dalpha", "alpha", "tot"):
                        v = intern[k]
                        print(f"    {k}: min={v.min():.4e} "
                              f"max={v.max():.4e}")
                    break


if __name__ == "__main__":
    main()
