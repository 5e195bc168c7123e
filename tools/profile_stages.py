#!/usr/bin/env python
"""Per-stage frame-budget profiler for the Pallas rasterizer.

Times each pipeline stage in isolation (jitted, device-resident
inputs, queue-drain timing) at the bench.py setting — 1008x1344,
100k gaussians — for both the GAUSSIAN payload (rgb+depth) and the
FEATURE payload (rgb+32ch+depth). Prints one JSON object with
per-stage milliseconds; the table feeds BASELINE.md's frame budget
and decides which kernel lever to pull next.

Reference analogue: the CUDA stack's per-phase nvprof breakdown of
diff-gaussian-rasterization (forward preprocess / sort / render,
backward render / preprocess); the reference repo itself publishes
none (BASELINE.md), so these are our own roofline inputs.

Usage: python tools/profile_stages.py [--n 100000] [--k 6] [--iters 20]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

HEIGHT, WIDTH = 1008, 1344


def _drain(x):
    import jax.numpy as jnp

    return np.asarray(jnp.ravel(x)[:1])


def _leaf(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)[0]


def timed(fn, *args, iters=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _drain(_leaf(out))
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(_leaf(out))
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--interpret", action="store_true",
                    help="CPU smoke mode (tiny shapes, interpret kernels)")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from trase_tpu.models import gaussians as G
    from trase_tpu.models.deform import (
        deform_step, init_deform, make_deform_network,
    )
    from trase_tpu.ops import rasterize_pallas as RP
    from trase_tpu.ops.projection import compute_cov3d, project_gaussians
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import make_render_camera, render

    global HEIGHT, WIDTH
    n = args.n
    if args.interpret:
        HEIGHT, WIDTH = 64, 80
        n = min(n, 2000)

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(n, 3)) * 1.2).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    d2 = np.full(n, 0.0004, np.float32)
    cap = 1 << (n - 1).bit_length()
    params, aux = G.from_point_cloud(pts, cols, sh_degree=3,
                                     capacity=cap, dist2=d2)
    cam = make_render_camera(np.eye(3), np.zeros(3), 1.2, 0.95,
                             HEIGHT, WIDTH)
    net = make_deform_network("DeformNetwork")
    dvars = init_deform(jax.random.PRNGKey(0), net)
    cfg = RasterConfig(pairs_per_gaussian=args.k, max_per_tile=512,
                       tile_batch=64)
    interp = args.interpret
    th, tw = RP._tile_grid(HEIGHT, WIDTH)
    num_tiles = th * tw

    t_ms = {}
    it = args.iters

    # --- stage: deform MLP (bf16 inference path) ---
    fid = jnp.float32(0.5)

    @jax.jit
    def f_deform(params, dvars, fid):
        t = jnp.full((params.xyz.shape[0], 1), 0.0) + fid
        return deform_step(net, dvars, params.xyz, t, dtype=jnp.bfloat16)

    t_ms["deform_mlp"] = timed(f_deform, params, dvars, fid, iters=it)

    # --- stage: cov3d + projection (sh_degree 3) ---
    @jax.jit
    def f_project(params):
        cov3d = compute_cov3d(G.get_scaling(params),
                              G.get_rotation(params), 1.0)
        op = jnp.where(aux.alive, G.get_opacity(params)[:, 0], 0.0)
        return project_gaussians(
            params.xyz, cov3d, op, cam.buffers, HEIGHT, WIDTH,
            sh_coeffs=G.get_features(params), sh_degree=3)

    proj = f_project(params)
    t_ms["projection_sh3"] = timed(f_project, params, iters=it)

    # --- stage: binning / window layout ---
    @jax.jit
    def f_layout(proj):
        return RP.build_window_layout(proj, HEIGHT, WIDTH, cfg)

    sorted_pid, slot_of_sorted, layout, _ = f_layout(proj)
    t_ms["layout_sort_bin"] = timed(f_layout, proj, iters=it)

    feats = rng.normal(size=(cap, 32)).astype(np.float32)
    feats = jnp.asarray(feats / np.linalg.norm(feats, axis=1,
                                               keepdims=True))

    # g = rgb+depth payload, f = +32ch features, fp = features packed
    # bf16-paired (RasterConfig.pack_features)
    for phase, extra, n_packed in (("g", None, 0), ("f", feats, 0),
                                   ("fp", feats, 16)):
        payload, n_val = RP.build_payload(proj, extra)

        # --- stage: payload table build + pair gather ---
        @jax.jit
        def f_gather(proj, sorted_pid, extra=extra, n_val=n_val,
                     n_packed=n_packed):
            payload, _ = RP.build_payload(proj, extra)
            if n_packed:
                payload = RP.pack_feature_rows(payload, n_val, n_packed)
            return RP._gather_pairs(payload, sorted_pid)

        ps_t = f_gather(proj, sorted_pid)
        t_ms[f"payload_gather_{phase}"] = timed(
            f_gather, proj, sorted_pid, iters=it)

        fwd = functools.partial(RP._forward_impl, num_tiles=num_tiles,
                                tw=tw, n_val=n_val, interpret=interp,
                                n_packed=n_packed)

        # --- stage: forward kernel, inference (no residuals) ---
        f_fwd = jax.jit(lambda ps, lay: fwd(ps, lay,
                                            with_residuals=False)[0])
        t_ms[f"fwd_kernel_{phase}"] = timed(f_fwd, ps_t, layout,
                                            iters=it)

        # --- stage: forward kernel with backward residuals ---
        f_fwdr = jax.jit(lambda ps, lay: fwd(ps, lay,
                                             with_residuals=True))
        patches, logt_stop, stop = f_fwdr(ps_t, layout)
        t_ms[f"fwd_residuals_{phase}"] = timed(f_fwdr, ps_t, layout,
                                               iters=it)

        # --- stage: backward kernel (incl. slot transpose) ---
        g = jnp.ones_like(patches)

        @jax.jit
        def f_bwd(ps, lay, g, lts, stp):
            return RP._backward_impl(ps, lay, g, lts, stp,
                                     num_tiles=num_tiles, tw=tw,
                                     n_val=n_val, interpret=interp,
                                     n_packed=n_packed)

        dpay = f_bwd(ps_t, layout, g, logt_stop, stop)
        t_ms[f"bwd_kernel_{phase}"] = timed(
            f_bwd, ps_t, layout, g, logt_stop, stop, iters=it)

        # --- stage: gradient unsort (sort-inversion + K-fold) ---
        @jax.jit
        def f_unsort(dpay, sorted_pid, slot_of_sorted):
            return RP.unsort_slot_gradients(dpay, sorted_pid,
                                            slot_of_sorted, cap + 1)

        t_ms[f"grad_unsort_{phase}"] = timed(
            f_unsort, dpay, sorted_pid, slot_of_sorted, iters=it)

    # --- end-to-end frames (same jits bench.py times) ---
    backend = "pallas_interpret" if interp else None

    @jax.jit
    def e2e_fwd(params, dvars, fid):
        t = jnp.full((params.xyz.shape[0], 1), 0.0) + fid
        d_xyz, d_rot, d_scale = deform_step(net, dvars, params.xyz, t,
                                            dtype=jnp.bfloat16)
        return render(cam, params, aux.alive, jnp.zeros(3), d_xyz,
                      d_rot, d_scale, sh_degree=3, with_features=False,
                      raster_cfg=cfg, backend=backend)["render"]

    t_ms["e2e_forward"] = timed(e2e_fwd, params, dvars, fid, iters=it)

    @jax.jit
    def e2e_grad(params, fid):
        def loss(p):
            out = render(cam, p, aux.alive, jnp.zeros(3),
                         sh_degree=3, with_features=False,
                         raster_cfg=cfg, backend=backend)
            return jnp.sum(out["render"])

        return jax.grad(loss)(params)

    t_ms["e2e_fwd_bwd"] = timed(e2e_grad, params, fid,
                                iters=max(it // 2, 2))

    dev = jax.devices()[0].platform
    print(json.dumps({
        "setting": {"n": n, "k": args.k, "h": HEIGHT, "w": WIDTH,
                    "device": dev},
        "stage_ms": {k: round(v, 2) for k, v in t_ms.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
