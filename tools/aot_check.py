#!/usr/bin/env python
"""AOT compile-check of every TPU kernel the bench/training path jits.

The CPU test suite runs the Pallas kernels in interpret mode, which
cannot catch Mosaic (TPU kernel compiler) rejections — e.g. layout-
unsupported shape casts that only surface when the real backend
lowers the kernel. This tool `.lower().compile()`s each stage at the
bench.py setting WITHOUT executing anything, so a single broken kernel
is pinpointed with its Mosaic error in minutes (the axon tunnel's
chipless compile helper serves AOT compiles even when device execution
is busy).

Run it whenever the kernels change, before bench.py / validate_scale:

    python tools/aot_check.py            # bench shapes (1008x1344, 100k)
    python tools/aot_check.py --small    # fast shapes for smoke
    python tools/aot_check.py --run      # also execute one iteration

Prints one JSON object {stage: "ok" | "FAIL: ..."} and exits non-zero
if any stage fails to compile.
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--small", action="store_true",
                    help="tiny shapes (fast smoke of the compile path)")
    ap.add_argument("--run", action="store_true",
                    help="also execute + drain each compiled stage once")
    args = ap.parse_args()

    import functools

    import jax
    import jax.numpy as jnp

    from trase_tpu.engine import trainer as T
    from trase_tpu.models import gaussians as G
    from trase_tpu.models.deform import (
        deform_step, init_deform, make_deform_network,
    )
    from trase_tpu.ops import rasterize_pallas as RP
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import make_render_camera, render

    if args.small:
        height, width, n = 128, 160, 4096
    else:
        height, width, n = 1008, 1344, args.n

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(n, 3)) * 1.2).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    d2 = np.full(n, 0.0004, np.float32)
    cap = 1 << (n - 1).bit_length()
    params, aux = G.from_point_cloud(pts, cols, sh_degree=3,
                                     capacity=cap, dist2=d2)
    cam = make_render_camera(np.eye(3), np.zeros(3), 1.2, 0.95,
                             height, width)
    net = make_deform_network("DeformNetwork")
    dvars = init_deform(jax.random.PRNGKey(0), net)
    cfg = RasterConfig(pairs_per_gaussian=args.k, max_per_tile=512,
                       tile_batch=64)
    alive = aux.alive
    bg = jnp.zeros(3)
    fid = jnp.float32(0.5)

    results: dict[str, str] = {}
    failed = False

    def check(name, fn, *xs):
        nonlocal failed
        t0 = time.perf_counter()
        try:
            compiled = jax.jit(fn).lower(*xs).compile()
            results[name] = f"ok ({time.perf_counter() - t0:.1f}s)"
            if args.run:
                out = compiled(*xs)
                np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
                results[name] += " +run"
        except Exception as e:  # noqa: BLE001 — report and continue
            failed = True
            msg = f"{type(e).__name__}: {e}"
            results[name] = "FAIL: " + " ".join(msg.split())[:500]
        print(f"[aot_check] {name}: {results[name]}", file=sys.stderr)

    # --- the exact jit bench.py times as the FPS metric ---
    def frame(params, dvars, fid):
        t = jnp.full((params.xyz.shape[0], 1), 0.0) + fid
        d_xyz, d_rot, d_scale = deform_step(net, dvars, params.xyz, t,
                                            dtype=jnp.bfloat16)
        return render(cam, params, alive, bg, d_xyz, d_rot, d_scale,
                      sh_degree=3, with_features=False,
                      raster_cfg=cfg)["render"]

    check("e2e_frame", frame, params, dvars, fid)

    # --- feature-phase forward (32-ch payload, packed + unpacked) ---
    def frame_feat(params, dvars, fid, pack):
        c = cfg._replace(pack_features=True) if pack else cfg
        t = jnp.full((params.xyz.shape[0], 1), 0.0) + fid
        d_xyz, d_rot, d_scale = deform_step(net, dvars, params.xyz, t,
                                            dtype=jnp.bfloat16)
        return render(cam, params, alive, bg, d_xyz, d_rot, d_scale,
                      sh_degree=3, with_features=True,
                      raster_cfg=c)["render_gaussian_features"]

    check("e2e_frame_features",
          functools.partial(frame_feat, pack=False), params, dvars, fid)
    check("e2e_frame_features_packed",
          functools.partial(frame_feat, pack=True), params, dvars, fid)

    # --- full train steps (fwd + Pallas bwd + Adam), both phases ---
    state = T.init_train_state(params, aux, dvars)
    lrs = T.LearningRates(*[jnp.float32(1e-4)] * 8)
    gt = jnp.zeros((3, height, width))

    def gstep(state):
        new_state, _ = T.gaussian_phase_step(
            state, cam.buffers, gt, fid, jnp.float32(0.0), lrs, bg,
            deform_net=net, image_height=height, image_width=width,
            sh_degree=3, use_deform=True, is_6dof=False,
            lambda_dssim=0.2, lambda_reg_deform=0.0, raster_cfg=cfg)
        return new_state

    check("train_gaussian_step", gstep, state)

    hm, wm = height // 2, width // 2
    masks = jnp.zeros((8, hm, wm), jnp.float32).at[:, ::2, ::2].set(1.0)
    mask_valid = jnp.ones((8,), bool)
    smooth_map = jnp.zeros((params.xyz.shape[0], 1), jnp.int32)

    def fstep(state):
        new_state, _ = T.feature_phase_step(
            state, cam.buffers, masks, mask_valid, fid,
            jax.random.PRNGKey(1), lrs, bg, smooth_map,
            deform_net=net, image_height=height, image_width=width,
            sh_degree=3, use_deform=True, is_6dof=False,
            contrastive_mode="soft", rfn=1.0, positive_th=0.75,
            negative_th=0.5, num_sampled_pixels=4096,
            num_sampled_masks=8, use_smoothing=False,
            smooth_dropout=0.5, mask_hw=(hm, wm), raster_cfg=cfg)
        return new_state

    check("train_feature_step", fstep, state)

    print(json.dumps(results, indent=2))
    sys.exit(1 if failed else 0)


if __name__ == "__main__":
    main()
