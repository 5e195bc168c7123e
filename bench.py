#!/usr/bin/env python
"""Benchmark: steady-state throughput of the flagship pipeline.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline", ...}.

Primary metric: jitted end-to-end frame time (deform MLP + projection +
tile binning + Pallas alpha compositing of RGB+depth) at 1K-class
resolution with a production-scale gaussian count. ``vs_baseline`` is
the ratio against the reference CUDA stack's ballpark at the same
setting (single consumer GPU, diff-gaussian-rasterization forward
~10 ms/frame at 1K for ~10^5 gaussians => 100 FPS) — the reference
repo publishes no numbers (BASELINE.md), so this anchor is an external
estimate, held fixed across rounds for comparability.

Extra fields: GAUSSIAN-phase and FEATURE-phase train step rates
(iters/sec, full forward+backward+Adam, 32-ch feature compositing
included in the FEATURE phase) — the reference's iter_time metric
(train.py:140-141,303,340).

Timing note: the TPU tunnel used by the driver does not synchronize on
block_until_ready; every measurement fetches a small host value to
force a real drain of the device queue.
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import numpy as np

REFERENCE_FPS_ANCHOR = 100.0  # CUDA 3DGS fwd @1K, ~100k gaussians

N_GAUSSIANS = 100_000
HEIGHT, WIDTH = 1008, 1344  # Neu3D-class 1K resolution (multiple of 16)
WARMUP = 3
ITERS = 30


def _time(fn, *args, iters=ITERS):
    import jax.numpy as jnp

    out = None
    for _ in range(WARMUP):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(_leaf(out))[:1])  # drain
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(_leaf(out))[:1])  # force real completion
    return (time.perf_counter() - t0) / iters


def _leaf(tree):
    import jax

    return jax.tree_util.tree_leaves(tree)[0]


def main(argv=None):
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--alpha_cull", action="store_true",
                    help="A/B: pair-level max-alpha tile cull")
    ap.add_argument("--pack_features",
                    action=argparse.BooleanOptionalAction, default=True,
                    help="bf16-paired feature payload (default on "
                         "since the r5 A/B; --no-pack_features for "
                         "the unpacked A/B arm)")
    ap.add_argument("--pairs_per_gaussian", type=int, default=6)
    ap.add_argument("--densify_stats",
                    action=argparse.BooleanOptionalAction, default=False,
                    help="A/B: accumulate densification stats in the "
                         "FEATURE step. Default off — the FEATURE "
                         "stage runs after densify_until_iter in the "
                         "reference schedule (train.py:362), which "
                         "enables the values-only backward")
    args = ap.parse_args(argv)

    # Watchdog: the axon TPU tunnel can wedge for hours (device calls
    # block silently with no error). Bound the whole bench so a wedged
    # tunnel yields an honest error record instead of a driver hang.
    import signal

    def _deadline(signum, frame):
        print(json.dumps({
            "metric": "render_fps_1k_100k_gaussians", "value": None,
            "unit": "frames/sec", "vs_baseline": None,
            "error": "device unreachable: bench exceeded 30 min "
                     "(axon tunnel wedged?)"}))
        os._exit(1)

    signal.signal(signal.SIGALRM, _deadline)
    signal.alarm(1800)

    import jax
    import jax.numpy as jnp

    from trase_tpu.models import gaussians as G
    from trase_tpu.models.deform import (
        deform_step, init_deform, make_deform_network,
    )
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import make_render_camera, render

    rng = np.random.default_rng(0)
    n = N_GAUSSIANS
    pts = (rng.normal(size=(n, 3)) * 1.2).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(size=(n, 3)).astype(np.float32)
    d2 = np.full(n, 0.0004, np.float32)
    params, aux = G.from_point_cloud(pts, cols, sh_degree=3,
                                     capacity=131072, dist2=d2)

    cam = make_render_camera(np.eye(3), np.zeros(3), 1.2, 0.95,
                             HEIGHT, WIDTH)
    net = make_deform_network("DeformNetwork")
    dvars = init_deform(jax.random.PRNGKey(0), net)
    # K=6: at this scene's splat statistics the pair-budget truncation
    # is identical to K=8 (overflow differs <0.1% — both drop only the
    # far tiles of a handful of near-camera outliers), so the smaller
    # sort/gather/layout is free speed. Scene-dependent knob.
    cfg = RasterConfig(pairs_per_gaussian=args.pairs_per_gaussian,
                       max_per_tile=512, tile_batch=64,
                       alpha_cull=args.alpha_cull,
                       pack_features=args.pack_features)
    alive = aux.alive
    bg = jnp.zeros(3)

    @jax.jit
    def frame(params, dvars, fid):
        t = jnp.full((params.xyz.shape[0], 1), 0.0) + fid
        # inference path: bf16 hidden stack (params/outputs stay f32)
        d_xyz, d_rot, d_scale = deform_step(net, dvars, params.xyz, t,
                                            dtype=jnp.bfloat16)
        return render(cam, params, alive, bg, d_xyz, d_rot, d_scale,
                      sh_degree=3, with_features=False,
                      raster_cfg=cfg)["render"]

    fid = jnp.float32(0.5)
    dt = _time(frame, params, dvars, fid)
    fps = 1.0 / dt

    # --- train-step rates (reference iter_time analogue) ---
    # Fault-isolated: the backward kernel exercises Mosaic paths the
    # CPU interpret tests cannot — if it fails to compile on the real
    # chip, still report the forward FPS with an error note instead of
    # losing the whole bench record.
    from trase_tpu.engine import trainer as T

    state = T.init_train_state(params, aux, dvars)
    lrs = T.LearningRates(*[jnp.float32(1e-4)] * 8)
    gt = jnp.zeros((3, HEIGHT, WIDTH))

    def gstep(state):
        new_state, _ = T.gaussian_phase_step(
            state, cam.buffers, gt, fid, jnp.float32(0.0), lrs, bg,
            deform_net=net, image_height=HEIGHT, image_width=WIDTH,
            sh_degree=3, use_deform=True, is_6dof=False,
            lambda_dssim=0.2, lambda_reg_deform=0.0, raster_cfg=cfg,
        )
        return new_state

    errors = {}

    try:
        dt_g = _time(gstep, state, iters=10)
    except Exception as e:  # noqa: BLE001 — keep the fwd FPS record
        dt_g = None
        errors["train_gaussian"] = f"{type(e).__name__}: {e}"[:300]

    # FEATURE phase: 8 SAM masks at half res, 32-ch feature compositing
    hm, wm = HEIGHT // 2, WIDTH // 2
    masks = jnp.zeros((8, hm, wm), jnp.float32).at[:, ::2, ::2].set(1.0)
    mask_valid = jnp.ones((8,), bool)
    smooth_map = jnp.zeros((params.xyz.shape[0], 1), jnp.int32)

    def fstep(state):
        new_state, _ = T.feature_phase_step(
            state, cam.buffers, masks, mask_valid, fid,
            jax.random.PRNGKey(1), lrs, bg, smooth_map,
            deform_net=net, image_height=HEIGHT, image_width=WIDTH,
            sh_degree=3, use_deform=True, is_6dof=False,
            contrastive_mode="soft", rfn=1.0, positive_th=0.75,
            negative_th=0.5, num_sampled_pixels=4096,
            num_sampled_masks=8, use_smoothing=False,
            smooth_dropout=0.5, mask_hw=(hm, wm), raster_cfg=cfg,
            with_densify_stats=args.densify_stats,
        )
        return new_state

    try:
        dt_f = _time(fstep, state, iters=10)
    except Exception as e:  # noqa: BLE001 — keep the fwd FPS record
        dt_f = None
        errors["train_feature"] = f"{type(e).__name__}: {e}"[:300]

    record = {
        "metric": "render_fps_1k_100k_gaussians",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_FPS_ANCHOR, 3),
        "train_gaussian_iters_per_sec":
            round(1.0 / dt_g, 2) if dt_g else None,
        "train_feature_iters_per_sec":
            round(1.0 / dt_f, 2) if dt_f else None,
    }
    if errors:
        record["errors"] = errors
    print(json.dumps(record))


if __name__ == "__main__":
    main()
