#!/usr/bin/env python
"""Benchmark: steady-state render throughput of the flagship pipeline.

Prints ONE JSON line {"metric", "value", "unit", "vs_baseline"}.

Measures jitted end-to-end frame time (deform MLP + projection + tile
binning + alpha compositing of RGB+depth) at 1K-class resolution with a
production-scale gaussian count, on whatever device JAX provides (the
driver supplies the real TPU). ``vs_baseline`` is the ratio against the
reference CUDA stack's ballpark at the same setting (single consumer
GPU, diff-gaussian-rasterization forward ~10 ms/frame at 1K for ~10^5
gaussians => 100 FPS) — the reference repo publishes no numbers
(BASELINE.md), so this anchor is an external estimate, held fixed
across rounds for comparability.
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
ITERS = 20


def main():
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
    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=512,
                       tile_batch=64)
    alive = aux.alive
    bg = jnp.zeros(3)

    @jax.jit
    def frame(params, dvars, fid):
        t = jnp.full((params.xyz.shape[0], 1), 0.0) + fid
        d_xyz, d_rot, d_scale = deform_step(net, dvars, params.xyz, t)
        return render(cam, params, alive, bg, d_xyz, d_rot, d_scale,
                      sh_degree=3, with_features=False,
                      raster_cfg=cfg)["render"]

    fid = jnp.float32(0.5)
    for _ in range(WARMUP):
        frame(params, dvars, fid).block_until_ready()
    t0 = time.perf_counter()
    for _ in range(ITERS):
        frame(params, dvars, fid).block_until_ready()
    dt = (time.perf_counter() - t0) / ITERS
    fps = 1.0 / dt

    print(json.dumps({
        "metric": "render_fps_1k_100k_gaussians",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / REFERENCE_FPS_ANCHOR, 3),
    }))


if __name__ == "__main__":
    main()
