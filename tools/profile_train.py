#!/usr/bin/env python
"""Component profile of the GAUSSIAN train step at the bench setting.

Times (with queue-drain semantics) each piece of gaussian_phase_step
in isolation to locate the iteration-time budget. Dev tool.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from trase_tpu.models import gaussians as G
from trase_tpu.models.deform import deform_step, init_deform, make_deform_network
from trase_tpu.ops.rasterize import RasterConfig
from trase_tpu.ops.ssim import ssim
from trase_tpu.losses.image_losses import l1_loss
from trase_tpu.renderer import make_render_camera, render
from trase_tpu.engine import trainer as T

N = 100_000
H, W = 1008, 1344
K = 6


def timeit(fn, *args, iters=15, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N, 3)) * 1.2).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(size=(N, 3)).astype(np.float32)
    d2 = np.full(N, 0.0004, np.float32)
    params, aux = G.from_point_cloud(pts, cols, sh_degree=3,
                                     capacity=131072, dist2=d2)
    cam = make_render_camera(np.eye(3), np.zeros(3), 1.2, 0.95, H, W)
    net = make_deform_network("DeformNetwork")
    dvars = init_deform(jax.random.PRNGKey(0), net)
    cfg = RasterConfig(pairs_per_gaussian=K, max_per_tile=512,
                       tile_batch=64)
    bg = jnp.zeros(3)
    fid = jnp.float32(0.5)
    gt = jnp.zeros((3, H, W))

    # deform MLP, training path (f32 flax), fwd
    @jax.jit
    def deform_fwd(dvars, xyz):
        t = jnp.full((xyz.shape[0], 1), 0.0) + fid
        return deform_step(net, dvars, xyz, t)

    print(f"deform fwd (f32): {timeit(deform_fwd, dvars, params.xyz):.2f} ms")

    @jax.jit
    def deform_fwdbwd(dvars, xyz):
        def f(dv):
            t = jnp.full((xyz.shape[0], 1), 0.0) + fid
            a, b, c = deform_step(net, dv, xyz, t)
            return jnp.sum(a) + jnp.sum(b) + jnp.sum(c)
        return jax.grad(f)(dvars)

    print(f"deform fwd+bwd: {timeit(deform_fwdbwd, dvars, params.xyz):.2f} ms")

    # render fwd only
    @jax.jit
    def render_fwd(params):
        d_xyz, d_rot, d_scale = deform_fwd.__wrapped__(dvars, params.xyz)
        return render(cam, params, aux.alive, bg, d_xyz, d_rot, d_scale,
                      sh_degree=3, with_features=False, raster_cfg=cfg)["render"]

    print(f"frame fwd (deform+render): {timeit(render_fwd, params):.2f} ms")

    # render fwd+bwd (L1 only, no ssim)
    @jax.jit
    def render_fwdbwd(params):
        def f(p):
            d_xyz, d_rot, d_scale = deform_fwd.__wrapped__(dvars, p.xyz)
            img = render(cam, p, aux.alive, bg, d_xyz, d_rot, d_scale,
                         sh_degree=3, with_features=False,
                         raster_cfg=cfg)["render"]
            return l1_loss(img, gt)
        return jax.grad(f)(params)

    print(f"frame fwd+bwd (L1): {timeit(render_fwdbwd, params):.2f} ms")

    # ssim fwd+bwd alone
    img0 = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))

    @jax.jit
    def ssim_fwdbwd(img):
        return jax.grad(lambda x: 1.0 - ssim(x, gt))(img)

    print(f"ssim fwd+bwd: {timeit(ssim_fwdbwd, img0):.2f} ms")

    # full step
    state = T.init_train_state(params, aux, dvars)
    lrs = T.LearningRates(*[jnp.float32(1e-4)] * 8)

    def gstep(state):
        new_state, _ = T.gaussian_phase_step(
            state, cam.buffers, gt, fid, jnp.float32(0.0), lrs, bg,
            deform_net=net, image_height=H, image_width=W,
            sh_degree=3, use_deform=True, is_6dof=False,
            lambda_dssim=0.2, lambda_reg_deform=0.0, raster_cfg=cfg,
        )
        return new_state

    print(f"full gaussian step: {timeit(gstep, state, iters=10):.2f} ms")


if __name__ == "__main__":
    main()
