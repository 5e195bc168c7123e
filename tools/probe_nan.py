#!/usr/bin/env python
"""Catch the first non-finite training step and localize its source.

Backward-only NaNs (finite loss, NaN grads) poison the shared deform
MLP weights and silently kill the scene (every render goes blank while
the loss stays finite against the background). This probe runs the
production-scale config with a per-iteration state-finiteness watch;
on the first poisoned step it replays that step's backward from the
saved pre-step state and prints per-leaf NaN counts plus the offending
rows' parameter values.

Usage:
    python tools/probe_nan.py --data /tmp/scale_val/data \
        --iterations 400
"""
from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--data", required=True)
    ap.add_argument("--out", default="/tmp/probe_nan_model")
    ap.add_argument("--iterations", type=int, default=400)
    ap.add_argument("--pairs_per_gaussian", type=int, default=32)
    ap.add_argument("--max_per_tile", type=int, default=1024)
    ap.add_argument("--densify_from", type=int, default=100)
    ap.add_argument("--dump", default="/tmp/probe_nan_state.npz")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from trase_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams,
    )
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.engine import trainer as T
    from trase_tpu.ops.rasterize import RasterConfig

    dataset = ModelParams(source_path=args.data, model_path=args.out,
                          eval=True, is_blender=True)
    opt = OptimizationParams(
        iterations=args.iterations,
        warm_up=min(300, args.iterations // 10),
        warm_up_3d_features=10 ** 9,  # GAUSSIAN phase only
        densify_from_iter=args.densify_from,
        densify_until_iter=10 ** 9,
        densification_interval=100,
        opacity_reset_interval=100_000,
        position_lr_max_steps=args.iterations,
        deform_lr_max_steps=args.iterations,
    )
    pipe = PipelineParams()
    raster_cfg = RasterConfig(pairs_per_gaussian=args.pairs_per_gaussian,
                              max_per_tile=args.max_per_tile)
    scene = Scene(dataset, resolution_scales=(1.0,))
    trainer = Trainer(dataset, opt, pipe, scene, raster_cfg=raster_cfg,
                      seed=0)

    @jax.jit
    def state_finite(state):
        leaves = jax.tree_util.tree_leaves(state)
        return jnp.all(jnp.stack([
            jnp.all(jnp.isfinite(x)) for x in leaves
            if jnp.issubdtype(x.dtype, jnp.floating)
        ]))

    # capture the inputs of every gaussian step so the poisoning one can
    # be replayed from the saved pre-step state
    ctx = {"prev_state": trainer.state, "cam": None, "iter": None,
           "ast": None}
    orig_gstep = trainer._gaussian_step

    def wrapped_gstep(cam, iteration):
        ctx["prev_state"] = trainer.state
        ctx["cam"] = cam
        ctx["iter"] = iteration
        # mirror the trainer's ast draw: peek by copying the rng state
        rng_state = trainer.np_rng.bit_generator.state
        ctx["ast"] = trainer.ast_noise_fn(trainer.np_rng, iteration)
        trainer.np_rng.bit_generator.state = rng_state
        return orig_gstep(cam, iteration)

    trainer._gaussian_step = wrapped_gstep

    def leaf_report(tag, tree):
        flat, _ = jax.tree_util.tree_flatten_with_path(tree)
        for path, x in flat:
            if not jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating):
                continue
            arr = np.asarray(x)
            bad = ~np.isfinite(arr)
            if bad.any():
                name = jax.tree_util.keystr(path)
                if arr.ndim >= 1:
                    rows = np.unique(np.where(bad)[0])
                    print(f"[{tag}] {name}: {bad.sum()} non-finite "
                          f"({len(rows)} rows, e.g. {rows[:8].tolist()})")
                else:
                    print(f"[{tag}] {name}: non-finite scalar")

    def replay_jitted():
        """Re-run the exact jitted step from the saved pre-step state."""
        cam, iteration = ctx["cam"], ctx["iter"]
        state = ctx["prev_state"]
        rc = cam.to_render_camera()
        use_deform = iteration >= trainer.opt.warm_up
        new_state, metrics = T.gaussian_phase_step(
            state, rc.buffers, trainer._gt_image(cam),
            jnp.float32(cam.fid), jnp.float32(ctx["ast"]),
            trainer.lr_at(iteration), trainer.bg_color,
            deform_net=trainer.deform_net,
            image_height=rc.image_height, image_width=rc.image_width,
            sh_degree=trainer.active_sh_degree,
            use_deform=use_deform, is_6dof=trainer.args.is_6dof,
            lambda_dssim=trainer.opt.lambda_dssim,
            lambda_reg_deform=trainer.opt.lambda_reg_deform,
            raster_cfg=trainer.raster_cfg,
        )
        print(f"[jit-replay] loss={float(metrics['loss']):.6f} "
              f"finite={bool(metrics['finite'])}")
        leaf_report("jit-replay", new_state)

    def replay_and_report():
        cam, iteration = ctx["cam"], ctx["iter"]
        state = ctx["prev_state"]
        rc = cam.to_render_camera()
        use_deform = iteration >= trainer.opt.warm_up
        from trase_tpu.renderer import render, RenderCamera
        from trase_tpu.losses.image_losses import l1_loss
        from trase_tpu.ops.ssim import ssim

        camera = RenderCamera(rc.buffers, rc.image_height, rc.image_width)
        p, aux = state.params, state.aux
        off = jnp.zeros((p.xyz.shape[0], 2))
        fid = jnp.float32(cam.fid)
        ast = jnp.float32(ctx["ast"])

        def loss_fn(params, deform_vars, off):
            d_xyz, d_rot, d_scale = T._apply_deform(
                trainer.deform_net, deform_vars, params.xyz, fid, ast,
                use_deform, stop_grad_deform=False,
                gaussian_features=params.gaussian_features)
            out = render(camera, params, aux.alive, trainer.bg_color,
                         d_xyz, d_rot, d_scale,
                         is_6dof=trainer.args.is_6dof,
                         sh_degree=trainer.active_sh_degree,
                         mean2d_offset=off, with_features=False,
                         raster_cfg=trainer.raster_cfg)
            image = out["render"]
            ll1 = l1_loss(image, trainer._gt_image(cam))
            loss = (1 - trainer.opt.lambda_dssim) * ll1 + \
                trainer.opt.lambda_dssim * (1 - ssim(image,
                                                     trainer._gt_image(cam)))
            if use_deform and trainer.opt.lambda_reg_deform > 0:
                loss = loss + trainer.opt.lambda_reg_deform * \
                    jnp.abs(d_xyz).mean()
            return loss, out

        # jit the backward: eager evaluation orders inf/0 arithmetic
        # differently from the fused step and can hide the NaN
        (loss, out), grads = jax.jit(jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True))(
                p, state.deform_vars, off)
        gp, gdeform, goff = grads
        print(f"[replay] iter={iteration} loss={float(loss):.6f} "
              f"finite_loss={bool(jnp.isfinite(loss))}")

        alive = np.asarray(aux.alive)
        row_maxg = np.zeros((p.xyz.shape[0],), np.float64)
        for name in p._fields:
            g = np.asarray(getattr(gp, name), np.float64)
            g = np.abs(g).reshape(g.shape[0], -1)
            g = np.where(np.isfinite(g), g, np.inf)
            print(f"[replay] grad[{name}]: max|g|={g.max():.3e} "
                  f"p99.9={np.percentile(g.max(axis=1), 99.9):.3e}")
            row_maxg = np.maximum(row_maxg, g.max(axis=1))
        goff_np = np.abs(np.asarray(goff, np.float64))
        goff_np = np.where(np.isfinite(goff_np), goff_np, np.inf)
        print(f"[replay] grad[mean2d_offset]: max|g|={goff_np.max():.3e}")
        row_maxg = np.maximum(row_maxg, goff_np.max(axis=1))
        flat, _ = jax.tree_util.tree_flatten(gdeform)
        dmax = max(float(np.abs(np.asarray(x)).max()) for x in flat)
        n_bad_deform = sum(int((~np.isfinite(np.asarray(x))).sum())
                           for x in flat)
        print(f"[replay] deform grads: {n_bad_deform} non-finite, "
              f"max|g|={dmax:.3e}")

        # forensics on the largest-gradient rows: recompute the deformed
        # geometry and the f32 EWA determinant those rows saw
        from trase_tpu.ops import projection as P
        from trase_tpu.renderer import apply_deformation
        d_xyz, d_rot, d_scale = T._apply_deform(
            trainer.deform_net, state.deform_vars, p.xyz, fid, ast,
            use_deform, stop_grad_deform=True,
            gaussian_features=p.gaussian_features)
        means3d, scales_def, rots_def = apply_deformation(
            p, d_xyz, d_rot, d_scale, trainer.args.is_6dof)
        cov3d = P.compute_cov3d(scales_def, rots_def)
        proj = P.project_gaussians(
            means3d, cov3d, jnp.where(aux.alive,
                                      jax.nn.sigmoid(p.opacity[:, 0]), 0.0),
            camera.buffers, rc.image_height, rc.image_width,
            colors_precomp=jnp.zeros((p.xyz.shape[0], 3)))
        # recompute a,b,c,det exactly as project_gaussians does
        conic = np.asarray(proj.conic, np.float64)
        scales_np = np.asarray(scales_def)
        d_scale_np = np.asarray(d_scale) if use_deform else \
            np.zeros_like(scales_np)
        radii = np.asarray(out["radii"])
        vis = np.asarray(out["visibility_filter"])
        order = np.argsort(-row_maxg)[:16]
        for r in order:
            print(f"[replay] row {r}: max|g|={row_maxg[r]:.3e} "
                  f"alive={bool(alive[r])} vis={bool(vis[r])} "
                  f"radius={radii[r]:.1f} "
                  f"scale_def={scales_np[r].tolist()} "
                  f"d_scale={d_scale_np[r].tolist()} "
                  f"conic={conic[r].tolist()} "
                  f"depth={float(proj.depth[r]):.4f}")
        np.savez(args.dump,
                 rows=order,
                 xyz=np.asarray(p.xyz), scaling=np.asarray(p.scaling),
                 rotation=np.asarray(p.rotation),
                 opacity=np.asarray(p.opacity), alive=alive,
                 features_dc=np.asarray(p.features_dc),
                 features_rest=np.asarray(p.features_rest),
                 gaussian_features=np.asarray(p.gaussian_features),
                 fid=float(fid), ast=float(ast),
                 world_view=np.asarray(camera.buffers.world_view),
                 full_proj=np.asarray(camera.buffers.full_proj),
                 campos=np.asarray(camera.buffers.campos),
                 tanfovx=float(camera.buffers.tanfovx),
                 tanfovy=float(camera.buffers.tanfovy),
                 image_height=rc.image_height, image_width=rc.image_width,
                 iteration=iteration,
                 **{"deform__" + jax.tree_util.keystr(path): np.asarray(x)
                    for path, x in jax.tree_util.tree_flatten_with_path(
                        state.deform_vars)[0]})
        print(f"[replay] pre-step state dumped to {args.dump}")

    def on_iteration(tr, iteration, metrics):
        # with the in-graph grads-finite guard active the state stays
        # clean and the poisoned step reports finite=False instead
        ok = bool(state_finite(tr.state)) and bool(metrics["finite"])
        if not ok:
            print(f"[watch] iter {iteration}: POISONED STEP "
                  f"(loss={float(metrics['loss']):.6f}, "
                  f"finite={bool(metrics['finite'])})", flush=True)
            leaf_report("state", tr.state)
            replay_jitted()
            replay_and_report()
            print(json.dumps({"first_bad_iter": iteration}))
            os._exit(2)
        if iteration % 50 == 0:
            print(f"[watch] iter {iteration} finite "
                  f"loss={float(metrics['loss']):.5f}", flush=True)

    trainer.train(first_iter=0, saving_iterations=set(),
                  testing_iterations={args.iterations}, progress=False,
                  on_iteration=on_iteration)
    print(json.dumps({"first_bad_iter": None}))


if __name__ == "__main__":
    main()
