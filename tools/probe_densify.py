#!/usr/bin/env python
"""Diagnose why densification stalls at production resolution.

Reuses the cached validate_scale dataset, disables the trainer's
scheduled densify, and every --interval iterations prints the full
gate breakdown (grad percentiles vs threshold, clone/split routing by
scale vs percent_dense*extent, opacity/prune pressure, free slots),
then performs the densify manually so the run still grows.

Usage:
    python tools/probe_densify.py --data /tmp/scale_val/data \
        --iterations 1200
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
    ap.add_argument("--out", default="/tmp/probe_densify_model")
    ap.add_argument("--iterations", type=int, default=1200)
    ap.add_argument("--interval", type=int, default=100)
    ap.add_argument("--pairs_per_gaussian", type=int, default=32)
    ap.add_argument("--max_per_tile", type=int, default=1024)
    ap.add_argument("--densify_grad_threshold", type=float, default=1e-4)
    ap.add_argument("--max_new", type=int, default=32768)
    args = ap.parse_args(argv)

    import jax.numpy as jnp

    from trase_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams,
    )
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.models import gaussians as G
    from trase_tpu.ops.rasterize import RasterConfig

    dataset = ModelParams(source_path=args.data, model_path=args.out,
                          eval=True, is_blender=True)
    opt = OptimizationParams(
        iterations=args.iterations,
        warm_up=min(300, args.iterations // 10),
        warm_up_3d_features=10 ** 9,  # GAUSSIAN phase only
        densify_from_iter=10 ** 9,  # disable scheduled densify
        densify_until_iter=10 ** 9,
        densification_interval=args.interval,
        densify_grad_threshold=args.densify_grad_threshold,
        opacity_reset_interval=100_000,
        position_lr_max_steps=args.iterations,
        deform_lr_max_steps=args.iterations,
    )
    pipe = PipelineParams()
    raster_cfg = RasterConfig(pairs_per_gaussian=args.pairs_per_gaussian,
                              max_per_tile=args.max_per_tile)
    scene = Scene(dataset, resolution_scales=(1.0,))
    trainer = Trainer(dataset, opt, pipe, scene, raster_cfg=raster_cfg,
                      max_new_per_densify=args.max_new, seed=0)
    extent = float(scene.cameras_extent)
    pd = opt.percent_dense * extent
    print(f"[probe] cameras_extent={extent:.4f} percent_dense*extent="
          f"{pd:.5f} grad_threshold={args.densify_grad_threshold}")

    def pct(x, qs=(50, 90, 99, 100)):
        x = np.asarray(x, np.float64)
        if x.size == 0:
            return [float("nan")] * len(qs)
        return [round(float(np.percentile(x, q)), 7) for q in qs]

    def on_iteration(tr, iteration, metrics):
        if iteration % args.interval != 0:
            return
        aux = tr.state.aux
        params = tr.state.params
        alive = np.asarray(aux.alive)
        denom = np.asarray(aux.denom)
        accum = np.asarray(aux.xyz_gradient_accum)
        grads = np.where(denom > 0, accum / np.maximum(denom, 1e-12), 0.0)
        scaling = np.asarray(jnp.exp(params.scaling).max(axis=1))
        opac = np.asarray(1 / (1 + np.exp(-params.opacity[:, 0])))
        a = alive
        seen = a & (denom > 0)
        hg = a & (grads >= args.densify_grad_threshold)
        rec = {
            "iter": iteration,
            "n_alive": int(a.sum()),
            "n_seen": int(seen.sum()),
            "denom_p": pct(denom[a]),
            "grads_p": pct(grads[seen]),
            "n_high_grad": int(hg.sum()),
            "n_clone_cand": int((hg & (scaling <= pd)).sum()),
            "n_split_cand": int((hg & (scaling > pd)).sum()),
            "scale_p": pct(scaling[a]),
            "opacity_p": pct(opac[a], (1, 10, 50, 90)),
            "n_below_min_opac": int((a & (opac < 0.005)).sum()),
            "free_slots": int((~a).sum()),
            "overflow": round(float(metrics.get("overflow", 0.0)), 1),
            "loss": round(float(metrics["loss"]), 5),
        }
        print("[probe] " + json.dumps(rec), flush=True)
        stats = tr._densify(iteration)
        print(f"[probe] densify -> clone={int(stats['n_clone'])} "
              f"split={int(stats['n_split'])} "
              f"pruned={int(stats['n_pruned'])} "
              f"alive={int(stats['n_alive'])}", flush=True)

    trainer.train(first_iter=0, saving_iterations=set(),
                  testing_iterations={args.iterations}, progress=False,
                  on_iteration=on_iteration)


if __name__ == "__main__":
    main()
