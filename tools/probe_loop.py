#!/usr/bin/env python
"""Wall-clock breakdown of the REAL training loop (engine/loop.py).

bench.py's jitted steps run at ~16/9.5 it/s while validate_scale's
end-to-end loop measured 1.77 it/s at the same 1008px shape — this
probe instruments Trainer's host-side phases (step dispatch, metrics
consume, densify, mask fetch, callback) to find the gap.

Usage: python tools/probe_loop.py --out /tmp/probe_loop \
          [--image_size 1008] [--iterations 200]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True)
    ap.add_argument("--image_size", type=int, default=1008)
    ap.add_argument("--iterations", type=int, default=200)
    ap.add_argument("--feature", action="store_true",
                    help="start in FEATURE phase immediately")
    args = ap.parse_args(argv)

    from trase_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams,
    )
    from trase_tpu.data.scene import Scene
    from trase_tpu.data.synthetic import write_synthetic_dataset
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    data_dir = os.path.join(args.out, "data")
    model_dir = os.path.join(args.out, "model")
    if not os.path.exists(os.path.join(data_dir, "transforms_train.json")):
        print("[probe_loop] writing dataset...", flush=True)
        write_synthetic_dataset(
            data_dir, n_train=24, n_test=4, image_size=args.image_size,
            n_blobs=5, pts_per_blob=2400, seed=0,
            fast_gt=args.image_size > 256)

    it = args.iterations
    dataset = ModelParams(source_path=data_dir, model_path=model_dir,
                          eval=True, is_blender=True)
    opt = OptimizationParams(
        iterations=it,
        warm_up=0 if args.feature else min(300, it // 10),
        warm_up_3d_features=0 if args.feature else it * 2,
        iterative_opt_interval=100,
        densify_from_iter=50,
        densify_until_iter=int(it * 0.55),
        densification_interval=100,
        densify_grad_threshold=1e-4,
        opacity_reset_interval=100_000,
        position_lr_max_steps=it,
        deform_lr_max_steps=it,
    )
    pipe = PipelineParams()
    raster_cfg = RasterConfig(pairs_per_gaussian=8, max_per_tile=1024)
    scene = Scene(dataset, resolution_scales=(1.0,))
    trainer = Trainer(dataset, opt, pipe, scene, raster_cfg=raster_cfg,
                      max_new_per_densify=32768, seed=0)

    buckets = defaultdict(float)
    counts = defaultdict(int)

    series = defaultdict(list)

    def wrap(name, fn):
        def inner(*a, **kw):
            t0 = time.perf_counter()
            r = fn(*a, **kw)
            dt = time.perf_counter() - t0
            buckets[name] += dt
            counts[name] += 1
            series[name].append(dt)
            return r
        return inner

    for name in ("_gaussian_step", "_feature_step", "_densify",
                 "_consume_metrics", "_masks_for", "_gt_image",
                 "_get_smooth_map"):
        setattr(trainer, name, wrap(name, getattr(trainer, name)))

    t0 = time.perf_counter()
    trainer.train(first_iter=0, saving_iterations=set(),
                  testing_iterations=set(), progress=False)
    total = time.perf_counter() - t0

    print(f"\n[probe_loop] {it} iters in {total:.1f}s = "
          f"{it / total:.2f} it/s")
    rows = sorted(buckets.items(), key=lambda kv: -kv[1])
    for name, t in rows:
        print(f"  {name:20s} {t:8.2f}s total  {counts[name]:5d} calls  "
              f"{1000 * t / max(counts[name], 1):8.1f} ms/call")
    other = total - sum(buckets[k] for k in
                        ("_gaussian_step", "_feature_step", "_densify",
                         "_consume_metrics"))
    print(f"  {'(other host)':20s} {other:8.2f}s")
    for name in ("_gaussian_step", "_feature_step"):
        s = sorted(series[name])
        if len(s) >= 20:
            import numpy as _np

            tail = series[name][-50:]
            print(f"  {name} steady-state: median "
                  f"{1000 * s[len(s) // 2]:.1f} ms  p90 "
                  f"{1000 * s[int(len(s) * 0.9)]:.1f} ms  last-50 avg "
                  f"{1000 * _np.mean(tail):.1f} ms")
    print(json.dumps({"iters_per_s": round(it / total, 2),
                      **{k: round(v, 2) for k, v in buckets.items()}}))


if __name__ == "__main__":
    main()
