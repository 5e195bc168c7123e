#!/usr/bin/env python
"""Production-scale end-to-end validation (the BASELINE round-4 regime).

The env has no dataset egress (BASELINE.md), so this grows the synthetic
dynamic-scene benchmark to production scale instead: 1K-resolution
views, two-phase training (GAUSSIAN photometric + FEATURE contrastive),
densification to a target alive-gaussian count (default >=300k), then
the full segmentation pipeline (HDBSCAN clustering -> cluster-to-object
matching -> per-view predicted masks) scored with the reference's
metrics: novel-view PSNR (reference train.py:482-489) and mask mIoU
(reference metrics_segmentation.py:40-48,127).

Long-schedule quality curves (reference default is a 30k-iteration
schedule, arguments/__init__.py:94, with the FEATURE phase starting at
iteration 15k, i.e. halfway): pass --milestones to run the FULL
pipeline eval (PSNR + clustering + mIoU) at intermediate iterations;
each milestone appends one JSON line to <out>/curve.jsonl as soon as
it completes, so an interrupted run still leaves a committed curve.

Usage (real chip, ~15 min):
    python tools/validate_scale.py --out /tmp/scale_val
Long-schedule hardware run (hours):
    python tools/validate_scale.py --out /tmp/scale_30k \
        --iterations 30000 --feature_warmup_frac 0.5 \
        --milestones 3000,15000,20000,25000,30000 --max_hours 7
CPU smoke (~2 min):
    python tools/validate_scale.py --out /tmp/scale_smoke \
        --image_size 96 --iterations 60 --pts_per_blob 32 \
        --n_train 6 --n_test 2 --max_new 512

Prints one JSON line {psnr, miou, n_alive, ...}; record the numbers in
BASELINE.md by hand.
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


class _Deadline(Exception):
    """Raised from on_iteration when --max_hours is exceeded."""


def seg_eval(trainer, scene, dataset, raster_cfg, model_dir, iteration,
             sample_percent=None):
    """Full segmentation-quality eval of the trainer's CURRENT state.

    Saves a snapshot at `iteration`, clusters it (HDBSCAN, reference
    gui.py:271-301), matches clusters to GT blobs by intersection-over-
    area on the first test view (reference render.py:97-104 analog),
    renders per-object predicted masks on every test view and scores
    mask mIoU (reference metrics_segmentation.py:40-48,127).

    Returns (miou, n_clusters, n_alive).
    """
    import jax
    import jax.numpy as jnp

    import cluster as cluster_cli
    from trase_tpu.cluster.clustering import load_clusters
    from trase_tpu.data.masks import decode_mask_file
    from trase_tpu.engine import trainer as T
    from trase_tpu.models import gaussians as G
    from trase_tpu.renderer import render

    n_alive = int(G.num_alive(trainer.state.aux))
    # snapshot NOW so the ply rows match the live state exactly (a
    # densify between save and eval would desync cluster ids)
    trainer.save_snapshot(iteration)
    if sample_percent is None:
        sample_percent = 0.02 if n_alive > 100_000 else 1.0
    cluster_cli.main(["-m", model_dir, "--iteration", str(iteration),
                      "--sample_percent", str(sample_percent)])
    ids, _ = load_clusters(os.path.join(
        model_dir, "point_cloud", f"iteration_{iteration}", "clusters.pt"))
    n_clusters = int(ids.max()) + 1
    print(f"[validate_scale] iter {iteration}: {n_clusters} clusters "
          f"over {n_alive} alive")

    params = trainer.state.params
    alive = trainer.state.aux.alive
    deform_vars = trainer.state.deform_vars
    capacity = params.xyz.shape[0]
    alive_idx = np.flatnonzero(np.asarray(alive))
    assert len(ids) == len(alive_idx), (len(ids), len(alive_idx))
    cluster_of = np.full(capacity, -1, np.int64)
    cluster_of[alive_idx] = ids

    def render_mask(cam_key, cam, member):
        """Predicted object mask: deformed render at the view's fid with
        per-gaussian selection, binarized alpha (reference
        render.py:334-366 pred_masks). One compile serves every view,
        cluster, AND milestone: pose buffers, fid, member mask, params
        and deform weights are all traced arguments, cached on the
        trainer keyed by shape (a per-view jit would recompile for
        every camera at ~20-40 s each on hardware)."""
        from trase_tpu.renderer import RenderCamera

        rc = cam.to_render_camera()
        key = ("seg_eval_alpha", rc.image_height, rc.image_width,
               trainer.active_sh_degree, raster_cfg)
        cache = getattr(trainer, "_seg_eval_cache", None)
        if cache is None:
            cache = trainer._seg_eval_cache = {}
        fn = cache.get(key)
        if fn is None:
            H, W = rc.image_height, rc.image_width
            sh_degree = trainer.active_sh_degree
            deform_net = trainer.deform_net
            is_6dof = dataset.is_6dof

            def _alpha(m, prm, alv, dvars, buffers, fid):
                d = T._apply_deform(
                    deform_net, dvars, prm.xyz, fid,
                    0.0, True, stop_grad_deform=True,
                    gaussian_features=prm.gaussian_features)
                rcam = RenderCamera(buffers, H, W)
                return render(rcam, prm, alv, jnp.zeros(3), *d,
                              is_6dof=is_6dof,
                              sh_degree=sh_degree,
                              with_features=False, mask=m,
                              raster_cfg=raster_cfg)["alpha"]

            fn = cache[key] = jax.jit(_alpha)
        return np.asarray(fn(jnp.asarray(member), params, alive,
                             deform_vars, rc.buffers,
                             jnp.float32(cam.fid)))[0] > 0.5

    test_cams = scene.get_test_cameras()
    # match clusters to blobs on the FIRST test view by intersection-
    # over-area against each blob's GT mask
    cam0 = test_cams[0]
    gt_masks0 = decode_mask_file(cam0.mask_path) > 0  # (B, H, W)
    n_blobs = gt_masks0.shape[0]
    owners = [[] for _ in range(n_blobs)]
    for c in range(n_clusters):
        member = cluster_of == c
        if member.sum() == 0:
            continue
        m = render_mask(0, cam0, member)
        area = m.sum()
        if area < 16:
            continue
        ioa = [(m & gt_masks0[b]).sum() / area for b in range(n_blobs)]
        b = int(np.argmax(ioa))
        if ioa[b] > 0.5:
            owners[b].append(c)

    ious = []
    for vi, cam in enumerate(test_cams):
        gt_masks = decode_mask_file(cam.mask_path) > 0
        for b in range(n_blobs):
            if not owners[b]:
                ious.append(0.0)
                continue
            member = np.isin(cluster_of, owners[b])
            pred = render_mask(vi, cam, member)
            inter = (pred & gt_masks[b]).sum()
            union = (pred | gt_masks[b]).sum()
            ious.append(float(inter) / max(float(union), 1.0))
    miou = float(np.mean(ious)) if ious else 0.0
    return miou, n_clusters, n_alive


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", required=True,
                    help="working dir (dataset + model are written here)")
    ap.add_argument("--image_size", type=int, default=1008)
    ap.add_argument("--n_blobs", type=int, default=5)
    ap.add_argument("--pts_per_blob", type=int, default=2400)
    ap.add_argument("--n_train", type=int, default=24)
    ap.add_argument("--n_test", type=int, default=4)
    ap.add_argument("--n_times", type=int, default=0,
                    help="0 = monocular ring (time==angle); >0 = "
                         "Neu3D-style rig: n_train//n_times cameras x "
                         "n_times timestamps, test cameras held out "
                         "(novel-view PSNR then measures "
                         "reconstruction, not monocular ambiguity)")
    ap.add_argument("--iterations", type=int, default=3000)
    ap.add_argument("--target_alive", type=int, default=300_000,
                    help="densify until at least this many alive "
                         "gaussians (0 = just run the schedule)")
    ap.add_argument("--pairs_per_gaussian", type=int, default=8)
    ap.add_argument("--max_per_tile", type=int, default=1024)
    ap.add_argument("--pack_features", action="store_true",
                    help="bf16-paired feature payload (quality "
                         "validation of RasterConfig.pack_features)")
    ap.add_argument("--max_new", type=int, default=32768,
                    help="per-densify growth budget")
    ap.add_argument("--feature_warmup_frac", type=float, default=0.6,
                    help="fraction of the schedule before the FEATURE "
                         "phase starts (reference: 15k/30k = 0.5, "
                         "arguments/__init__.py:94-134)")
    ap.add_argument("--densify_until_frac", type=float, default=0.55)
    ap.add_argument("--milestones", type=str, default="",
                    help="CSV of iterations at which to run the full "
                         "PSNR+cluster+mIoU eval; each appends one line "
                         "to <out>/curve.jsonl immediately")
    ap.add_argument("--max_hours", type=float, default=0.0,
                    help="abort training gracefully past this wall "
                         "clock (>0); the last completed milestone "
                         "still stands and a final eval runs")
    ap.add_argument("--mesh", type=int, default=0,
                    help="run the trainer over an N-device mesh")
    ap.add_argument("--stall_timeout_s", type=float, default=1800.0,
                    help="hard-exit (rc 86) when no iteration "
                         "completes for this long — a wedged device "
                         "tunnel blocks in native recv where signal "
                         "handlers and --max_hours can never fire "
                         "(0 disables)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    from trase_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams,
    )
    from trase_tpu.data.scene import Scene
    from trase_tpu.data.synthetic import write_synthetic_dataset
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.models import gaussians as G
    from trase_tpu.ops.rasterize import RasterConfig

    # absolute: the datagen subprocess below runs with cwd at the repo
    # root, so a relative --out would desync parent/child paths
    out_dir = os.path.abspath(args.out)
    data_dir = os.path.join(out_dir, "data")
    model_dir = os.path.join(out_dir, "model")
    t0 = time.perf_counter()
    if not os.path.exists(os.path.join(data_dir, "transforms_train.json")):
        print(f"[validate_scale] writing {args.image_size}px dataset "
              f"({args.n_blobs} blobs x {args.pts_per_blob} pts)...")
        # ALWAYS generate in a CPU-platform subprocess: the generator's
        # GT compositing is un-jitted, and per-op dispatch through the
        # axon tunnel is ~100x slower than host CPU (a 1008px dataset
        # that takes minutes on CPU showed zero images after 25 min on
        # the tunnel). The training process itself must stay on the
        # default (TPU) platform, and JAX pins its platform at first
        # init — hence a subprocess, not a flag.
        import subprocess
        code = (
            "from trase_tpu.data.synthetic import write_synthetic_dataset;"
            f"write_synthetic_dataset({data_dir!r}, n_train={args.n_train},"
            f" n_test={args.n_test}, image_size={args.image_size},"
            f" n_blobs={args.n_blobs}, pts_per_blob={args.pts_per_blob},"
            f" seed={args.seed}, fast_gt={args.image_size > 256},"
            f" n_times={args.n_times})"
        )
        env = dict(os.environ, JAX_PLATFORMS="cpu")
        env.pop("PALLAS_AXON_POOL_IPS", None)
        subprocess.run([sys.executable, "-c", code], check=True, env=env,
                       cwd=os.path.dirname(os.path.dirname(
                           os.path.abspath(__file__))))
    t_data = time.perf_counter() - t0

    dataset = ModelParams(source_path=data_dir, model_path=model_dir,
                          eval=True, is_blender=True)
    opt = OptimizationParams(
        iterations=args.iterations,
        warm_up=min(300, args.iterations // 10),
        warm_up_3d_features=int(args.iterations * args.feature_warmup_frac),
        iterative_opt_interval=100,
        densify_from_iter=50,
        densify_until_iter=int(args.iterations * args.densify_until_frac),
        densification_interval=100,
        densify_grad_threshold=1e-4,  # aggressive: drive N to the target
        opacity_reset_interval=100_000,  # keep everything contributing
        position_lr_max_steps=args.iterations,
        deform_lr_max_steps=args.iterations,
    )
    pipe = PipelineParams()
    raster_cfg = RasterConfig(pairs_per_gaussian=args.pairs_per_gaussian,
                              max_per_tile=args.max_per_tile,
                              pack_features=args.pack_features)

    scene = Scene(dataset, resolution_scales=(1.0,))
    if args.mesh > 0:
        from trase_tpu.parallel import ShardedTrainer

        trainer = ShardedTrainer(dataset, opt, pipe, scene,
                                 raster_cfg=raster_cfg,
                                 max_new_per_densify=args.max_new,
                                 mesh_devices=args.mesh, seed=args.seed)
    else:
        trainer = Trainer(dataset, opt, pipe, scene,
                          raster_cfg=raster_cfg,
                          max_new_per_densify=args.max_new,
                          seed=args.seed)

    milestones = sorted(int(m) for m in args.milestones.split(",") if m)
    curve_path = os.path.join(out_dir, "curve.jsonl")
    alive_track = []
    deadline = (time.perf_counter() + args.max_hours * 3600.0
                if args.max_hours > 0 else None)
    t1 = time.perf_counter()

    def milestone_eval(iteration):
        psnr = trainer.evaluate(iteration)
        miou, n_clusters, n_alive = seg_eval(
            trainer, scene, dataset, raster_cfg, model_dir, iteration)
        entry = {
            "iteration": iteration,
            "n_alive": n_alive,
            "psnr_test": round(psnr, 3),
            "miou": round(miou, 4),
            "n_clusters": n_clusters,
            "elapsed_s": round(time.perf_counter() - t1, 1),
        }
        with open(curve_path, "a") as f:
            f.write(json.dumps(entry) + "\n")
        print(f"[validate_scale] milestone {json.dumps(entry)}")
        return entry

    last_entry = None

    def on_iteration(tr, iteration, metrics):
        nonlocal last_entry
        if iteration % 200 == 0:
            n_alive = int(G.num_alive(tr.state.aux))
            alive_track.append((iteration, n_alive))
            print(f"  iter {iteration}: loss {float(metrics['loss']):.4f} "
                  f"alive {n_alive}", flush=True)
        # keep densifying (ignore the schedule's until_iter) while under
        # the alive target, the way a user would retune the schedule
        if (args.target_alive and iteration < args.iterations * 0.8
                and iteration % opt.densification_interval == 0
                and iteration > opt.densify_until_iter
                and int(G.num_alive(tr.state.aux)) < args.target_alive):
            tr._densify(iteration)
        if iteration in milestones and iteration < args.iterations:
            last_entry = milestone_eval(iteration)
        if deadline is not None and time.perf_counter() > deadline:
            raise _Deadline(iteration)

    aborted_at = None
    last_seen = [0]
    orig_on_iteration = on_iteration

    def on_iteration(tr, iteration, metrics):  # noqa: F811
        last_seen[0] = iteration
        orig_on_iteration(tr, iteration, metrics)

    try:
        trainer.train(first_iter=0, saving_iterations=set(),
                      testing_iterations=set(), progress=True,
                      on_iteration=on_iteration,
                      stall_timeout_s=args.stall_timeout_s)
    except _Deadline as e:
        aborted_at = int(e.args[0])
        print(f"[validate_scale] --max_hours hit at iter {aborted_at}; "
              f"running final eval on the current state")
    except Exception as e:  # noqa: BLE001 — salvage the curve
        aborted_at = max(last_seen[0], 1)
        print(f"[validate_scale] training DIED at iter ~{aborted_at} "
              f"({type(e).__name__}: {e}); attempting final eval on "
              f"the last committed state")
    t_train = time.perf_counter() - t1

    final_iter = aborted_at if aborted_at is not None else args.iterations
    if last_entry is None or last_entry["iteration"] != final_iter:
        last_entry = milestone_eval(final_iter)

    result = {
        "metric": "scale_validation",
        "image_size": args.image_size,
        "iterations": final_iter,
        "aborted": aborted_at is not None,
        "n_alive": last_entry["n_alive"],
        "psnr_test": last_entry["psnr_test"],
        "miou": last_entry["miou"],
        "n_clusters": last_entry["n_clusters"],
        "train_s": round(t_train, 1),
        "iters_per_s": round(final_iter / t_train, 2),
        "data_gen_s": round(t_data, 1),
        "alive_track": alive_track[-5:],
        "pack_features": bool(args.pack_features),
    }
    print(json.dumps(result))
    return result


if __name__ == "__main__":
    main()
