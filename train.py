#!/usr/bin/env python
"""TRASE-TPU training CLI.

Mirrors the reference trainer surface (reference train.py:497-525):
same flag groups (Model/Optimization/Pipeline), --test_iterations /
--save_iterations / --checkpoint_iterations / --start_checkpoint /
--load_iteration, cfg persistence under model_path. The loop itself
lives in trase_tpu/engine/loop.py.
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    from trase_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams, save_cfg,
    )

    parser = argparse.ArgumentParser(
        description="Training script parameters")
    ModelParams.add_to_parser(parser)
    OptimizationParams.add_to_parser(parser)
    PipelineParams.add_to_parser(parser)
    parser.add_argument("--ip", type=str, default="127.0.0.1")
    parser.add_argument("--port", type=int, default=6009)
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true",
                        default=False)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[1_000, 7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[1_000, 7_000, 30_000, 60_000])
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--load_iteration", type=int, default=-1)
    parser.add_argument("--max_per_tile", type=int, default=1024,
                        help="rasterizer per-tile gaussian capacity")
    parser.add_argument("--pairs_per_gaussian", type=int, default=8)
    parser.add_argument("--pack_features",
                        action=argparse.BooleanOptionalAction,
                        default=True,
                        help="bf16-pair the 32-ch feature payload in "
                             "the Pallas compositor (1/3 less HBM "
                             "traffic in the FEATURE phase; default on "
                             "since the r5 quality/speed A/B — "
                             "disable with --no-pack_features)")
    parser.add_argument("--mesh", type=int, default=0,
                        help="train SPMD over an N-device jax mesh "
                             "(0 = single device)")
    parser.add_argument("--mesh_backend", type=str, default=None,
                        choices=[None, "pallas", "dense"],
                        help="sharded compositor backend "
                             "(default: pallas on TPU, dense elsewhere)")
    parser.add_argument("--profile_iters", nargs=2, type=int,
                        default=None, metavar=("START", "STOP"),
                        help="capture a jax.profiler device trace over "
                             "this iteration range into "
                             "<model_path>/trace (open with "
                             "tensorboard/perfetto)")
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)
    if args.profile_iters and args.profile_iters[1] <= args.profile_iters[0]:
        parser.error("--profile_iters STOP must be > START")

    print("Optimizing " + args.model_path)

    dataset = ModelParams.extract(args)
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)

    if not dataset.model_path:
        import uuid

        dataset.model_path = os.path.join("./output", str(uuid.uuid4())[:10])
    os.makedirs(dataset.model_path, exist_ok=True)
    args.model_path = dataset.model_path
    save_cfg(dataset.model_path, args)

    from trase_tpu.data.scene import Scene
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    load_iter = args.load_iteration if args.load_iteration != -1 else None
    scene = Scene(dataset, load_iteration=load_iter)

    raster_cfg = RasterConfig(
        pairs_per_gaussian=args.pairs_per_gaussian,
        max_per_tile=args.max_per_tile,
        pack_features=args.pack_features,
    )
    if args.mesh > 0:
        from trase_tpu.parallel import ShardedTrainer

        trainer = ShardedTrainer(dataset, opt, pipe, scene,
                                 raster_cfg=raster_cfg,
                                 mesh_devices=args.mesh,
                                 backend=args.mesh_backend)
    else:
        trainer = Trainer(dataset, opt, pipe, scene, raster_cfg=raster_cfg)

    first_iter = 0
    if args.load_iteration != -1:
        first_iter = args.load_iteration
    if args.start_checkpoint:
        first_iter = trainer.load_ckpt(args.start_checkpoint)

    # --detect_anomaly: the reference flips
    # torch.autograd.set_detect_anomaly (train.py:506,521); the jax
    # analog re-runs a jitted step op-by-op when a NaN escapes it.
    # --debug_from arms the same check from a given iteration.
    if args.detect_anomaly:
        import jax

        jax.config.update("jax_debug_nans", True)

    hooks = []
    if args.debug_from >= 0 and not args.detect_anomaly:
        def _debug_hook(tr, iteration, metrics):
            if iteration >= args.debug_from:
                import jax

                jax.config.update("jax_debug_nans", True)

        hooks.append(_debug_hook)
    tracing = {"on": False}
    if args.profile_iters:
        import jax

        p_start, p_stop = args.profile_iters  # validated after parse
        trace_dir = os.path.join(dataset.model_path, "trace")

        def _profile_hook(tr, iteration, metrics):
            # the reference's analog is per-iter CUDA-event timing
            # (train.py:140-141); this captures a full device trace.
            # >= comparisons + the `tracing` flag keep the window
            # bounded even if an iteration number is skipped.
            if not tracing["on"] and p_start <= iteration < p_stop:
                jax.profiler.start_trace(trace_dir)
                tracing["on"] = True
                print(f"[profile] tracing -> {trace_dir}")
            elif tracing["on"] and iteration >= p_stop:
                jax.profiler.stop_trace()
                tracing["on"] = False
                print("[profile] trace stopped")

        hooks.append(_profile_hook)

    on_iteration = None
    if hooks:
        def on_iteration(tr, iteration, metrics):
            for h in hooks:
                h(tr, iteration, metrics)

    try:
        trainer.train(
            first_iter=first_iter,
            testing_iterations=set(args.test_iterations),
            saving_iterations=set(args.save_iterations),
            checkpoint_iterations=set(args.checkpoint_iterations),
            on_iteration=on_iteration,
        )
    finally:
        if tracing["on"]:
            import jax

            jax.profiler.stop_trace()
            print("[profile] trace stopped at exit")
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
