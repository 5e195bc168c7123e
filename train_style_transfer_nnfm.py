#!/usr/bin/env python
"""NNFM style-transfer fine-tuning CLI.

Mirrors the reference train_style_transfer_nnfm.py: load a trained
scene + clusters, select object gaussians by cluster id, then optimize
ONLY the SH color coefficients (f_dc/f_rest) of the selected object
against a reference style image via the nearest-neighbor feature
matching loss on VGG16 conv4_1 features; gradients outside the object
are zeroed. Densification stays active.

VGG16 pretrained weights are passed with --vgg_weights (a torchvision
.pth state_dict or .npz); without them a seeded random VGG is used
(functional, reduced fidelity — this environment has no model zoo).
"""
from __future__ import annotations

import argparse
import os
import sys


def main(argv=None):
    import numpy as np

    from trase_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams, save_cfg,
    )

    parser = argparse.ArgumentParser(
        description="Style transfer training parameters")
    ModelParams.add_to_parser(parser)
    OptimizationParams.add_to_parser(parser)
    PipelineParams.add_to_parser(parser)
    parser.add_argument("--test_iterations", nargs="+", type=int,
                        default=[1_000, 7_000, 30_000])
    parser.add_argument("--save_iterations", nargs="+", type=int,
                        default=[1_000, 7_000, 30_000, 60_000])
    parser.add_argument("--checkpoint_iterations", nargs="+", type=int,
                        default=[])
    parser.add_argument("--start_checkpoint", type=str, default=None)
    parser.add_argument("--load_iteration", type=int, default=-1)
    parser.add_argument("--segment_ids", type=int, nargs="+", default=[-1])
    parser.add_argument("--reference_img_path", type=str, required=True)
    parser.add_argument("--vgg_weights", type=str, default=None)
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--debug_from", type=int, default=-1)
    parser.add_argument("--detect_anomaly", action="store_true",
                        default=False)
    args = parser.parse_args(argv if argv is not None else sys.argv[1:])
    args.save_iterations.append(args.iterations)

    if args.detect_anomaly or args.debug_from == 0:
        # reference train_style_transfer_nnfm.py:377,398:
        # torch.autograd.set_detect_anomaly; jax analog re-runs a
        # jitted step op-by-op when a NaN escapes it
        import jax

        jax.config.update("jax_debug_nans", True)

    if args.load_iteration == -1:
        print("[ERROR] Please load a pretrained scene!!!")
        return

    dataset = ModelParams.extract(args)
    opt = OptimizationParams.extract(args)
    pipe = PipelineParams.extract(args)
    save_cfg(dataset.model_path, args)

    import jax.numpy as jnp
    from PIL import Image

    from trase_tpu.cluster import load_clusters
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine import trainer as T
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.models.vgg import make_vgg16_extractor
    from trase_tpu.ops.rasterize import RasterConfig

    scene = Scene(dataset, load_iteration=args.load_iteration,
                  shuffle=True)
    trainer = Trainer(dataset, opt, pipe, scene,
                      raster_cfg=RasterConfig())

    # deform weights from the trained snapshot
    deform_path = os.path.join(
        dataset.model_path, "deform",
        f"iteration_{scene.loaded_iter}", "deform.pkl")
    if os.path.exists(deform_path):
        from trase_tpu.models.gaussians_io import load_checkpoint

        payload = load_checkpoint(deform_path)
        import jax

        trainer.state = trainer.state._replace(
            deform_vars=jax.tree_util.tree_map(
                jnp.asarray, payload["vars"]))

    # clusters -> style object mask (gaussian_model.py:146-153)
    cl_path = os.path.join(
        dataset.model_path, "point_cloud",
        f"iteration_{scene.loaded_iter}", "clusters.pt")
    ids, _rgb = load_clusters(cl_path)
    capacity = trainer.state.params.xyz.shape[0]
    full_ids = np.full(capacity, -999, np.int64)
    full_ids[: len(ids)] = ids
    style_mask = np.zeros(capacity, bool)
    for sid in args.segment_ids:
        style_mask |= full_ids == sid
    if not style_mask.any():
        print("[style] WARNING: selected segment_ids match no gaussians; "
              "styling the whole scene")
        style_mask = np.asarray(trainer.state.aux.alive)
    style_mask = jnp.asarray(style_mask)

    # reference style features (computed once)
    fx_key = "conv4_1"
    vgg = make_vgg16_extractor([fx_key], args.vgg_weights)
    with Image.open(args.reference_img_path) as im:
        ref = np.asarray(im.convert("RGB"), np.float32) / 255.0
    ref_chw = jnp.asarray(ref.transpose(2, 0, 1))
    # the reference normalizes once outside the extractor AND once
    # inside its forward (train_style_transfer_nnfm.py:104,199 +
    # fx.py:72) — replicate the double application so the conv4_1
    # feature space matches bit-for-bit
    ref_feats = vgg(vgg.normalize(ref_chw))[fx_key][0]
    ref_feats = ref_feats.reshape(ref_feats.shape[0], -1)

    trainer.active_sh_degree = trainer.max_sh_degree
    train_cams = scene.get_train_cameras()
    np_rng = np.random.default_rng(0)
    stack = []

    from tqdm import tqdm

    first_iter = args.load_iteration
    bar = tqdm(range(first_iter, opt.iterations), desc="Style transfer")
    ema = 0.0
    for iteration in range(first_iter + 1, opt.iterations + 1):
        if iteration - 1 == args.debug_from and args.debug_from > 0:
            # reference: pipe.debug from this iteration (:173); ours
            # arms the op-by-op NaN locator on the jitted style step
            import jax

            jax.config.update("jax_debug_nans", True)
        if not stack:
            stack = list(train_cams)
        cam = stack.pop(int(np_rng.integers(0, len(stack))))
        rc = cam.to_render_camera()
        new_state, metrics = T.style_phase_step(
            trainer.state, rc.buffers, ref_feats, style_mask,
            jnp.float32(cam.fid), trainer.lr_at(iteration),
            trainer.bg_color,
            deform_net=trainer.deform_net, vgg_ext=vgg,
            image_height=rc.image_height, image_width=rc.image_width,
            sh_degree=trainer.active_sh_degree,
            use_deform=True, is_6dof=dataset.is_6dof,
            fx_key=fx_key, raster_cfg=trainer.raster_cfg,
        )
        trainer.state = new_state
        loss = float(metrics["loss"])
        if metrics["finite"]:
            ema = 0.4 * loss + 0.6 * ema
        if iteration % 10 == 0:
            bar.set_postfix({"Loss": f"{ema:.3f}"})
            bar.update(10)
        if iteration in set(args.save_iterations):
            trainer.save_snapshot(iteration)
    bar.close()
    print("\nTraining complete.")


if __name__ == "__main__":
    main()
