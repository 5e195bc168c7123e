#!/usr/bin/env python
"""Offline rendering / benchmark-artifact CLI.

Mirrors the reference render.py output surface: per split it writes
renders/, gt/, rendered_feats/ (PCA-colored), canonical/, pointcloud/,
gaussian_clusters/, segmentation/, gaussian_feats/, and — with
--segment_ids — pred_masks/ + segment_objects/ (the Mask-Benchmark
artifacts), plus mp4 videos of each stream.

Text prompts: the reference drives GroundingDINO+SAM to produce a 2D
mask from a phrase (render.py:172-232). Those networks are not in this
environment; the same 3D-lookup path (depth unproject -> KNN K=1 ->
cluster-id bincount) is exposed via --text_prompt_mask, a path to a
binary mask PNG of the first view's render, and auto-switches to
Grounded-SAM when those packages exist.
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np


def render_sets(args):
    import jax
    import jax.numpy as jnp

    from trase_tpu.cluster import load_clusters, postprocessing
    from trase_tpu.config import ModelParams, PipelineParams
    from trase_tpu.data.scene import Scene
    from trase_tpu.models.deform import (
        deform_step, make_deform_network,
    )
    from trase_tpu.models.gaussians_io import load_checkpoint
    from trase_tpu.ops.knn import knn
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import render
    from trase_tpu.viz import (
        AsyncImageWriter, feature3d_to_rgb, point_splat, to8b,
        write_video,
    )
    from trase_tpu import models as _m  # noqa: F401
    from trase_tpu.models import gaussians as G

    dataset = ModelParams.extract(args)
    scene = Scene(dataset, load_iteration=args.iteration, shuffle=False)
    it = scene.loaded_iter

    params, aux = scene.gaussian_params, scene.gaussian_aux
    n = scene.n_gaussians
    capacity = params.xyz.shape[0]

    # clusters (render.py:498-509)
    cdir = os.path.join(dataset.model_path, "point_cloud",
                        f"iteration_{it}")
    cluster_ids = cluster_rgb = None
    for name in (("clusters_kmeans.pt",) if args.use_kmeans
                 else ("clusters.pt", "clusters_kmeans.pt")):
        p = os.path.join(cdir, name)
        if os.path.exists(p) or os.path.exists(p + ".npz"):
            ids, rgb = load_clusters(p)
            cluster_ids = np.full(capacity, -1, np.int64)
            cluster_ids[:len(ids)] = ids
            cluster_rgb = np.zeros((capacity, 3), np.float32)
            cluster_rgb[:len(rgb)] = rgb
            print(f"Load clusters from {name}")
            break
    if cluster_ids is None:
        print("[Warning] No clusters found...")

    deform_net = make_deform_network(
        args.model_type, is_blender=dataset.is_blender,
        is_6dof=dataset.is_6dof)
    dpath = os.path.join(dataset.model_path, "deform",
                         f"iteration_{it}", "deform.pkl")
    deform_vars = None
    if os.path.exists(dpath):
        deform_vars = jax.tree_util.tree_map(
            jnp.asarray, load_checkpoint(dpath)["vars"])
    else:
        print(f"[Warning] no deform weights at {dpath}; rendering "
              "canonical only")

    bg = jnp.asarray([1.0, 1.0, 1.0] if dataset.white_background
                     else [0.0, 0.0, 0.0], jnp.float32)
    cfg = RasterConfig(pairs_per_gaussian=args.pairs_per_gaussian,
                       max_per_tile=args.max_per_tile,
                       pack_features=getattr(args, "pack_features",
                                             False))
    feats = np.asarray(params.gaussian_features)[:capacity]
    pca_rgb = np.asarray(feature3d_to_rgb(jnp.asarray(feats[:n])))
    pca_full = np.zeros((capacity, 3), np.float32)
    pca_full[:n] = pca_rgb

    sh_degree = dataset.sh_degree

    def run_split(name, views):
        if not views:
            return
        base = os.path.join(dataset.model_path, name, f"ours_{it}")
        streams = ["renders", "gt", "rendered_feats", "canonical",
                   "pointcloud", "gaussian_clusters", "segmentation",
                   "gaussian_feats", "segment_objects", "pred_masks"]
        text_stream = None
        if args.text_prompt or args.text_prompt_mask:
            tag = args.text_prompt or os.path.splitext(
                os.path.basename(args.text_prompt_mask))[0]
            text_stream = f"text_prompt_{tag}_objects"
            streams.append(text_stream)
        for s in streams:
            os.makedirs(os.path.join(base, s), exist_ok=True)
        videos = {s: [] for s in streams}
        # reference --multithread_save / multithread_write
        # (render.py:61-81,539): the CLI default is serial like the
        # reference; programmatic callers without the attr (tests,
        # library use) keep the threaded writer
        writer = AsyncImageWriter(
            multithread=getattr(args, "multithread_save", True))
        save_image = writer.submit

        # save the raw 3D features for downstream tools
        np.save(os.path.join(base, "rendered_feats",
                             "gaussian_feats3d.npy"), feats[:n])

        H = views[0].image_height
        W = views[0].image_width

        import functools

        from trase_tpu.renderer import RenderCamera

        @functools.partial(jax.jit, static_argnames=("use_override",))
        def _frame_jit(params, d_xyz, d_rot, d_scale, cam_buffers,
                       override_color, mask, bg_color, *, use_override):
            camera = RenderCamera(cam_buffers, H, W)
            return render(
                camera, params, aux.alive, bg_color,
                d_xyz, d_rot, d_scale,
                is_6dof=dataset.is_6dof, sh_degree=sh_degree,
                override_color=override_color if use_override else None,
                mask=mask, with_features=False, raster_cfg=cfg,
            )

        zero_d = (jnp.zeros((capacity, 3)), jnp.zeros((capacity, 4)),
                  jnp.zeros((capacity, 3)))
        all_true = jnp.ones((capacity,), bool)
        dummy_color = jnp.zeros((capacity, 3))

        def render_frame(params, d, cam, override_color=None, mask=None,
                         bg_override=None):
            rc = cam.to_render_camera()
            d3 = zero_d if not isinstance(d[0], jnp.ndarray) else d
            return _frame_jit(
                params, d3[0], d3[1], d3[2], rc.buffers,
                dummy_color if override_color is None else override_color,
                all_true if mask is None else mask,
                bg if bg_override is None else bg_override,
                use_override=override_color is not None,
            )

        segmented_mask = None
        if args.segment_ids is not None and cluster_ids is not None:
            feats_n = feats
            for sid in args.segment_ids:
                pre = cluster_ids == sid
                if not pre.any():
                    continue
                query = feats_n[pre].mean(axis=0)
                post = pre & postprocessing(
                    feats_n, query, score_threshold=args.score_threshold)
                segmented_mask = (post if segmented_mask is None
                                  else segmented_mask | post)
            if segmented_mask is not None:
                segmented_mask = jnp.asarray(segmented_mask)

        from tqdm import tqdm

        text_cls_ids = None
        text_mask = None
        for idx, view in enumerate(tqdm(views,
                                        desc=f"Rendering {name}")):
            fid = jnp.float32(view.fid)
            if deform_vars is not None:
                t = jnp.full((capacity, 1), 0.0) + fid
                if args.model_type == "DeformSemanticNetwork":
                    d = deform_step(deform_net, deform_vars, params.xyz,
                                    t, params.gaussian_features)
                else:
                    d = deform_step(deform_net, deform_vars, params.xyz, t)
            else:
                d = (0.0, 0.0, 0.0)

            out = render_frame(params, d, view)
            rendering = np.asarray(out["render"])
            save_image(os.path.join(base, "renders", f"{idx:05d}.png"),
                       rendering)
            videos["renders"].append(to8b(rendering))

            # text prompt -> 3D cluster lookup on the first frame
            if idx == 0 and (args.text_prompt_mask or args.text_prompt):
                mask2d = _resolve_text_mask(args, rendering, base)
                if mask2d is not None and cluster_ids is not None:
                    depth = np.asarray(out["depth"])[0]
                    pts3d = _unproject(mask2d, depth, view)
                    d_xyz = d[0] if deform_vars is not None else 0.0
                    deformed = np.asarray(params.xyz + d_xyz)
                    _, nn_idx = knn(jnp.asarray(pts3d),
                                    jnp.asarray(deformed), k=1)
                    cls = cluster_ids[np.asarray(nn_idx)[:, 0]]
                    counts = np.bincount(cls[cls >= 0])
                    text_cls_ids = np.nonzero(
                        counts > args.threshold)[0].tolist()
                    print("Text prompt cls id: ", text_cls_ids)
                    # cluster-membership + cosine refinement mask
                    # (reference render.py:371-380)
                    for tid in text_cls_ids:
                        pre = cluster_ids == tid
                        if not pre.any():
                            continue
                        post = pre & postprocessing(
                            feats, feats[pre].mean(axis=0),
                            score_threshold=args.score_threshold)
                        text_mask = (post if text_mask is None
                                     else text_mask | post)
                    if text_mask is not None:
                        text_mask = jnp.asarray(text_mask)

            # PCA feature render (override_color path)
            rf = render_frame(params, d, view,
                              override_color=jnp.asarray(pca_full))
            save_image(os.path.join(base, "rendered_feats",
                                    f"{idx:05d}.png"),
                       np.asarray(rf["render"]))
            videos["rendered_feats"].append(to8b(rf["render"]))

            # point splats
            d_xyz = d[0] if deform_vars is not None else 0.0
            deformed = np.asarray(params.xyz + d_xyz)[:n]
            rc = view.to_render_camera()
            fp = np.asarray(rc.buffers.full_proj)
            pc_img = point_splat(deformed, fp, H, W, None,
                                 dataset.white_background)
            save_image(os.path.join(base, "pointcloud",
                                    f"{idx:05d}.png"), pc_img)
            videos["pointcloud"].append(to8b(pc_img))

            gf_img = point_splat(deformed, fp, H, W, pca_full[:n],
                                 dataset.white_background)
            save_image(os.path.join(base, "gaussian_feats",
                                    f"{idx:05d}.png"), gf_img)
            videos["gaussian_feats"].append(to8b(gf_img))

            if cluster_rgb is not None:
                gc_img = point_splat(deformed, fp, H, W,
                                     cluster_rgb[:n],
                                     dataset.white_background)
                save_image(os.path.join(base, "gaussian_clusters",
                                        f"{idx:05d}.png"), gc_img)
                videos["gaussian_clusters"].append(to8b(gc_img))

                seg = render_frame(
                    params, d, view,
                    override_color=jnp.asarray(cluster_rgb))
                save_image(os.path.join(base, "segmentation",
                                        f"{idx:05d}.png"),
                           np.asarray(seg["render"]))
                videos["segmentation"].append(to8b(seg["render"]))

            if idx == 0:
                canon = render_frame(params, (0.0, 0.0, 0.0), view)
                save_image(os.path.join(base, "canonical",
                                        f"{idx:05d}.png"),
                           np.asarray(canon["render"]))

            # ground truth
            gt = view.image
            if gt is None and view.image_path:
                from PIL import Image as PILImage

                with PILImage.open(view.image_path) as im:
                    gt = np.asarray(im.convert("RGB"),
                                    np.float32).transpose(2, 0, 1) / 255.0
            if gt is not None:
                save_image(os.path.join(base, "gt", f"{idx:05d}.png"), gt)
                videos["gt"].append(to8b(gt))

            # segment_ids -> pred_masks + segment_objects
            #   (render.py:334-366)
            if segmented_mask is not None:
                white = jnp.ones((capacity, 3), jnp.float32)
                pm = render_frame(params, d, view, override_color=white,
                                  mask=segmented_mask,
                                  bg_override=jnp.zeros(3))
                buf = np.array(pm["render"])
                buf[buf < 0.5] = 0
                buf[buf != 0] = 1
                inlier = buf.mean(axis=0).astype(bool)
                save_image(os.path.join(base, "pred_masks",
                                        f"{idx:05d}.png"), buf)
                videos["pred_masks"].append(to8b(buf))

                so = render_frame(params, d, view, mask=segmented_mask)
                so_img = np.array(so["render"])
                so_img[:, ~inlier] = 1.0 if dataset.white_background else 0.0
                save_image(os.path.join(base, "segment_objects",
                                        f"{idx:05d}.png"), so_img)
                videos["segment_objects"].append(to8b(so_img))

            # text-prompt selected object (reference render.py:368-396):
            # binarized white render -> inlier mask -> masked RGB with
            # background pixels forced to bg color
            if text_mask is not None and text_stream is not None:
                white = jnp.ones((capacity, 3), jnp.float32)
                tp = render_frame(params, d, view, override_color=white,
                                  mask=text_mask)
                tbuf = np.array(tp["render"])
                tbuf[tbuf < 0.5] = 0
                tbuf[tbuf != 0] = 1
                t_inlier = tbuf.mean(axis=0).astype(bool)
                to_img = np.array(
                    render_frame(params, d, view, mask=text_mask)["render"])
                to_img[:, ~t_inlier] = (1.0 if dataset.white_background
                                        else 0.0)
                save_image(os.path.join(base, text_stream,
                                        f"{idx:05d}.png"), to_img)
                videos[text_stream].append(to8b(to_img))

        writer.close()
        for s, frames in videos.items():
            if frames:
                write_video(os.path.join(base, f"video_{s}.mp4"), frames)

    if not args.skip_train:
        run_split("train", scene.get_train_cameras())
    if not args.skip_test:
        run_split("test", scene.get_test_cameras())


def _resolve_text_mask(args, rendering, base):
    """2D text mask: Grounded-SAM when available, else a mask file."""
    if args.text_prompt:
        try:
            from trase_tpu.ext.grounded_sam import text_prompt_mask

            return text_prompt_mask(args.text_prompt, rendering)
        except ImportError:
            print("[Warning] Grounded-SAM unavailable; pass "
                  "--text_prompt_mask <png> instead")
    if args.text_prompt_mask:
        from PIL import Image as PILImage

        with PILImage.open(args.text_prompt_mask) as im:
            m = np.asarray(im.convert("L")) > 127
        return m
    return None


def _unproject(mask2d, depth, view):
    """Depth unprojection of masked pixels (render.py:208-220)."""
    rc = view.to_render_camera()
    H, W = view.image_height, view.image_width
    ys, xs = np.nonzero(mask2d)
    d = depth[ys, xs]
    znear, zfar = view.znear, view.zfar
    z = zfar / (zfar - znear) * d - zfar * znear / (zfar - znear)
    uvz = np.stack([
        ((xs - 0.5) / W * 2 - 1) * d,
        ((ys - 0.5) / H * 2 - 1) * d,
        z, d,
    ], axis=1)
    inv = np.linalg.inv(np.asarray(rc.buffers.full_proj))
    return (uvz @ inv)[:, :3]


def main(argv=None):
    from trase_tpu.config import (
        ModelParams, PipelineParams, get_combined_args,
    )

    parser = argparse.ArgumentParser(description="Testing script parameters")
    ModelParams.add_to_parser(parser, sentinel=True)
    PipelineParams.add_to_parser(parser)
    parser.add_argument("--iteration", default=-1, type=int)
    parser.add_argument("--skip_train", action="store_true")
    parser.add_argument("--skip_test", action="store_true")
    parser.add_argument("--quiet", action="store_true")
    parser.add_argument("--model_type", default="DeformNetwork", type=str)
    parser.add_argument("--segment_ids", nargs="+", type=int, default=None)
    parser.add_argument("--text_prompt", type=str, default="")
    parser.add_argument("--text_prompt_mask", type=str, default="")
    parser.add_argument("--threshold", type=int, default=500)
    parser.add_argument("--score_threshold", type=float, default=0.0)
    parser.add_argument("--use_kmeans", action="store_true")
    parser.add_argument("--multithread_save", action="store_true",
                        default=False)
    parser.add_argument("--pack_features", action="store_true")
    parser.add_argument("--max_per_tile", type=int, default=1024)
    parser.add_argument("--pairs_per_gaussian", type=int, default=8)
    args = get_combined_args(parser, argv)
    # fill defaults the saved cfg may not contain
    for f in ("sh_degree", "white_background", "is_blender", "is_6dof",
              "eval", "load2gpu_on_the_fly", "load_image_on_the_fly",
              "load_mask_on_the_fly", "end_frame", "mask_black_bg",
              "images", "resolution", "data_device"):
        if not hasattr(args, f):
            setattr(args, f, ModelParams.__dataclass_fields__[f].default)
    print("Rendering " + args.model_path)
    render_sets(args)


if __name__ == "__main__":
    main()
