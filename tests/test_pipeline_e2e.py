"""End-to-end L7->L4->L5 pipeline: converter -> reader -> trainer.

Covers the reference chain as ONE pipeline on a fixture-sized input
(reference: neu3d2blender.py -> scene/dataset_readers.py:238-388 ->
train.py): a fabricated LLFF `poses_bounds.npy` plus pre-extracted
frames run through the actual `neu3d2blender` CLI (COLMAP is absent in
this env, so the --random_points init path), the converted transforms
are read back through the production Scene/reader stack, GT images
consistent with the CONVERTED poses are rendered from the synthetic
blob scene, and a short GAUSSIAN-phase training run must reduce loss
and reach a sane novel-view PSNR.
"""
from __future__ import annotations

import json
import os

import numpy as np
import pytest

from trase_tpu.utils.graphics import focal_to_fov, fov_to_focal

SIZE = 64
N_CAMS = 4
N_FRAMES = 3
FOV = 0.8


def _nerf_to_llff(P: np.ndarray) -> np.ndarray:
    """Exact inverse of tools.convert.llff_to_nerf_poses's linear ops
    (one 4x4 NeRF-convention c2w -> one LLFF 3x4)."""
    Q = P.copy()
    Q[2, :] *= -1
    Q = Q[[1, 0, 2, 3], :]
    Q[0:3, 1] *= -1
    Q[0:3, 2] *= -1
    M = Q[:3, :4]
    return np.stack([M[:, 1], M[:, 0], -M[:, 2], M[:, 3]], axis=1)


def _orbit_c2w(i: int, n: int, radius: float = 4.0) -> np.ndarray:
    """OpenGL-convention c2w looking at the origin."""
    theta = 2 * np.pi * i / n
    eye = radius * np.array(
        [np.sin(theta), 0.3, np.cos(theta)], np.float64)
    fwd = -eye / np.linalg.norm(eye)
    right = np.cross(fwd, [0.0, 1.0, 0.0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def test_llff_pose_roundtrip():
    """The fixture's LLFF encoding inverts the converter's pose math."""
    from trase_tpu.tools.convert import llff_to_nerf_poses

    fl = fov_to_focal(FOV, SIZE)
    rows = []
    for i in range(N_CAMS):
        L = _nerf_to_llff(_orbit_c2w(i, N_CAMS))
        hwf = np.array([[SIZE], [SIZE], [fl]])
        rows.append(np.concatenate(
            [np.concatenate([L, hwf], axis=1).ravel(), [2.0, 6.0]]))
    poses, (H, W, f) = llff_to_nerf_poses(np.stack(rows))
    assert (H, W) == (SIZE, SIZE) and abs(f - fl) < 1e-6
    for i in range(N_CAMS):
        np.testing.assert_allclose(poses[i], _orbit_c2w(i, N_CAMS),
                                   atol=1e-12)


@pytest.mark.slow
def test_converter_reader_train_chain(tmp_path):
    import jax.numpy as jnp

    import neu3d2blender
    from trase_tpu.config import (
        ModelParams, OptimizationParams, PipelineParams,
    )
    from trase_tpu.data.masks import save_mask_file
    from trase_tpu.data.ply import write_point_cloud
    from trase_tpu.data.scene import Scene
    from trase_tpu.data.synthetic import make_blob_scene, render_gt
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    scene_dir = str(tmp_path / "scene")
    img_dir = os.path.join(scene_dir, "images")
    os.makedirs(img_dir)

    # ---- L7 input: per-camera frames (pre-extracted; no mp4s in the
    # fixture so the converter's video loop is a no-op) + LLFF poses
    from PIL import Image

    for c in range(N_CAMS):
        for t in range(N_FRAMES):
            Image.fromarray(np.zeros((SIZE, SIZE, 3), np.uint8)).save(
                os.path.join(img_dir, f"cam{c:02d}_{t:04d}.png"))
    fl = fov_to_focal(FOV, SIZE)
    rows = []
    for i in range(N_CAMS):
        L = _nerf_to_llff(_orbit_c2w(i, N_CAMS))
        hwf = np.array([[SIZE], [SIZE], [fl]])
        rows.append(np.concatenate(
            [np.concatenate([L, hwf], axis=1).ravel(), [2.0, 6.0]]))
    np.save(os.path.join(scene_dir, "poses_bounds.npy"), np.stack(rows))

    # ---- L7: the actual converter CLI (random init cloud: no COLMAP)
    neu3d2blender.main(["--path", scene_dir, "--random_points"])

    with open(os.path.join(scene_dir, "transforms_train.json")) as f:
        train_meta = json.load(f)
    with open(os.path.join(scene_dir, "transforms_test.json")) as f:
        test_meta = json.load(f)
    # camera 00 is the test split (reference neu3d2blender convention)
    assert all("cam00" in fr["file_path"] for fr in test_meta["frames"])
    assert len(test_meta["frames"]) == N_FRAMES
    assert len(train_meta["frames"]) == (N_CAMS - 1) * N_FRAMES
    for k in ("w", "h", "fl_x", "fl_y", "cx", "cy"):
        assert k in train_meta
    assert os.path.exists(os.path.join(scene_dir, "points3d.ply"))

    # ---- make the fixture self-consistent: render GT from the
    # CONVERTED poses (recenter_rescale moved the world, so the blob
    # scene is defined in the converter's output frame)
    blob = make_blob_scene(n_blobs=3, pts_per_blob=48, seed=3)
    fovx = focal_to_fov(train_meta["fl_x"], SIZE)
    os.makedirs(os.path.join(scene_dir, "masks"))
    for meta in (train_meta, test_meta):
        for fr in meta["frames"]:
            c2w = np.array(fr["transform_matrix"])
            c2w[:3, 1:3] *= -1  # the reader's OpenGL->COLMAP flip
            w2c = np.linalg.inv(c2w)
            img, masks = render_gt(blob, fr["time"], w2c[:3, :3],
                                   w2c[:3, 3], fovx, fovx, SIZE, SIZE)
            base = fr["file_path"].split("/")[-1]
            arr = (np.clip(img.transpose(1, 2, 0), 0, 1) * 255
                   ).astype(np.uint8)
            Image.fromarray(arr).save(
                os.path.join(img_dir, base + ".png"))
            save_mask_file(
                os.path.join(scene_dir, "masks", base + ".npz"), masks)
    # init cloud = noisy GT points so the short schedule converges
    rng = np.random.default_rng(0)
    write_point_cloud(
        os.path.join(scene_dir, "points3d.ply"),
        (blob["xyz"] + rng.normal(0, 0.05, blob["xyz"].shape)
         ).astype(np.float32),
        np.clip(blob["rgb"] + rng.normal(0, 0.1, blob["rgb"].shape),
                0, 1) * 255.0)

    # ---- L4 -> L5: production Scene + Trainer
    dataset = ModelParams(source_path=scene_dir,
                          model_path=str(tmp_path / "model"), eval=True)
    opt = OptimizationParams(
        iterations=120, warm_up=40, warm_up_3d_features=10_000,
        densify_from_iter=30, densify_until_iter=100,
        densification_interval=50, position_lr_max_steps=120,
        deform_lr_max_steps=120)
    scene = Scene(dataset, resolution_scales=(1.0,))
    cams = scene.get_train_cameras()
    assert len(cams) == (N_CAMS - 1) * N_FRAMES
    assert all(c.mask_path for c in cams)  # neu3d mask layout resolved
    # fid normalization: neu3d divides `time` by the 10 s clip length
    assert max(c.fid for c in cams) == pytest.approx(
        (N_FRAMES - 1) / 30.0 / 10.0)

    trainer = Trainer(dataset, opt, PipelineParams(), scene,
                      raster_cfg=RasterConfig(pairs_per_gaussian=8,
                                              max_per_tile=256),
                      max_new_per_densify=512, seed=0)
    losses = []
    trainer.train(progress=False,
                  on_iteration=lambda tr, it, m:
                  losses.append(float(m["loss"])))
    assert np.isfinite(losses).all()
    assert np.mean(losses[-10:]) < np.mean(losses[:10])
    psnr = trainer.evaluate(120)
    assert psnr > 15.0, psnr
