"""Synthetic scene generator (test/bench fixture).

Builds a tiny multi-view "Blender"-format dataset on disk — the same
file layout the reference's readers consume (transforms_train.json /
transforms_test.json with per-frame `time`, points3d.ply, images/,
masks/) — from a procedurally generated dynamic gaussian scene:
K colored blobs orbiting the origin. Ground-truth images are rendered
with the slow reference compositor, masks are per-blob coverage
(stand-ins for SAM masks), so feature-field training has a consistent
weak-supervision signal.
"""
from __future__ import annotations

import functools
import json
import os

import numpy as np

from ..utils.graphics import focal_to_fov, fov_to_focal


def _look_at(eye: np.ndarray, target: np.ndarray, up=np.array([0., 1., 0.])):
    """OpenCV-style W2C rotation/translation for a camera at `eye`."""
    fwd = target - eye
    fwd = fwd / np.linalg.norm(fwd)
    right = np.cross(fwd, up)
    right = right / np.linalg.norm(right)
    down = np.cross(fwd, right)
    R_w2c = np.stack([right, down, fwd], axis=0)  # rows
    t = -R_w2c @ eye
    return R_w2c, t


def make_blob_scene(n_blobs: int = 4, pts_per_blob: int = 64, seed: int = 0):
    """Ground-truth gaussian cloud: n_blobs clusters with distinct colors.

    Returns dict of numpy arrays (xyz, rgb, scale, opacity, blob_id) in
    canonical (t=0) space plus per-blob orbit phase."""
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-0.8, 0.8, size=(n_blobs, 3)).astype(np.float32)
    palette = np.array([
        [0.9, 0.2, 0.2], [0.2, 0.8, 0.3], [0.25, 0.35, 0.95],
        [0.9, 0.8, 0.2], [0.8, 0.3, 0.8], [0.2, 0.8, 0.8],
    ], np.float32)
    xyz, rgb, blob_id = [], [], []
    for b in range(n_blobs):
        p = centers[b] + rng.normal(0, 0.08, size=(pts_per_blob, 3))
        xyz.append(p.astype(np.float32))
        c = palette[b % len(palette)] * rng.uniform(
            0.8, 1.0, size=(pts_per_blob, 1))
        rgb.append(c.astype(np.float32))
        blob_id.append(np.full(pts_per_blob, b, np.int32))
    return {
        "xyz": np.concatenate(xyz),
        "rgb": np.concatenate(rgb),
        "blob_id": np.concatenate(blob_id),
        "centers": centers,
        "scale": np.float32(0.05),
        "opacity": np.float32(0.8),
    }


def deform_blobs(scene: dict, t: float) -> np.ndarray:
    """Time-dependent positions: each blob translates on a small orbit."""
    xyz = scene["xyz"].copy()
    for b, c in enumerate(scene["centers"]):
        phase = 2 * np.pi * (t + b / max(len(scene["centers"]), 1))
        offset = 0.15 * np.array(
            [np.cos(phase), np.sin(phase), 0.0], np.float32)
        xyz[scene["blob_id"] == b] += offset
    return xyz


def render_gt(scene: dict, t: float, R, T, fovx, fovy, h, w,
              bg=(0.0, 0.0, 0.0), fast: bool = False):
    """Render the GT blob cloud.

    fast=False (default): the slow O(N*P) oracle compositor — exact,
    fine for the tiny test fixtures. fast=True: the production tiled
    compositor — required for 1K-resolution / 10k-gaussian GT
    generation (the oracle materializes an (N, P) matrix there), used
    by tools/validate_scale.py. Both share the same compositing
    semantics (tests/test_rasterize.py pins them against each other).
    """
    import jax.numpy as jnp

    from ..renderer import make_render_camera

    cam = make_render_camera(R.T, T, fovx, fovy, h, w)
    xyz = jnp.asarray(deform_blobs(scene, t))
    blob_onehot = jnp.asarray(
        np.eye(scene["centers"].shape[0], dtype=np.float32)[scene["blob_id"]]
    )
    fn = _gt_fn(xyz.shape[0], blob_onehot.shape[1], h, w, fast)
    out_render, cov_feats = fn(
        xyz, jnp.asarray(scene["rgb"]), jnp.float32(scene["scale"]),
        jnp.float32(scene["opacity"]), blob_onehot, cam.buffers,
        jnp.asarray(bg, jnp.float32))
    masks = np.asarray(cov_feats) > 0.3  # (B, H, W)
    return np.asarray(out_render), masks


@functools.lru_cache(maxsize=4)
def _gt_fn(n: int, n_blobs: int, h: int, w: int, fast: bool):
    """Jitted GT project+composite, cached per shape. Un-jitted, each
    view paid per-op dispatch (ruinous through a device tunnel: a
    1008px view took ~2 min even on host CPU)."""
    import jax
    import jax.numpy as jnp

    from ..ops.projection import compute_cov3d, project_gaussians
    from ..ops.rasterize_ref import rasterize_reference

    def run(xyz, rgb, scale, opacity, onehot, buffers, bg):
        from ..renderer import RenderCamera

        cam = RenderCamera(buffers, h, w)
        scales = jnp.full((n, 3), scale)
        rots = jnp.zeros((n, 4)).at[:, 0].set(1.0)
        cov3d = compute_cov3d(scales, rots)
        opac = jnp.full((n,), opacity)
        proj = project_gaussians(xyz, cov3d, opac, cam.buffers, h, w,
                                 colors_precomp=rgb)
        if fast:
            from ..ops.rasterize import RasterConfig, rasterize_tiled

            cfg = RasterConfig()
            out = rasterize_tiled(proj, None, bg, h, w, cfg)
            cov = rasterize_tiled(proj, onehot, bg, h, w, cfg)
        else:
            out = rasterize_reference(proj, None, bg, h, w)
            cov = rasterize_reference(proj, onehot, bg, h, w)
        return out["render"], cov["feats"]

    return jax.jit(run)


def write_synthetic_dataset(
    path: str,
    n_train: int = 10,
    n_test: int = 2,
    image_size: int = 64,
    n_blobs: int = 3,
    pts_per_blob: int = 48,
    radius: float = 3.0,
    seed: int = 0,
    fast_gt: bool = False,
    n_times: int = 0,
):
    """Write a complete Blender-format dataset dir; returns the scene.

    fast_gt: render GT with the production tiled compositor instead of
    the O(N*P) oracle — required at 1K-class resolutions (see
    tools/validate_scale.py).

    n_times: 0 = monocular ring (time == angle, one view per
    timestep); > 0 = Neu3D-style multi-view rig (n_train//n_times
    fixed cameras x n_times timestamps, test cameras at held-out
    angles — novel-view PSNR is then a real reconstruction metric)."""
    from PIL import Image

    from .masks import save_mask_file
    from .ply import write_point_cloud

    scene = make_blob_scene(n_blobs, pts_per_blob, seed)
    h = w = image_size
    fov = 0.8
    os.makedirs(os.path.join(path, "images"), exist_ok=True)
    # the Blender reader resolves masks at <path>/<subdir>/masks/<name>
    os.makedirs(os.path.join(path, "images", "masks"), exist_ok=True)

    def write_split(split: str, n: int, offset: float):
        # view list: monocular-style by default (camera i at angle i/n
        # AND time i/(n-1) — time and angle perfectly correlated, like
        # a handheld capture). With n_times > 0, a Neu3D-style
        # multi-view rig instead: n//n_times fixed cameras each filmed
        # at n_times timestamps (reference scene/dataset_readers.py
        # multi-view transforms; Neu3D holds out whole cameras for
        # test) — each timestep gets several simultaneous views, which
        # is what makes held-out-view PSNR a meaningful reconstruction
        # metric (a monocular ring has exactly one view per timestep,
        # so novel-view eval there measures the 4D ambiguity, not the
        # model).
        if n_times > 0:
            n_cams = max(n // n_times, 1)
            views = [(ci / n_cams + offset,
                      ti / max(n_times - 1, 1))
                     for ci in range(n_cams) for ti in range(n_times)]
        else:
            views = [(i / n + offset, i / max(n - 1, 1))
                     for i in range(n)]
        frames = []
        for i, (frac, t) in enumerate(views):
            theta = 2 * np.pi * frac
            eye = radius * np.array(
                [np.sin(theta), 0.3, np.cos(theta)], np.float64)
            R_w2c, T = _look_at(eye, np.zeros(3))
            img, masks = render_gt(scene, t, R_w2c, T, fov, fov, h, w,
                                   fast=fast_gt)
            # basename must end in 4 digits (the reader parses a frame
            # index from the last 4 chars for end_frame truncation)
            name = f"{split}_{i:04d}"
            arr = (np.clip(img.transpose(1, 2, 0), 0, 1) * 255).astype(
                np.uint8)
            Image.fromarray(arr).save(
                os.path.join(path, "images", f"{name}.png"))
            save_mask_file(
                os.path.join(path, "images", "masks", f"{name}.npz"),
                masks)
            c2w = np.eye(4)
            c2w[:3, :3] = R_w2c.T
            c2w[:3, 3] = -R_w2c.T @ T
            # Blender convention: flip y/z axes (readers flip back)
            c2w[:3, 1:3] *= -1
            frames.append({
                "file_path": f"images/{name}",
                "time": t,
                "transform_matrix": c2w.tolist(),
            })
        payload = {
            "camera_angle_x": fov,
            "frames": frames,
        }
        with open(os.path.join(path, f"transforms_{split}.json"),
                  "w") as f:
            json.dump(payload, f, indent=1)

    write_split("train", n_train, 0.0)
    write_split("test", n_test, 0.031)

    # init point cloud: GT positions + noise (so training has work to do)
    rng = np.random.default_rng(seed + 1)
    pts = scene["xyz"] + rng.normal(0, 0.05, scene["xyz"].shape)
    cols = np.clip(
        scene["rgb"] + rng.normal(0, 0.1, scene["rgb"].shape), 0, 1)
    write_point_cloud(os.path.join(path, "points3d.ply"),
                      pts.astype(np.float32), cols * 255.0)
    return scene
