"""render.py CLI end-to-end: the shell segmentation pipeline
(snapshot -> cluster.py -> render.py --segment_ids/--text_prompt_mask)
produces the Mask-Benchmark artifacts and the text-prompt object stream
(reference render.py:334-396)."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from trase_tpu.data.synthetic import write_synthetic_dataset
from trase_tpu.models import gaussians as G
from trase_tpu.models.gaussians_io import save_gaussian_ply
from trase_tpu.utils.sh import rgb_to_sh

IT = 77


@pytest.fixture(scope="module")
def pipeline_dirs(tmp_path_factory):
    base = tmp_path_factory.mktemp("pipeline")
    src = base / "data"
    mdl = base / "model"
    scene = write_synthetic_dataset(str(src), n_train=4, n_test=2,
                                    image_size=48, n_blobs=3,
                                    pts_per_blob=32)
    # handcraft a "trained" snapshot: GT blobs + per-blob features
    n = scene["xyz"].shape[0]
    rng = np.random.default_rng(11)
    dirs = rng.normal(size=(3, G.FEATURE_DIM)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    feats = dirs[scene["blob_id"]] + 0.05 * rng.normal(
        size=(n, G.FEATURE_DIM)).astype(np.float32)
    params = G.empty_params(capacity=n, sh_degree=1)
    params = params._replace(
        xyz=jnp.asarray(scene["xyz"]),
        features_dc=jnp.asarray(rgb_to_sh(scene["rgb"]))[:, None, :],
        scaling=jnp.full((n, 3), np.log(scene["scale"])),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), 2.0),
        gaussian_features=jnp.asarray(feats),
    )
    alive = np.ones(n, bool)
    ply = os.path.join(mdl, "point_cloud", f"iteration_{IT}",
                       "point_cloud.ply")
    save_gaussian_ply(ply, params, alive)
    return scene, str(src), str(mdl), params


def test_full_segmentation_pipeline(pipeline_dirs, tmp_path):
    scene, src, mdl, params = pipeline_dirs
    import cluster as cluster_cli
    import render as render_cli

    # 1. cluster
    cluster_cli.main(["-m", mdl, "--sample_percent", "1.0"])
    from trase_tpu.cluster.clustering import load_clusters

    ids, _ = load_clusters(os.path.join(
        mdl, "point_cloud", f"iteration_{IT}", "clusters.pt"))
    blob0_cluster = int(np.bincount(ids[scene["blob_id"] == 0]).argmax())
    blob1_cluster = int(np.bincount(ids[scene["blob_id"] == 1]).argmax())

    # 2. a text-prompt 2D mask: blob 1's coverage in the first test view
    #    rendered through the same camera stack
    from trase_tpu.config import ModelParams
    from trase_tpu.data.scene import Scene
    from trase_tpu.renderer import render

    class _A:
        sh_degree = 1
        source_path = src
        model_path = mdl
        images = "images"
        resolution = -1
        white_background = False
        eval = True
        load2gpu_on_the_fly = False
        is_blender = True
        is_6dof = False
        load_mask_on_the_fly = False
        load_image_on_the_fly = False
        end_frame = -1
        mask_black_bg = False

    sc = Scene(_A(), load_iteration=IT, shuffle=False)
    view = sc.get_test_cameras()[0]
    rc = view.to_render_camera()
    capacity = sc.gaussian_params.xyz.shape[0]
    blob1 = jnp.zeros((capacity,), bool).at[:len(scene["blob_id"])].set(
        jnp.asarray(scene["blob_id"] == 1))
    out = render(rc, sc.gaussian_params, sc.gaussian_aux.alive,
                 jnp.zeros(3), mask=blob1, with_features=False,
                 backend="dense")
    mask2d = np.asarray(out["alpha"])[0] > 0.5
    assert mask2d.sum() > 10
    from PIL import Image

    mask_png = str(tmp_path / "blob1_mask.png")
    Image.fromarray((mask2d * 255).astype(np.uint8)).save(mask_png)

    # 3. render CLI with both segment_ids and the text mask
    render_cli.main([
        "-s", src, "-m", mdl, "--iteration", str(IT), "--skip_train",
        "--sh_degree", "1", "--is_blender", "--eval",
        "--segment_ids", str(blob0_cluster),
        "--text_prompt_mask", mask_png,
        "--threshold", str(max(int(mask2d.sum() * 0.2), 5)),
        "--max_per_tile", "128", "--pairs_per_gaussian", "16",
    ])

    base = os.path.join(mdl, "test", f"ours_{IT}")
    for stream in ("renders", "pred_masks", "segment_objects"):
        files = [f for f in os.listdir(os.path.join(base, stream))
                 if f.endswith(".png")]
        assert len(files) == 2, stream

    # text-prompt object stream exists and contains blob 1 only
    tdir = os.path.join(base, "text_prompt_blob1_mask_objects")
    assert os.path.isdir(tdir), os.listdir(base)
    files = sorted(f for f in os.listdir(tdir) if f.endswith(".png"))
    assert len(files) == 2
    with Image.open(os.path.join(tdir, files[0])) as im:
        timg = np.asarray(im, np.float32) / 255.0
    lit = timg.max(axis=-1) > 0.1
    # lit pixels should substantially overlap the blob-1 mask
    assert lit.sum() > 10
    assert (lit & mask2d).sum() / max(lit.sum(), 1) > 0.6

    # pred_masks binarization: first view's predicted mask overlaps
    # blob 0's real coverage
    blob0 = jnp.zeros((capacity,), bool).at[:len(scene["blob_id"])].set(
        jnp.asarray(scene["blob_id"] == 0))
    out0 = render(rc, sc.gaussian_params, sc.gaussian_aux.alive,
                  jnp.zeros(3), mask=blob0, with_features=False,
                  backend="dense")
    gt0 = np.asarray(out0["alpha"])[0] > 0.5
    with Image.open(os.path.join(base, "pred_masks", "00000.png")) as im:
        pm = np.asarray(im.convert("L"), np.float32) / 255.0 > 0.5
    inter = (pm & gt0).sum()
    union = (pm | gt0).sum()
    assert inter / max(union, 1) > 0.5  # IoU with the true object
