"""Headless viewer + clustering CLI tests: the GUI-replacement workflow
(cluster -> click-select -> removal -> save-object) on a synthetic
3-blob scene, per reference gui.py:248-319,754-839,617-651."""
import os
import sys

import numpy as np
import jax.numpy as jnp
import pytest

from trase_tpu.data.synthetic import make_blob_scene
from trase_tpu.models import gaussians as G
from trase_tpu.models.gaussians_io import load_gaussian_ply, save_gaussian_ply
from trase_tpu.utils.sh import rgb_to_sh

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_model_dir(tmp_path, n_blobs=3, pts=96, seed=0):
    """A trained-model-like dir: snapshot ply with per-blob features."""
    scene = make_blob_scene(n_blobs, pts, seed)
    n = scene["xyz"].shape[0]
    rng = np.random.default_rng(seed + 7)
    # distinct feature direction per blob + small noise, like a trained
    # contrastive feature field
    dirs = rng.normal(size=(n_blobs, G.FEATURE_DIM)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=1, keepdims=True)
    feats = dirs[scene["blob_id"]] + 0.05 * rng.normal(
        size=(n, G.FEATURE_DIM)).astype(np.float32)

    params = G.empty_params(capacity=n, sh_degree=1)
    params = params._replace(
        xyz=jnp.asarray(scene["xyz"]),
        features_dc=jnp.asarray(rgb_to_sh(scene["rgb"]))[:, None, :],
        scaling=jnp.full((n, 3), np.log(scene["scale"])),
        rotation=jnp.zeros((n, 4)).at[:, 0].set(1.0),
        opacity=jnp.full((n, 1), 2.0),  # sigmoid(2) ~ 0.88
        gaussian_features=jnp.asarray(feats),
    )
    aux = G.empty_aux(n)
    aux = aux._replace(alive=jnp.ones((n,), bool))
    ply = os.path.join(tmp_path, "point_cloud", "iteration_100",
                       "point_cloud.ply")
    save_gaussian_ply(ply, params, np.asarray(aux.alive))
    return scene, str(tmp_path)


@pytest.fixture(scope="module")
def model_dir(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("viewer_model")
    return _make_model_dir(tmp)


def test_cluster_cli(model_dir):
    scene, mdir = model_dir
    sys.path.insert(0, REPO)
    import cluster as cluster_cli

    cluster_cli.main(["-m", mdir, "--sample_percent", "1.0"])
    p = os.path.join(mdir, "point_cloud", "iteration_100", "clusters.pt")
    assert os.path.exists(p) or os.path.exists(p + ".npz")

    from trase_tpu.cluster.clustering import load_clusters

    ids, rgb = load_clusters(p)
    n_blobs = scene["centers"].shape[0]
    # each blob should be (nearly) one pure cluster
    for b in range(n_blobs):
        blob_ids = ids[scene["blob_id"] == b]
        top = np.bincount(blob_ids).argmax()
        assert (blob_ids == top).mean() > 0.9


def test_click_select_and_removal(model_dir):
    scene, mdir = model_dir
    from trase_tpu.viewer import HeadlessViewer

    v = HeadlessViewer.from_model_path(mdir, sh_degree=1, W=128, H=128,
                                       radius=3.0,
                                       backend="dense")
    assert v.cluster_ids is not None  # clusters.pt from previous test

    # project blob 0's center through the viewer camera to find a pixel
    cam = v._render_camera()
    c = scene["centers"][0]
    hom = np.array([*c, 1.0], np.float32)
    p = hom @ np.asarray(cam.buffers.full_proj)
    px = ((p[0] / p[3] + 1) * v.W - 1) * 0.5
    py = ((p[1] / p[3] + 1) * v.H - 1) * 0.5
    assert 0 <= px < v.W and 0 <= py < v.H

    cid = v.click_select(px, py)
    assert cid is not None and cid >= 0
    # the selection should cover blob 0 and little else
    sel = np.asarray(v.segmented_mask)[:v.n]
    blob0 = scene["blob_id"] == 0
    assert sel[blob0].mean() > 0.8
    assert sel[~blob0].mean() < 0.1

    # removal: the clicked pixel region turns into background
    before = v.render_frame("Render")
    after = v.render_frame("Render", apply_selection_removal=True)
    iy, ix = int(py), int(px)
    assert before[:, iy, ix].max() > 0.15
    assert after[:, iy, ix].max() < 0.05
    assert v.last_frame_ms > 0

    # save-object writes a ply with only the selected gaussians
    out = v.save_object(os.path.join(mdir, "obj.ply"))
    params2, aux2, n2, _ = load_gaussian_ply(out, sh_degree=1)
    assert abs(n2 - int(sel.sum())) == 0


def test_text_select_with_mask(model_dir):
    scene, mdir = model_dir
    from trase_tpu.viewer import HeadlessViewer

    v = HeadlessViewer.from_model_path(mdir, sh_degree=1, W=128, H=128,
                                       radius=3.0, backend="dense")
    # build a 2D mask from blob 1's actual rendered coverage: render
    # with only blob-1 gaussians and threshold alpha
    import jax.numpy as jnp
    blob1 = jnp.zeros((v.params.xyz.shape[0],), bool).at[:v.n].set(
        jnp.asarray(scene["blob_id"] == 1))
    out, _ = v._raw_frame(mask=blob1)
    mask2d = np.asarray(out["alpha"])[0] > 0.5
    assert mask2d.sum() > 20

    ids = v.text_select(mask2d=mask2d, threshold=int(mask2d.sum() * 0.3))
    assert len(ids) >= 1
    sel = np.asarray(v.segmented_mask)[:v.n]
    b1 = scene["blob_id"] == 1
    assert sel[b1].mean() > 0.8
    assert sel[~b1].mean() < 0.15


def test_viewer_modes_and_orbit(model_dir):
    scene, mdir = model_dir
    from trase_tpu.viewer import HeadlessViewer

    v = HeadlessViewer.from_model_path(mdir, sh_degree=1, W=64, H=64,
                                       radius=3.0, backend="dense")
    for mode in ("Render", "Depth", "Rendered Features", "Point Cloud",
                 "Gaussian Features", "Gaussian Clusters", "Segmentation"):
        img = v.render_frame(mode)
        assert img.shape == (3, 64, 64), mode
        assert np.isfinite(img).all(), mode
    base = v.render_frame("Render")
    v.cam.orbit(400, 0)
    v.cam.scale(1)
    v.cam.pan(10, 10)
    moved = v.render_frame("Render")
    assert np.abs(base - moved).max() > 0.05  # the view actually moved


def test_trajectory_overlay(model_dir):
    """'Visualize Trajectory' parity (reference gui.py:1154-1191):
    FPS-sampled gaussian tracks accumulate over rendered frames and are
    composited as polylines once >= 2 frames exist."""
    scene, mdir = model_dir
    from trase_tpu.viewer import HeadlessViewer

    v = HeadlessViewer.from_model_path(mdir, sh_degree=1, W=64, H=64,
                                       radius=3.0, backend="dense")
    base = v.render_frame("Render")
    assert v.toggle_trajectory(samp_num=8, gs_num=32)
    first = v.render_frame("Render")  # seeds tracks, 1 sample: no lines
    np.testing.assert_allclose(first, base, atol=1e-6)
    assert len(v._traj["history"]) == 1
    assert v._traj["ids"].shape == (32,)
    # no deform net here, so move the camera to bend the projected
    # tracks; the overlay must now touch some pixels
    for _ in range(3):
        v.cam.orbit(120, 40)
        img = v.render_frame("Render")
    assert len(v._traj["history"]) == 4
    moved = v.render_frame("Render")
    assert np.isfinite(moved).all()
    # history capped at samp_num
    for _ in range(8):
        v.render_frame("Render")
    assert len(v._traj["history"]) == 8
    assert not v.toggle_trajectory(on=False)
    assert v._traj is None


def test_viewer_cli_script(model_dir, tmp_path):
    scene, mdir = model_dir
    sys.path.insert(0, REPO)
    import viewer as viewer_cli

    script = tmp_path / "cmds.txt"
    script.write_text(
        "mode Render\nrender\norbit 100 50\nzoom 1\nrender Depth\nfps\n"
        "quit\n")
    out_dir = tmp_path / "frames"
    viewer_cli.main(["-m", mdir, "--W", "64", "--H", "64",
                     "--script", str(script), "--out", str(out_dir)])
    frames = sorted(os.listdir(out_dir))
    assert len(frames) == 2


@pytest.mark.slow
def test_composition(model_dir, tmp_path):
    """Object extraction -> load_object -> render_composite (the
    reference's removal/composition editing workflow:
    gaussian_renderer/__init__.py:251-331, Scene(load_object=...))."""
    scene, mdir = model_dir
    from trase_tpu.viewer import HeadlessViewer

    v = HeadlessViewer.from_model_path(mdir, sh_degree=1, W=96, H=96,
                                       radius=3.0, backend="dense")
    if v.cluster_ids is None:
        v.cluster(sample_percent=1.0)
    v.select_clusters([int(v.cluster_ids[0])])  # blob 0's cluster
    obj_ply = v.save_object(str(tmp_path / "obj.ply"))

    n = v.load_object(obj_ply)
    assert n > 0
    base = v.render_frame("Render")
    comp = v.render_composite_frame(scales_bias=1.0,
                                    motion_bias=(0.6, 0.0, 0.0))
    assert comp.shape == base.shape
    assert np.isfinite(comp).all()
    # the composite contains the duplicated object -> differs from base
    assert np.abs(comp - base).max() > 0.05
    # identity-composite reproduces the plain render closely
    comp_id = v.render_composite_frame()
    lit = base.max(0) > 0.05
    assert np.abs(comp_id - base)[:, lit].mean() < 0.15


def test_web_viewer_server(model_dir):
    """Browser GUI (trase_tpu/viewer_web.py): page + modes + JPEG frames
    + the full command surface over HTTP — the interactive-app analog of
    reference gui.py, exercised through a real (loopback) server."""
    import io
    import json
    import urllib.request

    from PIL import Image

    from trase_tpu.viewer import HeadlessViewer
    from trase_tpu.viewer_web import ViewerServer

    scene, mdir = model_dir
    v = HeadlessViewer.from_model_path(mdir, sh_degree=1, W=96, H=96,
                                       radius=3.0, backend="dense")
    srv = ViewerServer(v)
    port = srv.serve(port=0, block=False)
    base = f"http://127.0.0.1:{port}"

    def get(path):
        with urllib.request.urlopen(base + path, timeout=60) as r:
            return r.headers.get_content_type(), r.read()

    def cmd(**body):
        req = urllib.request.Request(
            base + "/cmd", data=json.dumps(body).encode(),
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=120) as r:
            return json.loads(r.read())

    try:
        ctype, page = get("/")
        assert ctype == "text/html" and b"trase_tpu viewer" in page
        ctype, modes = get("/modes")
        assert json.loads(modes) == list(
            __import__("trase_tpu.viewer", fromlist=["MODES"]).MODES)

        # a frame decodes as a JPEG of the viewer size
        ctype, frame = get("/frame.jpg")
        assert ctype == "image/jpeg"
        im = Image.open(io.BytesIO(frame))
        assert im.size == (96, 96)
        base_px = np.asarray(im, np.float32)

        # navigation + time + mode switching through the API
        st = cmd(cmd="orbit", dx=40, dy=0)
        assert st["ok"]
        st = cmd(cmd="zoom", delta=1)
        st = cmd(cmd="mode", name="Depth")
        assert st["mode"] == "Depth"
        _, dframe = get("/frame.jpg")
        assert np.abs(np.asarray(Image.open(io.BytesIO(dframe)),
                                 np.float32) - base_px).max() > 1
        cmd(cmd="mode", name="Render")

        # click-select the pixel under blob 0, then removal rendering
        assert v.cluster_ids is not None  # clusters.pt from earlier test
        cam = v._render_camera()
        c = scene["centers"][0]
        hom = np.array([*c, 1.0], np.float32)
        p = hom @ np.asarray(cam.buffers.full_proj)
        px = ((p[0] / p[3] + 1) * v.W - 1) * 0.5
        py = ((p[1] / p[3] + 1) * v.H - 1) * 0.5
        st = cmd(cmd="click", px=float(px), py=float(py))
        assert st["selected"], st
        st = cmd(cmd="removal", on=True)
        assert st["removal"] is True
        _, removed = get("/frame.jpg")
        rm = np.asarray(Image.open(io.BytesIO(removed)), np.float32)
        iy, ix = int(py), int(px)
        assert rm[iy, ix].max() < base_px[iy, ix].max()

        st = cmd(cmd="clear")
        assert st["selected"] == [] and st["removal"] is False

        # trajectory overlay toggles over HTTP and frames keep decoding
        st = cmd(cmd="trajectory", on=True)
        assert st["ok"]
        cmd(cmd="orbit", dx=30, dy=10)
        _, tframe = get("/frame.jpg")
        assert Image.open(io.BytesIO(tframe)).size == (96, 96)
        st = cmd(cmd="trajectory", on=False)
        assert st["ok"]

        # unknown commands surface as HTTP 500 with a JSON error
        try:
            cmd(cmd="definitely_not_a_command")
            assert False, "expected HTTPError"
        except urllib.error.HTTPError as e:
            assert e.code == 500
            assert "error" in json.loads(e.read())
    finally:
        srv.shutdown()
