"""End-to-end training-loop smoke tests on the synthetic blob dataset.

Covers the reference training() behavior (train.py:76-398): GAUSSIAN
photometric phase, FEATURE contrastive phase with phase switching,
densification, and snapshot saving — at toy sizes on the CPU backend.
"""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


class _Args:
    """Minimal ModelParams-alike for Scene/Trainer."""

    def __init__(self, source_path, model_path):
        self.sh_degree = 1
        self.source_path = source_path
        self.model_path = model_path
        self.images = "images"
        self.resolution = -1
        self.white_background = False
        self.eval = True
        self.load2gpu_on_the_fly = False
        self.is_blender = True
        self.is_6dof = False
        self.load_mask_on_the_fly = False
        self.load_image_on_the_fly = False
        self.end_frame = -1
        self.mask_black_bg = False


class _Opt:
    iterations = 40
    warm_up = 6
    deform_lr_max_steps = 40
    position_lr_init = 0.00016
    position_lr_final = 0.0000016
    position_lr_delay_mult = 0.01
    position_lr_max_steps = 40
    feature_lr = 0.0025
    opacity_lr = 0.05
    scaling_lr = 0.005
    rotation_lr = 0.001
    percent_dense = 0.01
    lambda_dssim = 0.2
    densification_interval = 10
    opacity_reset_interval = 1000
    densify_from_iter = 4
    densify_until_iter = 30
    densify_grad_threshold = 0.0002
    warm_up_3d_features = 16
    iterative_opt_interval = 8
    monitor_mem = False
    lambda_reg_deform = 0.0
    num_kmeans = 16
    num_neighbors = 128
    deform_type = "DeformNetwork"
    num_sampled_pixels = 256
    smooth_K = 4
    rfn = 1.0
    num_sampled_masks = 8
    contrastive_mode = "soft"
    hard_positive_th = 0.75
    hard_negative_th = 0.5


class _Pipe:
    convert_SHs_python = False
    compute_cov3D_python = False
    debug = False


@pytest.fixture(scope="module")
def synth_dir(tmp_path_factory):
    from trase_tpu.data.synthetic import write_synthetic_dataset

    d = tmp_path_factory.mktemp("synth")
    write_synthetic_dataset(str(d), n_train=6, n_test=2, image_size=48,
                            n_blobs=3, pts_per_blob=32)
    return str(d)


@pytest.mark.slow
def test_train_loop_two_phases(synth_dir, tmp_path):
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine import trainer as T
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.models import gaussians as G
    from trase_tpu.ops.rasterize import RasterConfig

    args = _Args(synth_dir, str(tmp_path / "model"))
    scene = Scene(args, resolution_scales=(1.0,))
    assert scene.cameras_extent > 0
    assert len(scene.get_train_cameras()) == 6
    assert len(scene.get_test_cameras()) == 2

    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=128, tile_batch=4)
    tr = Trainer(args, _Opt(), _Pipe(), scene, raster_cfg=cfg,
                 max_new_per_densify=64)

    losses = []
    phases = []
    points = []

    def record(t, iteration, metrics):
        losses.append(float(metrics["loss"]))
        phases.append(t.opt_state.state)
        points.append(int(G.num_alive(t.state.aux)))

    tr.train(first_iter=0, saving_iterations={40}, progress=False,
             on_iteration=record)

    assert len(losses) == 40
    assert all(np.isfinite(losses))
    # both phases ran after warm_up_3d_features
    assert T.GAUSSIAN in phases and T.FEATURE in phases
    # densification actually fired on the under-trained scene (early
    # screen-space grads far exceed the reference threshold)
    assert points[-1] > points[0]
    # photometric loss goes down over the gaussian warm-up. Window ends
    # before the first densify (iteration 10): newly injected gaussians
    # reset optimizer rows and transiently bump the loss, same as the
    # reference.
    early = np.mean(losses[:5])
    assert np.mean(losses[6:10]) < early

    # snapshot artifacts exist and reload
    ply = os.path.join(args.model_path, "point_cloud", "iteration_40",
                       "point_cloud.ply")
    assert os.path.exists(ply)
    from trase_tpu.models.gaussians_io import load_gaussian_ply

    params, aux, n, has_cls = load_gaussian_ply(ply, sh_degree=1)
    assert n == int(G.num_alive(tr.state.aux))
    deform = os.path.join(args.model_path, "deform", "iteration_40",
                          "deform.pkl")
    assert os.path.exists(deform)


def test_train_loop_smoke(synth_dir, tmp_path):
    """Fast default-suite cousin of test_train_loop_two_phases (slow):
    a GAUSSIAN-only run short enough to compile just one step function,
    checking the loop runs, losses are finite and decreasing, and the
    snapshot lands."""
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    args = _Args(synth_dir, str(tmp_path / "model_smoke"))
    opt = _Opt()
    opt.iterations = 8
    opt.warm_up = 2
    opt.warm_up_3d_features = 100  # never switches to FEATURE
    opt.densify_until_iter = 0  # no densify compile
    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=128,
                       tile_batch=4)
    # Scene shuffles cameras with the GLOBAL random module (reference
    # scene/__init__.py:91 under safe_state's random.seed(0); our
    # train.py seeds the same way). Earlier tests in a full-suite run
    # consume global-random state, which reorders the 8 sampled views
    # and flips the marginal loss-decrease assertion below — pin it.
    import random

    random.seed(0)
    tr = Trainer(args, opt, _Pipe(), scene := Scene(
        args, resolution_scales=(1.0,)), raster_cfg=cfg)

    losses = []
    tr.train(first_iter=0, saving_iterations={8}, progress=False,
             on_iteration=lambda t, i, m: losses.append(
                 float(m["loss"])))
    assert len(losses) == 8
    assert all(np.isfinite(losses))
    assert np.mean(losses[-3:]) < np.mean(losses[:3])
    assert os.path.exists(os.path.join(
        args.model_path, "point_cloud", "iteration_8", "point_cloud.ply"))


def test_pair_budget_auto_escalation(synth_dir, tmp_path):
    """Persistent pair-budget overflow doubles pairs_per_gaussian
    toward the reference's unbounded-coverage semantics (capped at
    max_pairs_per_gaussian), and transient overflow resets strikes."""
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    args = _Args(synth_dir, str(tmp_path / "model_esc"))
    scene = Scene(args, resolution_scales=(1.0,))
    tr = Trainer(args, _Opt(), _Pipe(), scene,
                 raster_cfg=RasterConfig(pairs_per_gaussian=4,
                                         max_per_tile=128, tile_batch=4))
    tr.max_pairs_per_gaussian = 8
    n = int(np.asarray(tr.state.aux.alive).sum())
    heavy = 0.5 * n * 4  # 50% of budget dropped
    tr._handle_overflow(100, heavy)
    assert tr.raster_cfg.pairs_per_gaussian == 4  # one strike only
    tr._handle_overflow(200, heavy)
    assert tr.raster_cfg.pairs_per_gaussian == 8  # escalated
    # capped: no escalation past max_pairs_per_gaussian
    tr._handle_overflow(300, heavy * 2)
    tr._handle_overflow(400, heavy * 2)
    assert tr.raster_cfg.pairs_per_gaussian == 8
    # a quiet check resets the strike counter
    tr2 = Trainer(args, _Opt(), _Pipe(), scene,
                  raster_cfg=RasterConfig(pairs_per_gaussian=4,
                                          max_per_tile=128, tile_batch=4))
    tr2._handle_overflow(100, heavy)
    tr2._handle_overflow(200, 0.0)
    tr2._handle_overflow(300, heavy)
    assert tr2.raster_cfg.pairs_per_gaussian == 4


def test_densification_stats_ndc_units():
    """The densify criterion accumulates the means2D gradient in NDC
    units: the CUDA backward multiplies the pixel-space gradient by
    ddelx_dx = 0.5*W (diff-gaussian-rasterization backward.cu), which
    the reference threshold densify_grad_threshold=2e-4 is tuned
    against. Guards against re-introducing the (W/2)^-2 understatement
    that silently disabled densification at production resolutions."""
    import jax.numpy as jnp
    from trase_tpu.models import gaussians as G

    W, H = 1008, 756
    aux = G.empty_aux(4)
    aux = aux._replace(alive=jnp.ones((4,), bool))
    gpx = jnp.array([[1e-6, 0.0], [0.0, 2e-6], [3e-6, 4e-6],
                     [1.0, 1.0]], jnp.float32)
    vis = jnp.array([True, True, True, False])
    radii = jnp.array([5.0, 6.0, 7.0, 8.0], jnp.float32)
    out = G.add_densification_stats(aux, gpx, vis, radii, H, W)
    expect = np.linalg.norm(
        np.asarray(gpx) * np.array([W / 2.0, H / 2.0]), axis=1)
    np.testing.assert_allclose(np.asarray(out.xyz_gradient_accum[:3]),
                               expect[:3], rtol=1e-6)
    assert float(out.xyz_gradient_accum[3]) == 0.0  # invisible
    # a typical-magnitude pixel gradient at 1K must clear the
    # reference's default threshold once converted
    assert expect[1] > 2e-4 * 1e-3  # sanity of units, not tightness
    assert float(out.denom[0]) == 1.0 and float(out.denom[3]) == 0.0


@pytest.mark.slow
def test_densify_fires_at_1k_resolution():
    """End-to-end units regression (VERDICT r2 item 6): at a 1K-class
    resolution with the reference's DEFAULT densify_grad_threshold=2e-4
    (arguments/__init__.py:121), a photometrically misaligned scene
    must accumulate screen-gradient stats that actually fire
    clone/split. Under the pre-0fd041c pixel->NDC conversion bug
    (divide instead of multiply by W/2 — a (W/2)^2 ~ 450,000x
    understatement at this width) no gaussian crosses the threshold and
    this test fails, so the fix cannot silently regress again."""
    import jax
    import jax.numpy as jnp

    from trase_tpu.engine import trainer as T
    from trase_tpu.models import gaussians as G
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import make_render_camera, render

    H, W = 1008, 1344
    rng = np.random.default_rng(3)
    n = 48
    pts = np.concatenate(
        [rng.uniform(-1.2, 1.2, (n, 2)), rng.uniform(3.5, 4.5, (n, 1))],
        axis=1).astype(np.float32)
    cols = rng.uniform(0.3, 1.0, (n, 3)).astype(np.float32)
    d2 = np.full(n, 0.01, np.float32)  # ~fat blobs, clearly visible
    params, aux = G.from_point_cloud(pts, cols, sh_degree=1,
                                     capacity=128, dist2=d2)
    cam = make_render_camera(np.eye(3), np.zeros(3), 1.1, 0.85, H, W)
    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=32,
                       tile_batch=128)

    # GT = the same scene shifted ~15 px in screen space: a pure
    # translation misalignment, the cleanest screen-gradient source
    gt_params = params._replace(xyz=params.xyz + jnp.array([0.05, 0., 0.]))
    gt = render(cam, gt_params, aux.alive, jnp.zeros(3), sh_degree=1,
                with_features=False, raster_cfg=cfg)["render"]

    state = T.init_train_state(params, aux, {})
    lrs = T.LearningRates(*(jnp.float32(1e-4) for _ in range(8)))
    state, metrics = T.gaussian_phase_step(
        state, cam.buffers, gt, jnp.float32(0.0), jnp.float32(0.0),
        lrs, jnp.zeros(3), deform_net=None, image_height=H,
        image_width=W, sh_degree=1, use_deform=False, is_6dof=False,
        lambda_dssim=0.2, lambda_reg_deform=0.0, raster_cfg=cfg)
    assert bool(metrics["finite"])

    avg = np.asarray(state.aux.xyz_gradient_accum) / np.maximum(
        np.asarray(state.aux.denom), 1.0)
    # the DEFAULT reference threshold, not a tuned-down one
    assert (avg > 2e-4).sum() >= n // 4, (
        f"only {(avg > 2e-4).sum()} of {n} gaussians cross the default "
        f"densify threshold at {W}px — screen-gradient units regressed?")

    n_before = int(G.num_alive(state.aux))
    new_state, stats = T.densify_step(
        state, jax.random.PRNGKey(0), jnp.float32(4.0), jnp.float32(0.0),
        cfg=G.DensifyConfig(grad_threshold=2e-4, percent_dense=0.01),
        max_new=64)
    n_after = int(G.num_alive(new_state.aux))
    assert n_after > n_before, (
        f"densification did not fire ({n_before} -> {n_after}) with the "
        f"default threshold at 1K resolution")


def test_checkpoint_roundtrip(synth_dir, tmp_path):
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    args = _Args(synth_dir, str(tmp_path / "model2"))
    opt = _Opt()
    opt.iterations = 4
    opt.warm_up = 2
    opt.densify_until_iter = 0
    scene = Scene(args, resolution_scales=(1.0,))
    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=128, tile_batch=4)
    tr = Trainer(args, opt, _Pipe(), scene, raster_cfg=cfg)
    tr.train(first_iter=0, checkpoint_iterations={4}, progress=False)

    ck = os.path.join(args.model_path, "chkpnt4.pkl")
    assert os.path.exists(ck)

    tr2 = Trainer(args, opt, _Pipe(), scene, raster_cfg=cfg)
    it = tr2.load_ckpt(ck)
    assert it == 4
    a = np.asarray(tr.state.params.xyz)
    b = np.asarray(tr2.state.params.xyz)
    np.testing.assert_allclose(a, b)

    # a checkpoint written under a different TrainState layout must fail
    # loudly, not restore positionally (VERDICT r2 item 9)
    import pickle

    import pytest

    with open(ck, "rb") as f:
        payload = pickle.load(f)
    assert payload.get("schema"), "checkpoints must carry a keyed schema"
    bad = dict(payload)
    bad["schema"] = [("['renamed_field']", d) if i == 0 else (p, d)
                     for i, (p, d) in enumerate(payload["schema"])]
    ck_bad = ck + ".bad"
    with open(ck_bad, "wb") as f:
        pickle.dump(bad, f)
    tr3 = Trainer(args, opt, _Pipe(), scene, raster_cfg=cfg)
    with pytest.raises(ValueError, match="schema mismatch"):
        tr3.load_ckpt(ck_bad)


def test_mask_and_gt_cache_bounded(synth_dir, tmp_path):
    """Device-side caches stay within their LRU budgets (the round-1
    loop cached every camera's padded mask stack on device forever —
    an instant OOM at Neu3D scale)."""
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine import trainer as T
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    args = _Args(synth_dir, str(tmp_path / "model3"))
    opt = _Opt()
    opt.iterations = 24
    opt.warm_up = 2
    opt.warm_up_3d_features = 4
    opt.iterative_opt_interval = 4
    opt.densify_until_iter = 0
    opt.mask_cache_size = 2
    opt.gt_cache_size = 3
    scene = Scene(args, resolution_scales=(1.0,))
    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=128, tile_batch=4)
    tr = Trainer(args, opt, _Pipe(), scene, raster_cfg=cfg)
    # _prepare_mask_meta raises the mask LRU to the train-set size
    # (min(n_cams, 128)): an undersized cache re-uploads a decoded
    # stack every FEATURE iteration and lazily-released device buffers
    # leak through an RPC tunnel (r5: 130 GB RSS OOM at size 8 with 60
    # cams). The bound under test is therefore n_train_cams, while the
    # GT cache keeps its configured budget.
    mask_bound = len(scene.get_train_cameras())

    phases = []

    def record(t, iteration, metrics):
        phases.append(t.opt_state.state)
        assert len(t._mask_cache) <= mask_bound
        assert len(t._gt_cache) <= 3

    tr.train(first_iter=0, progress=False, on_iteration=record)
    assert T.FEATURE in phases  # the FEATURE phase actually exercised masks
    assert tr._prefetcher is not None  # background decode was active


@pytest.mark.parametrize("deform_type", [
    "DeformNetwork",
    # non-default variants recompile the full step stack (~50 s each
    # on the 1-core CI host) — full-suite only
    pytest.param("DeformStaticNetwork", marks=pytest.mark.slow),
    pytest.param("DeformDynamicNetwork", marks=pytest.mark.slow),
    pytest.param("DeformSemanticNetwork", marks=pytest.mark.slow),
])
def test_all_deform_variants_train(synth_dir, tmp_path, deform_type):
    """Every registry variant trains through BOTH phases (the reference's
    own train.py never plumbs the semantic variant's feature input —
    scene/deform_model.py:34 vs train.py:202 — so this is capability
    beyond parity for DeformSemanticNetwork)."""
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine import trainer as T
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    args = _Args(synth_dir, str(tmp_path / f"model_{deform_type}"))
    opt = _Opt()
    opt.iterations = 8
    opt.warm_up = 2
    opt.warm_up_3d_features = 4
    opt.iterative_opt_interval = 2
    opt.densify_until_iter = 0
    opt.deform_type = deform_type
    scene = Scene(args, resolution_scales=(1.0,))
    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=128, tile_batch=4)
    tr = Trainer(args, opt, _Pipe(), scene, raster_cfg=cfg)

    losses, phases = [], []

    def record(t, iteration, metrics):
        losses.append(float(metrics["loss"]))
        phases.append(t.opt_state.state)

    tr.train(first_iter=0, progress=False, on_iteration=record)
    assert len(losses) == 8
    assert all(np.isfinite(losses))
    assert T.GAUSSIAN in phases and T.FEATURE in phases


@pytest.mark.slow
def test_feature_step_mask_resolution_resize(synth_dir):
    """FEATURE phase with masks at a DIFFERENT resolution than the
    render: the rendered feature image is bilinear-resized to mask
    resolution before the correspondence matrices (reference
    train.py:284 F.interpolate(..., mode='bilinear')), while the
    feature-norm reg uses the UN-resized image. Recompute the loss
    independently through torch's interpolate to pin both the plumbing
    and the jax/torch bilinear equivalence."""
    import jax
    import jax.numpy as jnp
    import torch

    from trase_tpu.engine import trainer as T
    from trase_tpu.losses.contrastive import (
        features_correspondence_matrix,
        negative_pixel_pair_loss,
        pixel_mask_correspondence_matrix,
        pixel_weights,
        positive_pixel_pair_loss,
        sample_pixels_and_masks,
    )
    from trase_tpu.models import gaussians as G
    from trase_tpu.models.deform import init_deform, make_deform_network
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import make_render_camera, render

    rng_np = np.random.default_rng(2)
    n = 80
    pts = (rng_np.normal(size=(n, 3)) * 0.4).astype(np.float32)
    pts[:, 2] += 3.0
    cols = rng_np.uniform(size=(n, 3)).astype(np.float32)
    params, aux = G.from_point_cloud(
        pts, cols, sh_degree=1, capacity=256,
        dist2=np.full(n, 0.01, np.float32))
    net = make_deform_network("DeformNetwork")
    dvars = init_deform(jax.random.PRNGKey(0), net)
    state = T.init_train_state(params, aux, dvars)

    H, W = 48, 64
    hm, wm = 24, 40  # mask resolution != render resolution
    cam = make_render_camera(np.eye(3), np.zeros(3), 0.8, 0.8, H, W)
    cfg = RasterConfig(pairs_per_gaussian=4, max_per_tile=128, tile_batch=2)
    masks = jnp.asarray((rng_np.random((5, hm, wm)) > 0.55)
                        .astype(np.float32))
    valid = jnp.ones((5,), bool)
    lrs = T.LearningRates(*[jnp.float32(1e-3)] * 8)
    key = jax.random.PRNGKey(3)

    _, metrics = T.feature_phase_step(
        state, cam.buffers, masks, valid, jnp.float32(0.5), key, lrs,
        jnp.zeros(3), jnp.zeros((256, 1), jnp.int32),
        deform_net=net, image_height=H, image_width=W, sh_degree=1,
        use_deform=False, is_6dof=False, contrastive_mode="soft",
        rfn=1.0, positive_th=0.75, negative_th=0.5,
        num_sampled_pixels=64, num_sampled_masks=4, use_smoothing=False,
        smooth_dropout=0.5, mask_hw=(hm, wm), raster_cfg=cfg)

    # independent recomputation with torch's bilinear
    rng_sample, _ = jax.random.split(key)
    sample = sample_pixels_and_masks(rng_sample, masks, valid, 64, 4)
    C = pixel_mask_correspondence_matrix(masks, sample)
    weights = pixel_weights(masks, sample)
    out = render(cam, params, aux.alive, jnp.zeros(3), sh_degree=1,
                 with_features=True, norm_gaussian_features=True,
                 raster_cfg=cfg)
    feats = out["render_gaussian_features"]  # (F, H, W), un-resized
    rf_norm = float(jnp.sqrt(
        jnp.sum(feats * feats, axis=0) + 1e-12).mean())
    tfeats = torch.from_numpy(np.asarray(feats))[None]
    tresized = torch.nn.functional.interpolate(
        tfeats, (hm, wm), mode="bilinear").squeeze(0)
    feats_resized = jnp.asarray(tresized.numpy())
    C_F = features_correspondence_matrix(feats_resized, sample)
    pos = positive_pixel_pair_loss["soft"](C, C_F, sample,
                                           positive_th=0.75,
                                           weights=weights)
    neg = negative_pixel_pair_loss["soft"](C, C_F, sample,
                                           negative_th=0.5,
                                           weights=weights)
    expected = float(pos + neg + (1.0 - rf_norm) ** 2)
    np.testing.assert_allclose(float(metrics["loss"]), expected,
                               rtol=2e-5)
    assert bool(metrics["finite"])


def test_multiview_rig_geometry(tmp_path):
    """n_times > 0 writes a Neu3D-style rig: fixed cameras x shared
    timestamp grid, test cameras at held-out angles (reference Neu3D
    protocol: whole cameras held out, scene/dataset_readers.py
    multi-view transforms). The monocular default (n_times=0) couples
    time 1:1 with angle, under which held-out-view PSNR measures the
    monocular 4D ambiguity — see runs/README.md round-5 post-mortem."""
    import json

    from trase_tpu.data.synthetic import write_synthetic_dataset

    d = str(tmp_path / "mv")
    write_synthetic_dataset(d, n_train=12, n_test=4, image_size=32,
                            n_blobs=2, pts_per_blob=16, n_times=4)
    tr = json.load(open(os.path.join(d, "transforms_train.json")))
    te = json.load(open(os.path.join(d, "transforms_test.json")))
    assert len(tr["frames"]) == 12 and len(te["frames"]) == 4

    def cams_and_times(frames):
        cams = {tuple(np.round(np.array(f["transform_matrix"])[:3, 3], 5))
                for f in frames}
        times = sorted({round(f["time"], 5) for f in frames})
        return cams, times

    tr_cams, tr_times = cams_and_times(tr["frames"])
    te_cams, te_times = cams_and_times(te["frames"])
    assert len(tr_cams) == 3           # 12 frames / 4 timestamps
    assert len(te_cams) == 1           # one whole held-out camera
    assert not (tr_cams & te_cams)     # test angles never trained
    assert tr_times == te_times == [round(t / 3, 5) for t in range(4)]
    # every train camera films every timestamp (full rig coverage)
    per_cam = {}
    for f in tr["frames"]:
        key = tuple(np.round(np.array(f["transform_matrix"])[:3, 3], 5))
        per_cam.setdefault(key, set()).add(round(f["time"], 5))
    assert all(len(ts) == 4 for ts in per_cam.values())


def test_gt_cache_no_cross_split_uid_collision(synth_dir, tmp_path):
    """Camera uids are per-split enumeration indices (train 0..N AND
    test 0..M), so a uid-keyed GT cache returns a TRAIN image for a
    test camera — which made every evaluate() test-PSNR readout a
    cross-pair artifact (r5 diagnosis; fixed by keying on
    (image_name, W, H))."""
    from trase_tpu.data.scene import Scene
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    args = _Args(synth_dir, str(tmp_path / "model_gtc"))
    scene = Scene(args, resolution_scales=(1.0,))
    tr = Trainer(args, _Opt(), _Pipe(), scene,
                 raster_cfg=RasterConfig(pairs_per_gaussian=4,
                                         max_per_tile=128, tile_batch=4),
                 max_new_per_densify=16)
    train0 = scene.get_train_cameras()[0]
    test0 = scene.get_test_cameras()[0]
    assert train0.uid == test0.uid == 0  # the collision precondition
    # prime the cache with the colliding train camera first
    _ = tr._gt_image(train0)
    got = np.asarray(tr._gt_image(test0))
    np.testing.assert_array_equal(got, np.asarray(test0.image))


def test_stall_watchdog_hard_exits(synth_dir, tmp_path):
    """A wedged device call blocks the main thread in native recv where
    signal handlers / --max_hours can never fire; the stall watchdog
    (train(stall_timeout_s=...)) must hard-exit rc 86 so the harness
    sees a distinguishable failure and the snapshot/curve salvage
    remains usable (BASELINE r4/r5 wedge post-mortems)."""
    import subprocess

    code = f"""
import sys
sys.path.insert(0, {os.path.dirname(os.path.dirname(os.path.abspath(__file__)))!r})
sys.path.insert(0, {os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), 'tests')!r})
import time
from test_train_loop import _Args, _Opt, _Pipe
from trase_tpu.data.scene import Scene
from trase_tpu.engine.loop import Trainer
from trase_tpu.ops.rasterize import RasterConfig

args = _Args({synth_dir!r}, {str(tmp_path / 'model_wd')!r})
opt = _Opt(); opt.iterations = 50; opt.warm_up_3d_features = 100
opt.densify_until_iter = 0
tr = Trainer(args, opt, _Pipe(), Scene(args, resolution_scales=(1.0,)),
             raster_cfg=RasterConfig(pairs_per_gaussian=4,
                                     max_per_tile=128, tile_batch=4))
def wedge(t, i, m):
    if i == 3:
        time.sleep(30)   # simulated uninterruptible device stall
tr.train(first_iter=0, progress=False, on_iteration=wedge,
         stall_timeout_s=2.0)
"""
    env = dict(os.environ, JAX_PLATFORMS="cpu")
    env.pop("PALLAS_AXON_POOL_IPS", None)
    r = subprocess.run([sys.executable, "-c", code], env=env,
                       capture_output=True, text=True, timeout=300)
    assert r.returncode == 86, (r.returncode, r.stdout[-500:],
                                r.stderr[-500:])
    assert "watchdog" in r.stdout
