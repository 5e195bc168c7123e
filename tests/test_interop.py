"""Reference-format interop: the .pt mask/cluster containers written by
the reference tooling (extract_masks.py:87-99 bitarray dicts, raw
tensors; gui.py:296-298 cluster dicts) must round-trip through our
loaders. torch is available in this environment, so these paths are
exercised for real."""
import os

import numpy as np
import pytest

torch = pytest.importorskip("torch")


class _FakeBitarray:
    """Mimics bitarray's storage contract: tobytes() returns the
    bit-packed buffer (MSB-first), exactly np.packbits layout."""

    def __init__(self, bits):
        self._packed = np.packbits(np.asarray(bits, np.uint8))

    def tobytes(self):
        return self._packed.tobytes()


def test_pt_bitarray_dict_masks(tmp_path):
    from trase_tpu.data.masks import decode_mask_file, mask_file_shape

    rng = np.random.default_rng(0)
    n, h, w = 5, 17, 23
    masks = rng.random((n, h, w)) > 0.5
    payload = {
        "masks": np.array([_FakeBitarray(masks.reshape(-1))], object),
        "N": n, "H": h, "W": w,
    }
    p = str(tmp_path / "view.pt")
    torch.save(payload, p)

    assert mask_file_shape(p) == (n, h, w)
    dec = decode_mask_file(p)
    np.testing.assert_array_equal(dec, masks)


def test_pt_tensor_masks(tmp_path):
    from trase_tpu.data.masks import decode_mask_file, mask_file_shape

    rng = np.random.default_rng(1)
    masks = rng.random((3, 9, 11)) > 0.4
    p = str(tmp_path / "raw.pt")
    torch.save(torch.from_numpy(masks), p)
    assert mask_file_shape(p) == (3, 9, 11)
    np.testing.assert_array_equal(decode_mask_file(p), masks)


def test_npz_mask_roundtrip(tmp_path):
    from trase_tpu.data.masks import (
        decode_mask_file, mask_file_shape, save_mask_file,
    )

    rng = np.random.default_rng(2)
    masks = rng.random((4, 13, 7)) > 0.6
    p = str(tmp_path / "native.npz")
    save_mask_file(p, masks)
    assert mask_file_shape(p) == (4, 13, 7)
    np.testing.assert_array_equal(decode_mask_file(p), masks)


def test_clusters_pt_roundtrip(tmp_path):
    from trase_tpu.cluster.clustering import load_clusters, save_clusters

    rng = np.random.default_rng(3)
    ids = rng.integers(0, 16, 100).astype(np.int64)
    rgb = rng.random((100, 3)).astype(np.float32)
    p = str(tmp_path / "clusters.pt")
    save_clusters(p, ids, rgb)
    # written via torch.save in this env (reference interop)
    obj = torch.load(p, map_location="cpu", weights_only=False)
    assert torch.is_tensor(obj["id"])
    ids2, rgb2 = load_clusters(p)
    np.testing.assert_array_equal(ids2, ids)
    np.testing.assert_allclose(rgb2, rgb)


def test_extract_masks_from_pt_conversion(tmp_path):
    """extract_masks.py --from_pt: reference .pt -> native .npz."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import extract_masks

    rng = np.random.default_rng(4)
    masks = rng.random((2, 8, 8)) > 0.5
    src = tmp_path / "pt_masks"
    src.mkdir()
    torch.save(torch.from_numpy(masks), str(src / "0001.pt"))
    out = tmp_path / "scene"
    extract_masks.main(["--from_pt", str(src), "--output", str(out)])

    from trase_tpu.data.masks import decode_mask_file

    dec = decode_mask_file(str(out / "masks" / "0001.npz"))
    np.testing.assert_array_equal(dec, masks)


def test_extract_masks_save_to_tensor(tmp_path):
    """--save_to_tensor writes the reference's raw bool tensor .pt
    (extract_masks.py:43,87-89) and decode_mask_file reads it back."""
    import sys

    sys.path.insert(0, os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))))
    import extract_masks

    rng = np.random.default_rng(5)
    masks = rng.random((3, 6, 9)) > 0.5
    src = tmp_path / "pt_masks"
    src.mkdir()
    torch.save(torch.from_numpy(masks), str(src / "a.pt"))
    out = tmp_path / "scene"
    extract_masks.main(["--from_pt", str(src), "--output", str(out),
                        "--save_to_tensor"])
    obj = torch.load(str(out / "masks" / "a.pt"), map_location="cpu",
                     weights_only=False)
    assert torch.is_tensor(obj) and obj.dtype == torch.bool

    from trase_tpu.data.masks import decode_mask_file

    np.testing.assert_array_equal(
        decode_mask_file(str(out / "masks" / "a.pt")), masks)


def test_deform_pth_import_matches_reference_math():
    """Import a reference-format DeformNetwork state_dict and check our
    flax apply reproduces the reference forward (reimplemented here in
    numpy from the utils/time_utils.py:9-132 contract: interleaved
    sin/cos embedding, 8x256 stack with the post-relu skip concat)."""
    import jax
    import numpy as np
    from trase_tpu.models.deform import deform_step, make_deform_network
    from trase_tpu.tools.import_torch import import_deform_state_dict

    rng = np.random.default_rng(0)
    D, W, XF, TF = 8, 256, 10, 10
    in_ch = 3 * (1 + 2 * XF) + 1 * (1 + 2 * TF)

    def lin(i, o):
        return (rng.normal(size=(o, i)).astype(np.float32) * 0.05,
                rng.normal(size=(o,)).astype(np.float32) * 0.05)

    sd = {}
    dims = [(in_ch, W)] + [(W, W)] * (D - 1)
    dims[D // 2 + 1] = (W + in_ch, W)
    for i, (ci, co) in enumerate(dims):
        w, b = lin(ci, co)
        sd[f"linear.{i}.weight"], sd[f"linear.{i}.bias"] = w, b
    for name, o in [("gaussian_warp", 3), ("gaussian_rotation", 4),
                    ("gaussian_scaling", 3)]:
        w, b = lin(W, o)
        sd[f"{name}.weight"], sd[f"{name}.bias"] = w, b

    # reference forward, independently in numpy
    def ref_embed(v, f):
        outs = [v]
        for k in range(f):
            outs += [np.sin(v * 2.0 ** k), np.cos(v * 2.0 ** k)]
        return np.concatenate(outs, axis=-1)

    x = rng.normal(size=(64, 3)).astype(np.float32)
    t = rng.uniform(size=(64, 1)).astype(np.float32)
    inp = np.concatenate([ref_embed(x, XF), ref_embed(t, TF)], axis=-1)
    h = inp
    for i in range(D):
        w, b = sd[f"linear.{i}.weight"], sd[f"linear.{i}.bias"]
        h = np.maximum(h @ w.T + b, 0.0)
        if i == D // 2:
            h = np.concatenate([inp, h], axis=-1)
    ref_out = [h @ sd[f"{n}.weight"].T + sd[f"{n}.bias"]
               for n in ("gaussian_warp", "gaussian_rotation",
                         "gaussian_scaling")]

    variables = import_deform_state_dict(sd)
    net = make_deform_network("DeformNetwork")
    import jax.numpy as jnp
    ours = deform_step(net, variables, jnp.asarray(x), jnp.asarray(t))
    for a, b in zip(ref_out, ours):
        np.testing.assert_allclose(np.asarray(b), a, atol=2e-5, rtol=1e-4)


def _fake_capture(n=50, sh_degree=1, rng=None, opt_shape="dual"):
    """Build a reference-format gaussians.capture() tuple
    (scene/gaussian_model.py:106-121) with torch tensors."""
    rng = rng or np.random.default_rng(7)
    r = (sh_degree + 1) ** 2 - 1
    t = lambda *s: torch.tensor(  # noqa: E731
        rng.normal(size=s).astype(np.float32))
    xyz = torch.tensor(
        (rng.normal(size=(n, 3)) * 0.4 + [0, 0, 3]).astype(np.float32))
    f_dc, f_rest = t(n, 1, 3), t(n, r, 3)
    scaling = torch.tensor(
        np.full((n, 3), -4.0, np.float32))
    rotation = torch.zeros((n, 4)); rotation[:, 0] = 1.0
    opacity = torch.full((n, 1), 0.5)
    gfeats = t(n, 1, 32)
    max_radii = torch.zeros((n,))
    accum = t(n, 1).abs()
    denom = torch.ones((n, 1))

    def adam_sd(names_shapes):
        state, groups = {}, []
        for i, (name, p) in enumerate(names_shapes):
            state[i] = {"step": torch.tensor(17.0),
                        "exp_avg": torch.full_like(p, 0.25),
                        "exp_avg_sq": torch.full_like(p, 0.5)}
            groups.append({"name": name, "params": [i]})
        return {"state": state, "param_groups": groups}

    g_sd = adam_sd([("xyz", xyz), ("f_dc", f_dc), ("f_rest", f_rest),
                    ("opacity", opacity), ("scaling", scaling),
                    ("rotation", rotation)])
    f_sd = adam_sd([("gaussian_feats", gfeats)])
    if opt_shape == "dual":
        opt_sd = {"GAUSSIAN": g_sd, "FEATURE": f_sd}
    elif opt_shape == "single":
        opt_sd = adam_sd([("xyz", xyz), ("f_dc", f_dc),
                          ("f_rest", f_rest), ("opacity", opacity),
                          ("scaling", scaling), ("rotation", rotation),
                          ("gaussian_feats", gfeats)])
    else:
        opt_sd = None
    return (sh_degree, xyz, f_dc, f_rest, scaling, rotation, opacity,
            gfeats, max_radii, accum, denom, opt_sd, 4.5)


@pytest.mark.parametrize("opt_shape", ["dual", "single", "none"])
def test_chkpnt_pth_import(tmp_path, opt_shape):
    """Reference chkpntN.pth (train.py:396: torch.save((capture(),
    iteration))) -> our fixed-capacity TrainState pieces, then a render
    goes through without hand-editing."""
    import jax
    import jax.numpy as jnp

    from trase_tpu.models import gaussians as G
    from trase_tpu.tools.import_torch import import_chkpnt_pth

    n = 50
    cap = _fake_capture(n=n, opt_shape=opt_shape)
    path = str(tmp_path / "chkpnt300.pth")
    torch.save((cap, 300), path)

    params, aux, opt, meta = import_chkpnt_pth(path)
    assert meta["iteration"] == 300
    assert meta["active_sh_degree"] == 1
    assert meta["spatial_lr_scale"] == 4.5
    assert int(G.num_alive(aux)) == n
    capacity = params.xyz.shape[0]
    assert capacity >= 2 * n and capacity % 2 == 0

    np.testing.assert_allclose(np.asarray(params.xyz[:n]),
                               cap[1].numpy(), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(params.features_rest[:n]),
                               cap[3].numpy(), rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(params.gaussian_features[:n]),
        cap[7].numpy().reshape(n, -1), rtol=1e-6)
    np.testing.assert_allclose(np.asarray(aux.xyz_gradient_accum[:n]),
                               cap[9].numpy().reshape(n), rtol=1e-6)
    # optimizer state mapped (or zero-initialised when absent)
    if opt_shape == "none":
        assert float(jnp.abs(opt.xyz.mu).max()) == 0.0
    else:
        np.testing.assert_allclose(np.asarray(opt.xyz.mu[:n]), 0.25)
        np.testing.assert_allclose(np.asarray(opt.rotation.nu[:n]), 0.5)
        assert int(opt.scaling.step) == 17
        np.testing.assert_allclose(
            np.asarray(opt.gaussian_features.mu[:n]), 0.25)

    # dead-slot fills match our layout (no NaNs in a render)
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import make_render_camera, render

    camera = make_render_camera(np.eye(3), np.zeros(3), 0.8, 0.8, 64, 64)
    out = jax.jit(lambda p: render(
        camera, p, aux.alive, jnp.zeros(3), sh_degree=1,
        with_features=False,
        raster_cfg=RasterConfig(pairs_per_gaussian=4, max_per_tile=128,
                                tile_batch=2)))(params)
    img = np.asarray(out["render"])
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_trainer_resumes_from_reference_chkpnt(tmp_path):
    """--start_checkpoint chkpntN.pth resumes training (train.py:77-78
    reference behavior) through Trainer.load_reference_ckpt."""
    from test_train_loop import _Args, _Opt, _Pipe
    from trase_tpu.data.scene import Scene
    from trase_tpu.data.synthetic import write_synthetic_dataset
    from trase_tpu.engine.loop import Trainer
    from trase_tpu.ops.rasterize import RasterConfig

    d = str(tmp_path / "synth")
    write_synthetic_dataset(d, n_train=3, n_test=1, image_size=48,
                            n_blobs=2, pts_per_blob=24)
    cap = _fake_capture(n=40, opt_shape="dual")
    ck = str(tmp_path / "chkpnt100.pth")
    torch.save((cap, 100), ck)

    args = _Args(d, str(tmp_path / "model"))
    opt = _Opt()
    opt.iterations = 104
    opt.densify_until_iter = 0
    opt.warm_up_3d_features = 1000
    scene = Scene(args, resolution_scales=(1.0,))
    tr = Trainer(args, opt, _Pipe(), scene,
                 raster_cfg=RasterConfig(pairs_per_gaussian=4,
                                         max_per_tile=128, tile_batch=4))
    it = tr.load_ckpt(ck)  # .pth dispatches to the reference importer
    assert it == 100
    assert tr.active_sh_degree == 1
    losses = []
    tr.train(first_iter=it, progress=False,
             on_iteration=lambda t, i, m: losses.append(float(m["loss"])))
    assert len(losses) == 4 and all(np.isfinite(losses))
