"""VGG extractor + NNFM style loss tests (CPU).

Covers the reference's style_transfer/fx.py layer-name API and the
loss_nnfm_style math (utils/loss_utils.py:223-228) against a direct
numpy computation.
"""
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax.numpy as jnp  # noqa: E402


def test_vgg16_layer_shapes():
    from trase_tpu.models.vgg import make_vgg16_extractor

    fx = make_vgg16_extractor(["conv1_1", "conv2_2", "conv4_1", "conv3"])
    img = jnp.asarray(
        np.random.default_rng(0).random((3, 64, 64)).astype(np.float32))
    out = fx(img)
    assert out["conv1_1"].shape == (1, 64, 64, 64)
    assert out["conv2_2"].shape == (1, 128, 32, 32)
    assert out["conv4_1"].shape == (1, 512, 8, 8)
    # 'conv3' concatenates the three conv activations of block 3
    assert out["conv3"].shape == (1, 256 * 3, 16, 16)


def test_nnfm_matches_numpy():
    from trase_tpu.losses.style import loss_nnfm_style

    rng = np.random.default_rng(1)
    f1 = rng.normal(size=(16, 40)).astype(np.float32)
    f2 = rng.normal(size=(16, 55)).astype(np.float32)

    a = f1 / np.linalg.norm(f1, axis=0, keepdims=True)
    b = f2 / np.linalg.norm(f2, axis=0, keepdims=True)
    expected = (1.0 - (a.T @ b).max(axis=1)).mean()

    got = float(loss_nnfm_style(jnp.asarray(f1), jnp.asarray(f2)))
    np.testing.assert_allclose(got, expected, rtol=1e-5)


def test_nnfm_zero_for_identical_sets():
    from trase_tpu.losses.style import loss_nnfm_style

    f = np.random.default_rng(2).normal(size=(8, 20)).astype(np.float32)
    got = float(loss_nnfm_style(jnp.asarray(f), jnp.asarray(f)))
    assert got < 1e-5


def _torch_vgg16_features():
    """Hand-built torch VGG16 `features` Sequential in torchvision's
    exact module indexing (conv,relu pairs + maxpool per block) —
    torchvision itself is absent here, but the *state-dict layout*
    ('features.<idx>.weight') is what our converter must understand."""
    import torch.nn as nn

    blocks = [[64, 64], [128, 128], [256, 256, 256],
              [512, 512, 512], [512, 512, 512]]
    mods, in_c = [], 3
    for block in blocks:
        for out_c in block:
            mods += [nn.Conv2d(in_c, out_c, 3, padding=1), nn.ReLU()]
            in_c = out_c
        mods.append(nn.MaxPool2d(2, 2))
    return nn.Sequential(*mods)


def test_vgg_torch_forward_parity(tmp_path):
    """Converted torch weights reproduce the torch forward exactly:
    proves the state-dict mapping, conv padding/layout, normalization,
    and the pre-ReLU 'conv' vs post-ReLU 'relu' node semantics
    (reference fx.py:39,46,51). With this pinned, dropping in the real
    torchvision vgg16 .pth gives reference-equal features."""
    import torch

    net = _torch_vgg16_features().eval()
    for p in net.parameters():
        p.requires_grad_(False)
    torch.manual_seed(0)
    for m in net:
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.05)
    pth = str(tmp_path / "vgg16_rand.pth")
    torch.save({f"features.{i}.{k}": v
                for i, m in enumerate(net)
                for k, v in m.state_dict().items()}, pth)

    rng = np.random.default_rng(7)
    img = rng.random((3, 64, 64)).astype(np.float32)

    # torch side: reference fx pipeline (internal ImageNet normalize)
    mean = torch.tensor([0.485, 0.456, 0.406])[:, None, None]
    std = torch.tensor([0.229, 0.224, 0.225])[:, None, None]
    x = (torch.from_numpy(img) - mean) / std
    x = x[None]
    acts = {}
    with torch.no_grad():
        for i, m in enumerate(net):
            x = m(x)
            acts[i] = x
    # conv4_1 pre-ReLU = module 17's output; relu2_2 = module 8's
    want_conv4_1 = acts[17].numpy()[0]
    want_relu2_2 = acts[8].numpy()[0]

    from trase_tpu.models.vgg import make_vgg16_extractor

    fx = make_vgg16_extractor(["conv4_1", "relu2_2"], pth)
    out = fx(jnp.asarray(img))
    np.testing.assert_allclose(np.asarray(out["conv4_1"][0]),
                               want_conv4_1, rtol=2e-4, atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["relu2_2"][0]),
                               want_relu2_2, rtol=2e-4, atol=2e-4)


def test_lpips_torch_parity(tmp_path):
    """Our LPIPS == the reference lpipsPyTorch pipeline (modules/
    lpips.py:30-36, networks.py:41-63, utils.py:6-8) run in torch with
    the same (random) backbone + heads: z-score by the LPIPS v0.1
    scaling constants, post-ReLU target layers, eps-outside-sqrt unit
    normalization, 1x1 heads, spatial mean, layer sum."""
    import torch

    net = _torch_vgg16_features().eval()
    torch.manual_seed(1)
    for m in net:
        if isinstance(m, torch.nn.Conv2d):
            torch.nn.init.normal_(m.weight, std=0.05)
            torch.nn.init.normal_(m.bias, std=0.05)
    pth = str(tmp_path / "vgg16_rand.pth")
    torch.save({f"features.{i}.{k}": v
                for i, m in enumerate(net)
                for k, v in m.state_dict().items()}, pth)

    channels = [64, 128, 256, 512, 512]
    gen = torch.Generator().manual_seed(2)
    lins = [torch.rand((1, c, 1, 1), generator=gen).abs()
            for c in channels]
    lin_pth = str(tmp_path / "lpips_vgg.pth")
    torch.save({f"lin{i}.model.1.weight": w for i, w in enumerate(lins)},
               lin_pth)

    rng = np.random.default_rng(3)
    img1 = rng.random((3, 64, 64)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.1, img1.shape), 0, 1).astype(
        np.float32)

    # ---- torch reference pipeline
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]
    target = [3, 8, 15, 22, 29]  # relu modules of conv{1_2,...,5_3}

    def feats(img):
        x = (torch.from_numpy(img)[None] - shift) / scale
        out = []
        with torch.no_grad():
            for i, m in enumerate(net):
                x = m(x)
                if i in target:
                    n = torch.sqrt(torch.sum(x ** 2, 1, keepdim=True))
                    out.append(x / (n + 1e-10))
        return out

    f1, f2 = feats(img1), feats(img2)
    want = 0.0
    for a, b, w in zip(f1, f2, lins):
        d = (a - b) ** 2
        want += torch.nn.functional.conv2d(d, w).mean((2, 3)).item()

    from trase_tpu.losses.lpips import make_lpips

    lpips = make_lpips(pth, lin_pth)
    got = float(lpips(jnp.asarray(img1), jnp.asarray(img2)))
    np.testing.assert_allclose(got, want, rtol=1e-3, atol=1e-6)


def test_lpips_lin_npz_roundtrip(tmp_path):
    """tools/fetch_vgg_weights.py's .npz lin-head export loads
    identically to the .pth path."""
    import torch

    channels = [64, 128, 256, 512, 512]
    gen = torch.Generator().manual_seed(4)
    lins = {f"lin{i}.model.1.weight": torch.rand((1, c, 1, 1),
                                                 generator=gen)
            for i, c in enumerate(channels)}
    lin_pth = str(tmp_path / "vgg.pth")
    torch.save(lins, lin_pth)

    import sys as _sys
    _sys.path.insert(0, os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "tools"))
    from fetch_vgg_weights import convert_lpips

    npz = str(tmp_path / "lpips_vgg.npz")
    convert_lpips(lin_pth, npz)

    from trase_tpu.losses.lpips import load_lin_weights

    a = load_lin_weights(lin_pth)
    b = load_lin_weights(npz)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_vgg_weight_npz_roundtrip(tmp_path):
    from trase_tpu.models.vgg import (
        VGG16_BLOCKS, load_vgg_weights, make_vgg16_extractor,
    )

    rng = np.random.default_rng(3)
    payload = {}
    in_c = 3
    for bi, block in enumerate(VGG16_BLOCKS):
        for ci, out_c in enumerate(block):
            payload[f"{bi}_{ci}.w"] = rng.normal(
                size=(out_c, in_c, 3, 3)).astype(np.float32)
            payload[f"{bi}_{ci}.b"] = np.zeros(out_c, np.float32)
            in_c = out_c
    p = str(tmp_path / "vgg.npz")
    np.savez(p, **payload)

    w = load_vgg_weights(p)
    assert w is not None and (0, 0) in w
    fx = make_vgg16_extractor(["conv1_1"], p)
    img = jnp.zeros((3, 32, 32))
    out = fx(img)
    assert out["conv1_1"].shape == (1, 64, 32, 32)


_WEIGHTS_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "weights")
_VGG_NPZ = os.path.join(_WEIGHTS_DIR, "vgg16.npz")
_LPIPS_NPZ = os.path.join(_WEIGHTS_DIR, "lpips_vgg.npz")


def test_lpips_pretrained_weights_parity():
    """Activates the moment real pretrained weights land in weights/
    (tools/fetch_vgg_weights.py output; env egress currently blocks the
    download — VERDICT r3 item 5). Runs our LPIPS on a deterministic
    fixture pair and asserts it within 1% of the official LPIPS v0.1
    formula (reference lpipsPyTorch/modules/lpips.py:30-36) evaluated
    in torch from the SAME weight files, plus basic metric axioms."""
    import pytest

    if not (os.path.exists(_VGG_NPZ) and os.path.exists(_LPIPS_NPZ)):
        pytest.skip("pretrained weights/vgg16.npz + lpips_vgg.npz absent "
                    "(no egress); drop them in and this test activates")
    import torch

    from trase_tpu.losses.lpips import load_lin_weights, make_lpips
    from trase_tpu.models.vgg import VGG16_BLOCKS, load_vgg_weights

    rng = np.random.default_rng(7)
    img1 = rng.random((3, 96, 96)).astype(np.float32)
    img2 = np.clip(img1 + rng.normal(0, 0.08, img1.shape), 0, 1).astype(
        np.float32)

    # ---- official formula in torch, from the same .npz files
    weights = load_vgg_weights(_VGG_NPZ)
    lins = load_lin_weights(_LPIPS_NPZ)
    shift = torch.tensor([-.030, -.088, -.188])[None, :, None, None]
    scale = torch.tensor([.458, .448, .450])[None, :, None, None]

    def feats(img):
        x = (torch.from_numpy(img)[None] - shift) / scale
        out = []
        with torch.no_grad():
            for bi, block in enumerate(VGG16_BLOCKS):
                for ci in range(len(block)):
                    w, b = weights[(bi, ci)]
                    x = torch.nn.functional.conv2d(
                        x, torch.from_numpy(w), torch.from_numpy(b),
                        padding=1)
                    x = torch.relu(x)
                # post-ReLU tap of each block's LAST conv feeds LPIPS
                n = torch.sqrt(torch.sum(x ** 2, 1, keepdim=True))
                out.append(x / (n + 1e-10))
                x = torch.nn.functional.max_pool2d(x, 2)
        return out

    f1, f2 = feats(img1), feats(img2)
    want = 0.0
    for a, b, w in zip(f1, f2, lins):
        d = (a - b) ** 2
        wt = torch.from_numpy(np.asarray(w, np.float32)).reshape(
            1, -1, 1, 1)
        want += torch.nn.functional.conv2d(d, wt).mean((2, 3)).item()

    lpips = make_lpips(_VGG_NPZ, _LPIPS_NPZ)
    got = float(lpips(jnp.asarray(img1), jnp.asarray(img2)))
    assert abs(got - want) <= 0.01 * max(abs(want), 1e-6)
    # metric axioms on the real weights
    assert float(lpips(jnp.asarray(img1), jnp.asarray(img1))) < 1e-6
    img3 = np.clip(img1 + rng.normal(0, 0.25, img1.shape), 0, 1).astype(
        np.float32)
    further = float(lpips(jnp.asarray(img1), jnp.asarray(img3)))
    assert further > got
