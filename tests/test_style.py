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
