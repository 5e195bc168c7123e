"""Native host-IO kernels (native/trase_io.cpp via ctypes): the C++
paths must be bit-identical to the numpy fallbacks."""
import numpy as np
import pytest

from trase_tpu import native


def test_native_builds():
    assert native.available(), "g++ toolchain expected in this image"


def test_unpack_masks_padded_matches_numpy():
    rng = np.random.default_rng(0)
    n, h, w, m_max = 7, 33, 61, 10
    masks = rng.random((n, h, w)) > 0.5
    packed = np.packbits(masks.reshape(-1).astype(np.uint8))

    out = native.unpack_masks_padded(packed, n, h, w, m_max)
    assert out.shape == (m_max, h, w) and out.dtype == np.float32
    np.testing.assert_array_equal(out[:n], masks.astype(np.float32))
    assert out[n:].sum() == 0

    # truncation when n > m_max
    out2 = native.unpack_masks_padded(packed, n, h, w, 3)
    np.testing.assert_array_equal(out2, masks[:3].astype(np.float32))


def test_rgba_to_rgb_matches_numpy():
    rng = np.random.default_rng(1)
    img = rng.integers(0, 256, (37, 53, 4), np.uint8)
    bg = np.array([0.3, 0.7, 0.1], np.float32)

    out = native.rgba_to_rgb_f32(img, bg)
    data = img.astype(np.float32) / 255.0
    ref = data[..., :3] * data[..., 3:4] + bg * (1 - data[..., 3:4])
    ref = np.clip(ref.transpose(2, 0, 1), 0, 1)
    assert out.shape == (3, 37, 53)
    np.testing.assert_allclose(out, ref, atol=1e-6)

    # RGB (no alpha) path
    img3 = rng.integers(0, 256, (16, 24, 3), np.uint8)
    out3 = native.rgba_to_rgb_f32(img3, bg)
    np.testing.assert_allclose(
        out3, (img3.astype(np.float32) / 255.0).transpose(2, 0, 1),
        atol=1e-6)


def test_load_padded_masks_native_path(tmp_path):
    from trase_tpu.data.masks import load_padded_masks, save_mask_file

    rng = np.random.default_rng(2)
    masks = rng.random((4, 19, 27)) > 0.4
    p = str(tmp_path / "m.npz")
    save_mask_file(p, masks)
    padded = load_padded_masks(p, 6)
    assert padded.masks.shape == (6, 19, 27)
    np.testing.assert_array_equal(padded.masks[:4],
                                  masks.astype(np.float32))
    np.testing.assert_array_equal(padded.valid,
                                  np.arange(6) < 4)
