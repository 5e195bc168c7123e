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
