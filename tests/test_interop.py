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
