#!/usr/bin/env python
"""Fetch + convert pretrained VGG16 and LPIPS v0.1 weights to .npz.

The style-transfer trainer (train_style_transfer_nnfm.py, reference
style_transfer/fx.py:89-92) and the LPIPS metric
(trase_tpu/losses/lpips.py, reference lpipsPyTorch/) need pretrained
parameters. This tool produces the two files the CLIs consume:

    weights/vgg16.npz       — torchvision VGG16 ImageNet features
    weights/lpips_vgg.npz   — LPIPS v0.1 linear heads (vgg variant)

Online (default): downloads the official artifacts —
    https://download.pytorch.org/models/vgg16-397923af.pth
    https://raw.githubusercontent.com/richzhang/PerceptualSimilarity/
        master/lpips/weights/v0.1/vgg.pth
Offline: download those two files on any machine, copy them here, and
run with --vgg_pth / --lpips_pth pointing at the copies.

Usage:
    python tools/fetch_vgg_weights.py                 # download + convert
    python tools/fetch_vgg_weights.py --vgg_pth vgg16-397923af.pth \
        --lpips_pth vgg.pth                           # convert local files
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

VGG16_URL = "https://download.pytorch.org/models/vgg16-397923af.pth"
LPIPS_URL = ("https://raw.githubusercontent.com/richzhang/"
             "PerceptualSimilarity/master/lpips/weights/v0.1/vgg.pth")


def _download(url: str, dest: str) -> str:
    import urllib.request

    print(f"[fetch] {url} -> {dest}")
    try:
        urllib.request.urlretrieve(url, dest)
    except Exception as e:  # noqa: BLE001 — offline is the common case
        raise SystemExit(
            f"[fetch] download failed ({type(e).__name__}: {e}).\n"
            f"This environment has no network egress. Download\n"
            f"    {url}\n"
            f"on a connected machine, copy it next to this repo, and "
            f"re-run with --vgg_pth/--lpips_pth pointing at the file."
        )
    return dest


def convert_vgg(pth_path: str, out_path: str) -> None:
    """torchvision vgg16 state_dict -> our (bi_ci.w / bi_ci.b) npz."""
    from trase_tpu.models.vgg import (
        VGG16_BLOCKS, _weights_from_torch_state_dict,
    )

    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    weights = _weights_from_torch_state_dict(sd, VGG16_BLOCKS)
    payload = {}
    for (bi, ci), (w, b) in weights.items():
        payload[f"{bi}_{ci}.w"] = w
        payload[f"{bi}_{ci}.b"] = b
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **payload)
    print(f"[fetch] wrote {out_path} "
          f"({sum(v.size for v in payload.values()) / 1e6:.1f}M params)")


def convert_lpips(pth_path: str, out_path: str) -> None:
    """Official LPIPS v0.1 vgg.pth -> lin0..lin4 head vectors npz."""
    import torch

    sd = torch.load(pth_path, map_location="cpu", weights_only=True)
    payload = {}
    for i in range(5):
        for key in (f"lin{i}.model.1.weight", f"lins.{i}.model.1.weight"):
            if key in sd:
                payload[f"lin{i}"] = np.asarray(
                    sd[key], np.float32)[:, :, 0, 0][0]
                break
        else:
            raise SystemExit(f"[fetch] {pth_path} has no lin{i} head — "
                             f"not an LPIPS v0.1 weight file?")
    os.makedirs(os.path.dirname(out_path) or ".", exist_ok=True)
    np.savez(out_path, **payload)
    print(f"[fetch] wrote {out_path}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out_dir", default="weights")
    ap.add_argument("--vgg_pth", default=None,
                    help="local vgg16-397923af.pth (skips download)")
    ap.add_argument("--lpips_pth", default=None,
                    help="local LPIPS v0.1 vgg.pth (skips download)")
    ap.add_argument("--skip_lpips", action="store_true")
    args = ap.parse_args(argv)

    os.makedirs(args.out_dir, exist_ok=True)
    vgg_pth = args.vgg_pth or _download(
        VGG16_URL, os.path.join(args.out_dir, "vgg16-397923af.pth"))
    convert_vgg(vgg_pth, os.path.join(args.out_dir, "vgg16.npz"))
    if not args.skip_lpips:
        lpips_pth = args.lpips_pth or _download(
            LPIPS_URL, os.path.join(args.out_dir, "lpips_v01_vgg.pth"))
        convert_lpips(lpips_pth, os.path.join(args.out_dir,
                                              "lpips_vgg.npz"))


if __name__ == "__main__":
    main()
