#!/usr/bin/env python
"""Fetch the public benchmark datasets (the reference ships per-dataset
wget scripts under data/*/download_*.bash; same public release URLs,
one tool).

Usage:
    python data/download_datasets.py hypernerf nerf-ds
    python data/download_datasets.py neu3d --poses
    python data/download_datasets.py immersive technicolor --poses
    python data/download_datasets.py --list

`--poses` additionally fetches the author-released precomputed poses /
Mask-Benchmark bundles (SADG release) for the video datasets.
"""
from __future__ import annotations

import argparse
import os
import sys
import urllib.request
import zipfile

_HYPERNERF = "https://github.com/google/hypernerf/releases/download/v0.1"
_NEU3D = ("https://github.com/facebookresearch/Neural_3D_Video/releases/"
          "download/v1.0")
_IMMERSIVE = "https://storage.googleapis.com/deepview_video_raw_data"
_POSES = ("https://github.com/yunjinli/SADG-SegmentAnyDynamicGaussian/"
          "releases/download/1.0.0")

DATASETS = {
    "hypernerf": [
        f"{_HYPERNERF}/{s}.zip" for s in (
            "interp_chickchicken", "interp_cut-lemon", "interp_hand",
            "interp_slice-banana", "interp_torchocolate",
            "misc_americano", "misc_espresso", "misc_keyboard",
            "misc_oven-mitts", "misc_split-cookie",
        )
    ],
    "nerf-ds": [
        "https://github.com/JokerYan/NeRF-DS/releases/download/"
        "v0.1-pre-release/NeRF-DS.dataset.zip",
    ],
    "neu3d": [
        f"{_NEU3D}/{s}.zip" for s in (
            "coffee_martini", "cook_spinach", "cut_roasted_beef",
            "flame_steak", "sear_steak",
        )
    ],
    "immersive": [
        f"{_IMMERSIVE}/{s}.zip" for s in (
            "01_Welder", "02_Flames", "10_Alexa_Meade_Face_Paint_1",
            "11_Alexa_Meade_Face_Paint_2",
        )
    ],
    "technicolor": [],  # distributed on request by Technicolor; poses below
}

POSES = {
    "neu3d": [f"{_POSES}/neu3d_poses.zip"],
    "immersive": [f"{_POSES}/immersive_poses.zip"],
    "technicolor": [f"{_POSES}/technicolor_poses.zip"],
}


def fetch(url: str, dest_dir: str, extract: bool = True):
    os.makedirs(dest_dir, exist_ok=True)
    name = url.rsplit("/", 1)[-1]
    path = os.path.join(dest_dir, name)
    if not os.path.exists(path):
        print(f"-> {url}")
        urllib.request.urlretrieve(url, path)
    if extract and name.endswith(".zip"):
        print(f"   extracting {name}")
        with zipfile.ZipFile(path) as z:
            z.extractall(dest_dir)
        os.remove(path)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("datasets", nargs="*",
                    help=f"any of: {', '.join(DATASETS)}")
    ap.add_argument("--poses", action="store_true",
                    help="also fetch precomputed poses / Mask-Benchmark")
    ap.add_argument("--out", default=os.path.dirname(
        os.path.abspath(__file__)))
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args(argv)

    if args.list or not args.datasets:
        for k, urls in DATASETS.items():
            extra = " (+poses)" if k in POSES else ""
            print(f"{k}: {len(urls)} archives{extra}")
        return

    for name in args.datasets:
        key = name.lower()
        if key not in DATASETS:
            sys.exit(f"unknown dataset {name!r}; see --list")
        dest = os.path.join(args.out, key)
        if not DATASETS[key]:
            print(f"[{key}] raw footage is distributed on request by the "
                  "dataset owners; fetching poses only")
        for url in DATASETS[key]:
            fetch(url, dest)
        if args.poses:
            for url in POSES.get(key, []):
                fetch(url, dest)


if __name__ == "__main__":
    main()
