"""VGG16/19 feature extractor in flax (style transfer + LPIPS backbone).

Behavioral contract: style_transfer/fx.py in the reference — the same
layer-name API ('conv{block}_{idx}' for single activations, or
'conv{block}' for the concatenation of every activation in the block)
over an ImageNet-normalized input, built on the torchvision VGG layer
indexing ([[0,2],[5,7],[10,12,14],...], fx.py:90-96).

Weights: this environment has no torchvision and no network egress, so
pretrained weights must be supplied as a file — either a torchvision
``vgg16-*.pth`` state_dict (loaded via torch, CPU) or an .npz export.
Without a weight file the extractor initializes from a fixed seed and
prints a warning: the NNFM pipeline stays runnable (random conv
features are a known weak-but-valid matching space), but style
fidelity needs real weights.
"""
from __future__ import annotations

import os
import re
from typing import Sequence

import jax
import jax.numpy as jnp
import numpy as np

# channels per conv layer, per block (vgg16 / vgg19)
VGG16_BLOCKS = [[64, 64], [128, 128], [256, 256, 256],
                [512, 512, 512], [512, 512, 512]]
VGG19_BLOCKS = [[64, 64], [128, 128], [256, 256, 256, 256],
                [512, 512, 512, 512], [512, 512, 512, 512]]

IMAGENET_MEAN = np.array([0.485, 0.456, 0.406], np.float32)
IMAGENET_STD = np.array([0.229, 0.224, 0.225], np.float32)


def _conv(x, w, b):
    """3x3 same conv, NCHW params (torchvision layout: OIHW)."""
    out = jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
    )
    return out + b[None, :, None, None]


class VGGFeatureExtractor:
    """Functional extractor: __call__(img_chw[0..1]) -> {name: (1,C,H,W)}.

    `layer_names` accepts 'convI_J' (J-th conv of block I, 1-based) and
    'convI' (channel-concat of all convs in block I), matching the
    reference's parser (fx.py:17-63).
    """

    def __init__(self, layer_names: Sequence[str], blocks,
                 weights: dict | None = None, seed: int = 0):
        self.blocks = blocks
        self.layer_names = list(layer_names)
        needed = set()
        for name in self.layer_names:
            m = re.fullmatch(r"conv(\d+)_(\d+)", name)
            if m:
                needed.add((int(m.group(1)) - 1, int(m.group(2)) - 1))
                continue
            m = re.fullmatch(r"conv(\d+)", name)
            if m:
                b = int(m.group(1)) - 1
                needed.update((b, j) for j in range(len(blocks[b])))
                continue
            raise ValueError(f"Invalid layer name: {name}")
        self.max_block = max(b for b, _ in needed)
        self.needed = needed

        if weights is None:
            rng = np.random.default_rng(seed)
            weights = {}
            in_c = 3
            for bi, block in enumerate(blocks):
                for ci, out_c in enumerate(block):
                    # He init, fixed seed => deterministic fallback
                    w = rng.normal(
                        0, np.sqrt(2.0 / (in_c * 9)),
                        size=(out_c, in_c, 3, 3)).astype(np.float32)
                    weights[(bi, ci)] = (w, np.zeros(out_c, np.float32))
                    in_c = out_c
        self.weights = {
            k: (jnp.asarray(w), jnp.asarray(b))
            for k, (w, b) in weights.items()
        }

    def __call__(self, image: jnp.ndarray, detach: bool = False) -> dict:
        """image: (3,H,W) or (N,3,H,W) in [0,1]."""
        x = image if image.ndim == 4 else image[None]
        mean = jnp.asarray(IMAGENET_MEAN)[None, :, None, None]
        std = jnp.asarray(IMAGENET_STD)[None, :, None, None]
        x = (x - mean) / std

        acts: dict = {}
        for bi, block in enumerate(self.blocks):
            if bi > self.max_block:
                break
            for ci in range(len(block)):
                w, b = self.weights[(bi, ci)]
                x = jax.nn.relu(_conv(x, w, b))
                acts[(bi, ci)] = x
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID",
            )

        out = {}
        for name in self.layer_names:
            m = re.fullmatch(r"conv(\d+)_(\d+)", name)
            if m:
                v = acts[(int(m.group(1)) - 1, int(m.group(2)) - 1)]
            else:
                b = int(name[4:]) - 1
                v = jnp.concatenate(
                    [acts[(b, j)] for j in range(len(self.blocks[b]))],
                    axis=1)
            out[name] = jax.lax.stop_gradient(v) if detach else v
        return out


def _weights_from_torch_state_dict(sd, blocks) -> dict:
    """torchvision vgg state_dict ('features.<idx>.weight') -> our keys."""
    idx = 0
    mapping = {}
    for bi, block in enumerate(blocks):
        for ci in range(len(block)):
            mapping[(bi, ci)] = idx
            idx += 2  # conv + relu
        idx += 1  # maxpool
    out = {}
    for key, li in mapping.items():
        w = np.asarray(sd[f"features.{li}.weight"], np.float32)
        b = np.asarray(sd[f"features.{li}.bias"], np.float32)
        out[key] = (w, b)
    return out


def load_vgg_weights(path: str, blocks=VGG16_BLOCKS) -> dict | None:
    """Load VGG weights from .pth (torch state_dict) or .npz."""
    if not path or not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        z = np.load(path)
        out = {}
        for k in z.files:
            if k.endswith(".w"):
                bi, ci = map(int, k[:-2].split("_"))
                out[(bi, ci)] = (z[k], z[f"{bi}_{ci}.b"])
        return out
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    return _weights_from_torch_state_dict(sd, blocks)


def make_vgg16_extractor(layer_names: Sequence[str],
                         weights_path: str | None = None):
    """VGG16FeatureExtractor equivalent (fx.py:89-91)."""
    weights = load_vgg_weights(weights_path) if weights_path else None
    if weights_path and weights is None:
        print(f"[vgg] WARNING: weights not found at {weights_path}")
    if weights is None:
        print("[vgg] WARNING: using seeded random VGG16 weights "
              "(no pretrained file; style fidelity will be limited)")
    return VGGFeatureExtractor(layer_names, VGG16_BLOCKS, weights)


def make_vgg19_extractor(layer_names: Sequence[str],
                         weights_path: str | None = None):
    weights = (load_vgg_weights(weights_path, VGG19_BLOCKS)
               if weights_path else None)
    if weights is None:
        print("[vgg] WARNING: using seeded random VGG19 weights")
    return VGGFeatureExtractor(layer_names, VGG19_BLOCKS, weights)
