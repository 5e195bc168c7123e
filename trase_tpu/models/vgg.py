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

    `layer_names` follows the reference's NODE_PATTERN parser exactly
    (fx.py:18,32-49): 'convI_J' is the PRE-ReLU output of the J-th conv
    of block I (1-based), 'reluI_J' the post-ReLU activation, and the
    block forms 'convI' / 'reluI' concatenate every conv of block I
    along channels. (The reference maps 'conv' to the torchvision
    features index of the conv module and 'relu' to index+1 —
    fx.py:39,46,51 — so the style trainer's 'conv4_1' is the raw conv
    output, not the activation.)

    `normalization`: (mean, std) channel stats applied to the input.
    Defaults to ImageNet (the reference fx.py:60-61); the LPIPS path
    passes the LPIPS v0.1 scaling-layer constants instead.
    """

    def __init__(self, layer_names: Sequence[str], blocks,
                 weights: dict | None = None, seed: int = 0,
                 normalization: tuple | None = None):
        self.blocks = blocks
        self.layer_names = list(layer_names)
        if normalization is None:
            normalization = (IMAGENET_MEAN, IMAGENET_STD)
        self.norm_mean = np.asarray(normalization[0], np.float32)
        self.norm_std = np.asarray(normalization[1], np.float32)
        needed = set()  # (op, block, conv) with op in {'conv','relu'}
        for name in self.layer_names:
            m = re.fullmatch(r"(conv|relu)([1-5])(?:_([1-4]))?", name)
            if not m:
                raise ValueError(f"Invalid layer name: {name}")
            op, b, j = m.group(1), int(m.group(2)) - 1, m.group(3)
            if j is not None:
                if int(j) - 1 >= len(blocks[b]):
                    raise ValueError(
                        f"Invalid layer name: {name} (block "
                        f"{b + 1} has only {len(blocks[b])} convs)")
                needed.add((op, b, int(j) - 1))
            else:
                needed.update((op, b, jj) for jj in range(len(blocks[b])))
        self.max_block = max(b for _, b, _ in needed)
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

    def normalize(self, image: jnp.ndarray) -> jnp.ndarray:
        """Channel-normalize an image EXTERNALLY (fx.py's public
        `.normalize`). Note __call__ always normalizes internally too
        (fx.py:72 does the same) — the reference style trainer calls
        both (train_style_transfer_nnfm.py:104,199), i.e. its conv4_1
        features are of a twice-normalized image; callers replicating
        that pipeline must apply this before __call__."""
        mean = jnp.asarray(self.norm_mean)
        std = jnp.asarray(self.norm_std)
        if image.ndim == 4:
            return (image - mean[None, :, None, None]) / std[
                None, :, None, None]
        return (image - mean[:, None, None]) / std[:, None, None]

    def __call__(self, image: jnp.ndarray, detach: bool = False) -> dict:
        """image: (3,H,W) or (N,3,H,W) in [0,1]."""
        x = image if image.ndim == 4 else image[None]
        mean = jnp.asarray(self.norm_mean)[None, :, None, None]
        std = jnp.asarray(self.norm_std)[None, :, None, None]
        x = (x - mean) / std

        acts: dict = {}  # (op, block, conv) -> activation
        for bi, block in enumerate(self.blocks):
            if bi > self.max_block:
                break
            for ci in range(len(block)):
                w, b = self.weights[(bi, ci)]
                pre = _conv(x, w, b)
                x = jax.nn.relu(pre)
                if ("conv", bi, ci) in self.needed:
                    acts[("conv", bi, ci)] = pre
                if ("relu", bi, ci) in self.needed:
                    acts[("relu", bi, ci)] = x
            x = jax.lax.reduce_window(
                x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                "VALID",
            )

        out = {}
        for name in self.layer_names:
            m = re.fullmatch(r"(conv|relu)([1-5])(?:_([1-4]))?", name)
            op, b, j = m.group(1), int(m.group(2)) - 1, m.group(3)
            if j is not None:
                v = acts[(op, b, int(j) - 1)]
            else:
                v = jnp.concatenate(
                    [acts[(op, b, jj)]
                     for jj in range(len(self.blocks[b]))], axis=1)
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
