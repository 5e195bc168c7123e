"""General helpers: activations, seeding, image conversion.

Behavioral contract: utils/general_utils.py in the reference
(inverse_sigmoid, PILtoTorch-equivalent, seeded global state).
"""
from __future__ import annotations

import os
import random

import numpy as np

try:  # jnp-compatible but importable host-side without jax
    import jax.numpy as jnp
except Exception:  # pragma: no cover
    jnp = np


def inverse_sigmoid(x):
    return jnp.log(x / (1 - x))


def inverse_sigmoid_np(x):
    return np.log(x / (1 - x))


def pil_to_array(pil_image, resolution) -> np.ndarray:
    """Resize a PIL image and return a CHW float array in [0, 1]."""
    resized = pil_image.resize(resolution)
    arr = np.array(resized) / 255.0
    if arr.ndim == 3:
        return arr.transpose(2, 0, 1)
    return arr[None, ...]


def safe_state(seed: int = 0):
    """Seed host RNGs for reproducibility (device RNG is explicit PRNG keys)."""
    random.seed(seed)
    np.random.seed(seed)
    os.environ.setdefault("PYTHONHASHSEED", str(seed))


def mkdir_p(path: str):
    os.makedirs(path, exist_ok=True)


def search_for_max_iteration(folder: str):
    """Largest numeric suffix among `iteration_*` entries in a folder."""
    saved = [int(fname.split("_")[-1]) for fname in os.listdir(folder)]
    return max(saved)
