"""SAM mask loading/decoding.

The reference stores per-image SAM masks as ``masks/<name>.pt`` holding
either a raw (N,H,W) bool tensor or a dict
{"masks": np.array of bitarray, "N", "H", "W"} (extract_masks.py:87-99),
decoded per FEATURE iteration on the CPU (train.py:245-249). Here:

- ``load_masks`` accepts .pt (via torch, CPU), .npz (native format:
  packed bits + shape) and .npy;
- decoding bit-packed masks uses np.unpackbits (vectorized C loop);
- ``MaskStore`` pads mask stacks to a static (M_max, H, W) shape with a
  validity vector so the FEATURE-phase train step compiles once, and
  prefetches decode work on a background thread to keep the TPU fed.
"""
from __future__ import annotations

import os
import queue
import threading
from typing import NamedTuple

import numpy as np


class PaddedMasks(NamedTuple):
    masks: np.ndarray  # (M_max, H, W) float32/bool
    valid: np.ndarray  # (M_max,) bool


def decode_mask_file(path: str) -> np.ndarray | None:
    """Load one mask file -> (N, H, W) bool array."""
    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        z = np.load(path)
        if "packed" in z:
            n, h, w = int(z["N"]), int(z["H"]), int(z["W"])
            bits = np.unpackbits(z["packed"], count=n * h * w)
            return bits.reshape(n, h, w).astype(bool)
        return z["masks"].astype(bool)
    if path.endswith(".npy"):
        return np.load(path).astype(bool)
    # torch .pt — raw tensor or bitarray dict
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if torch.is_tensor(obj):
        return obj.numpy().astype(bool)
    if isinstance(obj, dict):
        n, h, w = int(obj["N"]), int(obj["H"]), int(obj["W"])
        m = obj["masks"]
        if torch.is_tensor(m):
            return m.numpy().reshape(n, h, w).astype(bool)
        # bitarray container (reference format: ONE bitarray of all
        # N*H*W bits, extract_masks.py:92-99) or an array of per-mask
        # bitarrays, or raw bytes
        objs = list(np.asarray(m, dtype=object).ravel()) \
            if isinstance(m, np.ndarray) else [m]
        per_obj = (n * h * w) if len(objs) == 1 else (h * w)
        flat = []
        for ba in objs:
            if hasattr(ba, "tobytes"):
                packed = np.frombuffer(ba.tobytes(), dtype=np.uint8)
                bits = np.unpackbits(packed, count=per_obj)
            else:
                bits = np.asarray(ba, dtype=np.uint8).ravel()[:per_obj]
            flat.append(bits)
        return np.concatenate(flat).reshape(n, h, w).astype(bool)
    raise ValueError(f"Unrecognized mask container in {path}")


def mask_file_shape(path: str) -> tuple | None:
    """(N, H, W) of a mask file WITHOUT decoding the bits, when the
    container carries shape metadata (.npz native format, .pt dicts).
    Returns None when a full decode is required."""
    if not os.path.exists(path):
        return None
    if path.endswith(".npz"):
        z = np.load(path)
        if "packed" in z:
            return (int(z["N"]), int(z["H"]), int(z["W"]))
        return tuple(z["masks"].shape)
    if path.endswith(".pt"):
        import torch

        obj = torch.load(path, map_location="cpu", weights_only=False)
        if isinstance(obj, dict):
            return (int(obj["N"]), int(obj["H"]), int(obj["W"]))
        if torch.is_tensor(obj):
            return tuple(obj.shape)
    return None


def save_mask_file(path: str, masks: np.ndarray):
    """Native .npz format: bit-packed, shape-tagged."""
    n, h, w = masks.shape
    packed = np.packbits(masks.astype(bool).ravel())
    np.savez_compressed(path, packed=packed, N=n, H=h, W=w)


def load_padded_masks(path: str, m_max: int) -> PaddedMasks | None:
    """Decode + pad in one step. For the native bit-packed .npz format
    this runs through the multithreaded C++ kernel (trase_io.cpp) —
    one pass instead of unpackbits/reshape/astype/pad."""
    if path.endswith(".npz") and os.path.exists(path):
        z = np.load(path)
        if "packed" in z:
            from ..native import unpack_masks_padded

            n, h, w = int(z["N"]), int(z["H"]), int(z["W"])
            padded = unpack_masks_padded(np.asarray(z["packed"]), n, h, w,
                                         m_max)
            return PaddedMasks(masks=padded,
                               valid=np.arange(m_max) < n)
    masks = decode_mask_file(path)
    return None if masks is None else pad_masks(masks, m_max)


def pad_masks(masks: np.ndarray, m_max: int) -> PaddedMasks:
    n = masks.shape[0]
    if n >= m_max:
        return PaddedMasks(
            masks=masks[:m_max].astype(np.float32),
            valid=np.ones(m_max, bool),
        )
    pad = np.zeros((m_max - n,) + masks.shape[1:], np.float32)
    return PaddedMasks(
        masks=np.concatenate([masks.astype(np.float32), pad]),
        valid=np.arange(m_max) < n,
    )


class MaskPrefetcher:
    """Background-thread decoder so bit-unpacking never blocks the device
    step (the reference decodes on the critical path, train.py:246-249)."""

    def __init__(self, m_max: int, depth: int = 4):
        self.m_max = m_max
        self._q: queue.Queue = queue.Queue(maxsize=depth)
        self._jobs: queue.Queue = queue.Queue()
        self._thread = threading.Thread(target=self._worker, daemon=True)
        self._thread.start()

    def _worker(self):
        while True:
            path = self._jobs.get()
            if path is None:
                return
            self._q.put((path, load_padded_masks(path, self.m_max)))

    def submit(self, path: str):
        self._jobs.put(path)

    def get(self) -> tuple[str, PaddedMasks | None]:
        return self._q.get()

    def close(self):
        self._jobs.put(None)
