#!/usr/bin/env python
"""Micro-benchmark: FEATURE-phase pixel/mask sampling strategies.

The r5 device trace shows ~14 ms/step of sampling machinery in the
FEATURE step (a while loop + 32 dynamic-update-slices): suspects are
jax.lax.top_k over H*W scores (exact without-replacement sampling)
and the (M, H*W) column gather at the sampled pixels. This probe
times the alternatives that keep the sampling distribution exact:

  topk        lax.top_k(scores, P)               (shipped)
  sort        full sort + slice                  (same result set)
  argsort     jnp.argsort + slice
  colgather   masks (M, HW) lane gather at P indices   (shipped)
  rowgather   masks transposed (HW, M) row gather
  rowgather_pre  row gather from a pre-transposed (HW, M) array

Usage: python tools/probe_sampling.py [--hw 1008 1344] [--p 4096]
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np


def _drain(x):
    import jax.numpy as jnp

    return np.asarray(jnp.ravel(x)[:1])


def timed(fn, *args, iters=20, warmup=2):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _drain(out[0] if isinstance(out, tuple) else out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out[0] if isinstance(out, tuple) else out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--hw", type=int, nargs=2, default=(1008, 1344))
    ap.add_argument("--p", type=int, default=4096)
    ap.add_argument("--m", type=int, default=8)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    h, w = args.hw
    hw = h * w
    P, M = args.p, args.m
    rng = np.random.default_rng(0)
    masks = jnp.asarray((rng.random((M, h, w)) > 0.7).astype(np.float32))
    key = jax.random.PRNGKey(0)

    t = {}

    @jax.jit
    def f_topk(key, masks):
        in_any = (masks.sum(axis=0) > 0).reshape(-1)
        scores = jax.random.uniform(key, (hw,))
        scores = jnp.where(in_any, scores, jnp.inf)
        neg_top, idx = jax.lax.top_k(-scores, P)
        return idx, jnp.isfinite(-neg_top)

    t["topk"] = timed(f_topk, key, masks, iters=args.iters)

    @jax.jit
    def f_sort(key, masks):
        in_any = (masks.sum(axis=0) > 0).reshape(-1)
        scores = jax.random.uniform(key, (hw,))
        scores = jnp.where(in_any, scores, jnp.inf)
        iota = jnp.arange(hw, dtype=jnp.int32)
        s, idx = jax.lax.sort((scores, iota), num_keys=1)
        return idx[:P], jnp.isfinite(s[:P])

    t["sort"] = timed(f_sort, key, masks, iters=args.iters)

    @jax.jit
    def f_argsort(key, masks):
        in_any = (masks.sum(axis=0) > 0).reshape(-1)
        scores = jax.random.uniform(key, (hw,))
        scores = jnp.where(in_any, scores, jnp.inf)
        idx = jnp.argsort(scores)[:P]
        return idx, jnp.isfinite(scores[idx])

    t["argsort"] = timed(f_argsort, key, masks, iters=args.iters)

    idx, _ = f_topk(key, masks)

    @jax.jit
    def f_colgather(masks, idx):
        flat = masks.reshape(M, -1)
        return flat[:, idx]

    t["colgather"] = timed(f_colgather, masks, idx, iters=args.iters)

    @jax.jit
    def f_rowgather(masks, idx):
        flat_t = masks.reshape(M, -1).T  # (HW, M)
        return flat_t[idx].T

    t["rowgather"] = timed(f_rowgather, masks, idx, iters=args.iters)

    masks_t = jnp.asarray(np.ascontiguousarray(
        np.asarray(masks).reshape(M, -1).T))

    @jax.jit
    def f_rowgather_pre(masks_t, idx):
        return masks_t[idx].T

    t["rowgather_pre"] = timed(f_rowgather_pre, masks_t, idx,
                               iters=args.iters)

    print(json.dumps({
        "setting": {"hw": hw, "p": P, "m": M,
                    "device": jax.devices()[0].platform},
        "ms": {k: round(v, 2) for k, v in t.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
