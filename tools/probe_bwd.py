#!/usr/bin/env python
"""Micro-probes for the rasterizer backward's non-kernel stages.

The round-2 verdict flags the backward (kernel + transpose + unsort) as
the biggest single-chip perf lever. This tool times each candidate
sub-stage in isolation on the live device so kernel changes chase
measured costs, not guesses:

  sort_inv    — the inversion sort of (sorted_pid, slot_of_sorted)
  gather_pid  — the random row gather dpay[idx] in pid order (current)
  gather_mono — the monotone row gather dpay[slot_of_sorted]
  fold        — the (n, K, f) -> (n, f) K-fold reduce
  unsort_full — unsort_slot_gradients as shipped
  transpose   — the _transpose_slots MXU relayout pass
  zeros       — materializing the pre-zeroed staging buffer

Usage: python tools/probe_bwd.py [--n 100000] [--k 6] [--f 48]
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


def timed(fn, *args, iters=20, warmup=2):
    import jax.numpy as jnp

    out = None
    for _ in range(warmup):
        out = fn(*args)
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(jnp.ravel(leaf)[:1])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--f", type=int, default=48)
    ap.add_argument("--tiles", type=int, default=5292)  # 1008x1344
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from trase_tpu.ops import rasterize_pallas as RP

    n, k, f_pad = args.n, args.k, args.f
    nk = n * k
    s_cap = nk // 128 + args.tiles + 2
    slot_cap = s_cap * 128
    rng = np.random.default_rng(0)

    # realistic index maps: random tile permutation of pairs, slots
    # contiguous within tiles (monotone slot_of_sorted with window gaps)
    perm = rng.permutation(nk).astype(np.int32)
    sorted_pid = jnp.asarray(perm)
    # ~half the windows partial: inject gaps every ~113 pairs
    gaps = np.sort(rng.choice(nk, args.tiles, replace=False))
    bump = np.zeros(nk, np.int64)
    bump[gaps] = 128 - (np.arange(args.tiles) % 128)
    slot = (np.arange(nk) + np.cumsum(bump)) % (slot_cap - 1)
    slot_of_sorted = jnp.asarray(np.sort(slot).astype(np.int32))
    dpay = jnp.asarray(
        rng.standard_normal((slot_cap, f_pad)).astype(np.float32))
    dpay_kmaj = jnp.asarray(
        rng.standard_normal((s_cap * f_pad, 128)).astype(np.float32))

    t = {}

    @jax.jit
    def f_sort(sorted_pid, slot_of_sorted):
        return jax.lax.sort((sorted_pid, slot_of_sorted), num_keys=1)[1]

    idx = f_sort(sorted_pid, slot_of_sorted)
    t["sort_inv"] = timed(f_sort, sorted_pid, slot_of_sorted,
                          iters=args.iters)

    @jax.jit
    def f_gather_pid(dpay, idx):
        return dpay[jnp.minimum(idx, slot_cap - 1)]

    t["gather_pid"] = timed(f_gather_pid, dpay, idx, iters=args.iters)

    @jax.jit
    def f_gather_mono(dpay, slot_of_sorted):
        return dpay[jnp.minimum(slot_of_sorted, slot_cap - 1)]

    t["gather_mono"] = timed(f_gather_mono, dpay, slot_of_sorted,
                             iters=args.iters)

    rows = f_gather_pid(dpay, idx)

    @jax.jit
    def f_fold(rows):
        return jnp.sum(rows.reshape(n, k, f_pad), axis=1)

    t["fold"] = timed(f_fold, rows, iters=args.iters)

    @jax.jit
    def f_unsort(dpay, sorted_pid, slot_of_sorted):
        return RP.unsort_slot_gradients(dpay, sorted_pid, slot_of_sorted,
                                        n + 1)

    t["unsort_full"] = timed(f_unsort, dpay, sorted_pid, slot_of_sorted,
                             iters=args.iters)

    @jax.jit
    def f_transpose(dpay_kmaj):
        return RP._transpose_slots(dpay_kmaj, s_cap, f_pad,
                                   interpret=False)

    t["transpose"] = timed(f_transpose, dpay_kmaj, iters=args.iters)

    @jax.jit
    def f_zeros():
        return jnp.zeros((s_cap * f_pad, 128), jnp.float32)

    t["zeros"] = timed(f_zeros, iters=args.iters)

    # candidate: bf16-packed gather (half the random-access bytes),
    # unpacked + folded afterwards
    @jax.jit
    def f_gather_bf16(dpay, idx):
        packed = dpay.astype(jnp.bfloat16)
        rows = packed[jnp.minimum(idx, slot_cap - 1)]
        return jnp.sum(rows.reshape(n, k, f_pad).astype(jnp.float32),
                       axis=1)

    t["gather_fold_bf16"] = timed(f_gather_bf16, dpay, idx,
                                  iters=args.iters)

    # gather-cost scaling in the row width: is the XLA gather
    # row-count-bound (per-row loop) or bytes-bound?
    for w in (8, 16, 24):
        sub = dpay[:, :w]

        @jax.jit
        def f_gw(sub, idx, w=w):
            return sub[jnp.minimum(idx, slot_cap - 1)]

        t[f"gather_w{w}"] = timed(f_gw, sub, idx, iters=args.iters)

    # candidate: f32 rows packed as 2x-bf16 lanes BEFORE the gather
    # (bitcast pairs of columns into one f32 column) -> gather w/2
    # columns -> unpack + fold. Exact bf16 rounding like pack_features.
    @jax.jit
    def f_gather_packed(dpay, idx):
        h = f_pad // 2
        u16 = jax.lax.bitcast_convert_type(
            dpay.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
        packed = jax.lax.bitcast_convert_type(
            u16[:, :h] | (u16[:, h:] << 16), jnp.float32)
        rows = packed[jnp.minimum(idx, slot_cap - 1)]
        u = jax.lax.bitcast_convert_type(rows, jnp.uint32)
        lo = jax.lax.bitcast_convert_type(u << 16, jnp.float32)
        hi = jax.lax.bitcast_convert_type(
            u & jnp.uint32(0xFFFF0000), jnp.float32)
        rows2 = jnp.concatenate([lo, hi], axis=1)
        return jnp.sum(rows2.reshape(n, k, f_pad), axis=1)

    t["gather_fold_pack2"] = timed(f_gather_packed, dpay, idx,
                                   iters=args.iters)

    # candidate: sort carrying the packed rows as payload columns
    # (scatter-free permutation; cost scales with payload width)
    h = f_pad // 2
    u16 = jax.lax.bitcast_convert_type(
        dpay.astype(jnp.bfloat16), jnp.uint16).astype(jnp.uint32)
    packed_cols = tuple(
        jax.lax.bitcast_convert_type(
            u16[:, i] | (u16[:, i + h] << 16), jnp.float32)
        for i in range(h))
    pid_of_slot = jnp.zeros((slot_cap,), jnp.int32).at[
        jnp.minimum(slot_of_sorted, slot_cap - 1)].set(sorted_pid)

    @jax.jit
    def f_sort_payload(pid_of_slot, *cols):
        out = jax.lax.sort((pid_of_slot,) + cols, num_keys=1)
        return out[1]

    t["sort_payload24"] = timed(f_sort_payload, pid_of_slot,
                                *packed_cols, iters=max(args.iters // 2, 2))

    print(json.dumps({
        "setting": {"n": n, "k": k, "f_pad": f_pad, "s_cap": int(s_cap),
                    "slot_cap": int(slot_cap),
                    "device": jax.devices()[0].platform},
        "ms": {kk: round(vv, 2) for kk, vv in t.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
