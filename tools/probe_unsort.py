#!/usr/bin/env python
"""Micro-benchmark: gradient-unsort strategies at bench shapes.

The r5 stage profile put grad_unsort at ~12 ms (f_pad 16) and ~51 ms
(f_pad 48) — the single largest backward stage in the FEATURE phase.
This probe times isolated variants of the sort-invert + row-gather +
K-fold pipeline to decide the production design. Variants:

  current   sort + where/minimum-guarded row gather + reshape-sum
  nowhere   sort + direct row gather (relies on zeroed pad rows)
  pad128    sort + row gather from a 128-lane-padded copy + sum + slice
  split     sort + gather/sum of the two 8-row halves separately
  sortonly  just the inversion sort (floor cost)
  gatheronly direct gather, no sort (uses a precomputed idx)

Usage: python tools/probe_unsort.py [--n 100000] [--k 6] [--f 48]
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
    _drain(out if not isinstance(out, tuple) else out[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _drain(out if not isinstance(out, tuple) else out[0])
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--f", type=int, default=48)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    n, K, f_pad = args.n, args.k, args.f
    cap = 1 << (n - 1).bit_length()
    nk = cap * K
    # realistic slot capacity: nk/128 windows + per-tile slack
    num_tiles = 63 * 84
    s_cap = nk // 128 + num_tiles + 2
    slot_cap = s_cap * 128
    s_pad_rows = (s_cap + 8) * 128

    rng = np.random.default_rng(0)
    dpay = jnp.asarray(rng.normal(size=(s_pad_rows, f_pad)),
                       jnp.float32)
    # plausible sorted_pid / slot_of_sorted: random permutation of pair
    # ids; slots mostly ascending with tile gaps
    perm = rng.permutation(nk).astype(np.int32)
    sorted_pid = jnp.asarray(perm)
    slot = np.arange(nk, dtype=np.int32) + \
        (np.arange(nk, dtype=np.int32) // (nk // num_tiles + 1)) * 7
    slot = np.minimum(slot, slot_cap - 1)
    slot_of_sorted = jnp.asarray(slot)
    n_rows = cap + 1

    t = {}

    @jax.jit
    def f_current(dpay, sorted_pid, slot_of_sorted):
        _, idx = jax.lax.sort((sorted_pid, slot_of_sorted), num_keys=1)
        rows = jnp.where((idx < slot_cap)[:, None],
                         dpay[jnp.minimum(idx, slot_cap - 1)], 0.0)
        nn = n_rows - 1
        return jnp.sum(rows.reshape(nn, K, f_pad), axis=1)

    t["current"] = timed(f_current, dpay, sorted_pid, slot_of_sorted,
                         iters=args.iters)

    @jax.jit
    def f_nowhere(dpay, sorted_pid, slot_of_sorted):
        _, idx = jax.lax.sort((sorted_pid, slot_of_sorted), num_keys=1)
        rows = dpay[idx]  # pad rows are zero by construction
        nn = n_rows - 1
        return jnp.sum(rows.reshape(nn, K, f_pad), axis=1)

    t["nowhere"] = timed(f_nowhere, dpay, sorted_pid, slot_of_sorted,
                         iters=args.iters)

    dpay128 = jnp.pad(dpay, ((0, 0), (0, 128 - f_pad)))

    @jax.jit
    def f_pad128(dpay128, sorted_pid, slot_of_sorted):
        _, idx = jax.lax.sort((sorted_pid, slot_of_sorted), num_keys=1)
        rows = dpay128[idx]
        nn = n_rows - 1
        return jnp.sum(rows.reshape(nn, K, 128), axis=1)[:, :f_pad]

    t["pad128"] = timed(f_pad128, dpay128, sorted_pid, slot_of_sorted,
                        iters=args.iters)

    @jax.jit
    def f_split(dpay, sorted_pid, slot_of_sorted):
        _, idx = jax.lax.sort((sorted_pid, slot_of_sorted), num_keys=1)
        nn = n_rows - 1
        outs = []
        for lo in range(0, f_pad, 16):
            rows = dpay[idx, lo:lo + 16]
            outs.append(jnp.sum(rows.reshape(nn, K, 16), axis=1))
        return jnp.concatenate(outs, axis=1)

    t["split16"] = timed(f_split, dpay, sorted_pid, slot_of_sorted,
                         iters=args.iters)

    @jax.jit
    def f_sortonly(sorted_pid, slot_of_sorted):
        _, idx = jax.lax.sort((sorted_pid, slot_of_sorted), num_keys=1)
        return idx

    t["sortonly"] = timed(f_sortonly, sorted_pid, slot_of_sorted,
                          iters=args.iters)

    idx_pre = f_sortonly(sorted_pid, slot_of_sorted)

    @jax.jit
    def f_gatheronly(dpay, idx):
        nn = n_rows - 1
        return jnp.sum(dpay[idx].reshape(nn, K, f_pad), axis=1)

    t["gatheronly"] = timed(f_gatheronly, dpay, idx_pre,
                            iters=args.iters)

    @jax.jit
    def f_take(dpay, idx):
        nn = n_rows - 1
        rows = jnp.take(dpay, idx, axis=0, unique_indices=True,
                        indices_are_sorted=False)
        return jnp.sum(rows.reshape(nn, K, f_pad), axis=1)

    t["take_unique"] = timed(f_take, dpay, idx_pre, iters=args.iters)

    print(json.dumps({
        "setting": {"n": n, "k": K, "f_pad": f_pad,
                    "slot_rows": s_pad_rows,
                    "device": jax.devices()[0].platform},
        "ms": {k: round(v, 2) for k, v in t.items()},
    }, indent=2))


if __name__ == "__main__":
    main()
