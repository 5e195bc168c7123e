#!/usr/bin/env python
"""Stage-level timing of the Pallas backward at the bench setting.

Splits the measured backward cost into: gradient-kernel compute
(emit_grads=False ablation), per-window output DMA (full minus
ablation), the k-major -> row-major transpose pass, and the
sort+gather+fold unsort — so optimization effort lands on the real
bottleneck. Timings drain the queue with a host fetch (the axon
tunnel's block_until_ready does not truly block).

    python tools/probe_bwd_kernel.py --n 100000 --hw 1008 1344 --k 6
"""
from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=100_000)
    ap.add_argument("--hw", type=int, nargs=2, default=(1008, 1344))
    ap.add_argument("--k", type=int, default=6)
    ap.add_argument("--n_val", type=int, default=4,
                    help="value channels (4 = rgb+depth GAUSSIAN phase)")
    ap.add_argument("--iters", type=int, default=20)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from trase_tpu.ops import rasterize_pallas as RP
    from trase_tpu.ops.projection import ProjectedGaussians
    from trase_tpu.ops.rasterize import RasterConfig, _tile_grid

    H, W = args.hw
    n = args.n
    rng = np.random.default_rng(args.seed)
    # bench-like screen-space scene (matches bench.py's statistics)
    mean2d = np.stack([rng.uniform(0, W, n), rng.uniform(0, H, n)],
                      axis=1).astype(np.float32)
    depth = rng.uniform(1.0, 8.0, n).astype(np.float32)
    sig = rng.uniform(1.0, 6.0, n).astype(np.float32)
    conic = np.stack([1.0 / sig**2, np.zeros(n, np.float32),
                      1.0 / sig**2], axis=1).astype(np.float32)
    radius = np.ceil(3.0 * sig).astype(np.float32)
    color = rng.uniform(0, 1, (n, 3)).astype(np.float32)
    opac = rng.uniform(0.2, 0.9, n).astype(np.float32)
    proj = ProjectedGaussians(
        mean2d=jnp.asarray(mean2d), depth=jnp.asarray(depth),
        conic=jnp.asarray(conic), radius=jnp.asarray(radius),
        color=jnp.asarray(color), opacity=jnp.asarray(opac),
        valid=jnp.ones((n,), bool))
    cfg = RasterConfig(pairs_per_gaussian=args.k)
    th, tw = _tile_grid(H, W)
    num_tiles = th * tw

    sorted_pid, slot_of_sorted, layout, overflow = RP.build_window_layout(
        proj, H, W, cfg)
    extra = None
    if args.n_val > 4:
        extra = jnp.asarray(
            rng.uniform(0, 1, (n, args.n_val - 4)).astype(np.float32))
    payload, n_val = RP.build_payload(proj, extra)
    assert n_val == args.n_val, (n_val, args.n_val)
    gather = jax.jit(RP._gather_pairs)
    ps_t = gather(payload, sorted_pid)

    fwd = jax.jit(lambda ps: RP._forward_impl(
        ps, layout, num_tiles=num_tiles, tw=tw, n_val=n_val,
        interpret=False))
    patches, logt_stop, stop = fwd(ps_t)
    g = jnp.asarray(rng.normal(size=patches.shape), jnp.float32)

    def bwd_fn(emit):
        return jax.jit(lambda *a: RP._backward_impl(
            *a, num_tiles=num_tiles, tw=tw, n_val=n_val,
            interpret=False, emit_grads=emit))

    unsort = jax.jit(lambda d: RP.unsort_slot_gradients(
        d, sorted_pid, slot_of_sorted, payload.shape[0]))

    def timed(f, *a):
        r = f(*a)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            r = f(*a)
        x = r[0] if isinstance(r, tuple) else r
        np.asarray(jnp.ravel(x)[:1])  # true queue drain
        return (time.perf_counter() - t0) / args.iters * 1000

    t = {}
    t["gather_pairs"] = timed(gather, payload, sorted_pid)
    t["forward+res"] = timed(fwd, ps_t)
    full = bwd_fn(True)
    abl = bwd_fn(False)
    t["bwd_full"] = timed(full, ps_t, layout, g, logt_stop, stop)
    t["bwd_no_odma"] = timed(abl, ps_t, layout, g, logt_stop, stop)
    dpay = full(ps_t, layout, g, logt_stop, stop)
    t["unsort"] = timed(unsort, dpay)

    # how much of bwd_full is the separate transpose pass?
    f_pad = -(-(RP.GEOM_COLS + n_val) // 8) * 8
    s_cap = layout.meta_t.shape[0]
    kmaj = jnp.zeros((s_cap * f_pad, RP.PAIR_CHUNK), jnp.float32)
    tr = jax.jit(lambda x: RP._transpose_slots(x, s_cap, f_pad,
                                               interpret=False))
    t["transpose_slots"] = timed(tr, kmaj)

    stop_np = np.asarray(stop)[:, :, 0, 0]
    meta = np.asarray(layout.meta_t)
    gs = np.asarray(layout.group_start)
    total_win = int(np.asarray(layout.total_win))
    # count processed windows: per tile, windows [first, stop)
    gx_, gxn = RP.group_geometry(tw)
    processed = 0
    for gi in range(stop_np.shape[0]):
        tile_lo = (gi // gxn) * tw + (gi % gxn) * gx_
        for wi in range(int(gs[gi]), int(gs[gi + 1])):
            mt = int(meta[wi])
            tx = (mt >> 9) - tile_lo
            if 0 <= tx < gx_ and wi < stop_np[gi, tx]:
                processed += 1
    print(json.dumps({
        "setting": {"n": n, "H": H, "W": W, "k": args.k,
                    "n_val": n_val, "f_pad": f_pad,
                    "total_win": total_win, "processed_win": processed,
                    "overflow": float(overflow[0])},
        "ms": {k: round(v, 2) for k, v in t.items()},
        "derived": {
            "odma_ms": round(t["bwd_full"] - t["bwd_no_odma"], 2),
            "per_window_us_full": round(
                t["bwd_full"] / max(processed, 1) * 1000, 2),
        },
    }))


if __name__ == "__main__":
    main()
