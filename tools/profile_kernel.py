#!/usr/bin/env python
"""Stage-by-stage profile of the Pallas rasterization pipeline at the
bench configuration (1K, 100k gaussians). Dev tool, not part of bench.

Times each stage with queue-drain semantics (host fetch of one value).
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from trase_tpu.models import gaussians as G
from trase_tpu.ops import projection as P
from trase_tpu.ops import rasterize as R
from trase_tpu.ops import rasterize_pallas as RP
from trase_tpu.renderer import make_render_camera

N = 100_000
H, W = 1008, 1344
K = 6


def timeit(fn, *args, iters=20, warmup=3):
    out = None
    for _ in range(warmup):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    _ = np.asarray(jnp.ravel(jax.tree_util.tree_leaves(out)[0])[:1])
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N, 3)) * 1.2).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(size=(N, 3)).astype(np.float32)
    d2 = np.full(N, 0.0004, np.float32)
    params, aux = G.from_point_cloud(pts, cols, sh_degree=3,
                                     capacity=131072, dist2=d2)
    cam = make_render_camera(np.eye(3), np.zeros(3), 1.2, 0.95, H, W)
    cfg = R.RasterConfig(pairs_per_gaussian=K)

    opac = jax.nn.sigmoid(params.opacity[:, 0]) * aux.alive
    scales = jnp.exp(params.scaling)
    sh = jnp.concatenate([params.features_dc, params.features_rest], axis=1)

    @jax.jit
    def project(params):
        cov = P.compute_cov3d(scales, params.rotation)
        return P.project_gaussians(params.xyz, cov, opac, cam.buffers,
                                   H, W, sh_coeffs=sh, sh_degree=3)

    proj = project(params)
    print(f"project: {timeit(project, params):.2f} ms")

    layout_fn = jax.jit(lambda p: RP.build_window_layout(p, H, W, cfg))
    sorted_pid, slot_of_sorted, layout, overflow = layout_fn(proj)
    print(f"layout build (sort+fills): {timeit(layout_fn, proj):.2f} ms")

    n_feat = int(os.environ.get("FEAT", "0"))
    extra = (jnp.zeros((proj.mean2d.shape[0], n_feat)) if n_feat else None)
    pay_fn = jax.jit(lambda p: RP.build_payload(p, extra)[0])
    payload = pay_fn(proj)
    n_val = 3 + n_feat + 1
    print(f"payload table build: {timeit(pay_fn, proj):.2f} ms")

    gather_fn = jax.jit(RP._gather_pairs)
    ps_t = gather_fn(payload, sorted_pid)
    print(f"pair gather: {timeit(gather_fn, payload, sorted_pid):.2f} ms "
          f"(ps_t {ps_t.shape})")

    th, tw = R._tile_grid(H, W)
    num_tiles = th * tw

    fwd_fn = jax.jit(lambda p, l: RP._forward_impl(
        p, l, num_tiles=num_tiles, tw=tw, n_val=n_val, interpret=False))
    out, logt_stop, stop = fwd_fn(ps_t, layout)
    print(f"forward kernel: {timeit(fwd_fn, ps_t, layout):.2f} ms")

    g = jnp.ones_like(out)
    bwd_fn = jax.jit(lambda p, l, g, ls, st: RP._backward_impl(
        p, l, g, ls, st, num_tiles=num_tiles, tw=tw, n_val=n_val,
        interpret=False))
    dpay = bwd_fn(ps_t, layout, g, logt_stop, stop)
    print(f"backward kernel: "
          f"{timeit(bwd_fn, ps_t, layout, g, logt_stop, stop):.2f} ms")

    # unsort pieces
    nk = sorted_pid.shape[0]
    slot_cap, f_pad = dpay.shape

    sort_fn = jax.jit(lambda sp, ss: jax.lax.sort((sp, ss), num_keys=1)[1])
    idx = sort_fn(sorted_pid, slot_of_sorted)
    print(f"unsort sort: {timeit(sort_fn, sorted_pid, slot_of_sorted):.2f} ms")

    def gath(dpay, idx):
        rows = jnp.where((idx < slot_cap)[:, None],
                         dpay[jnp.minimum(idx, slot_cap - 1)], 0.0)
        nn = payload.shape[0] - 1
        k = nk // nn
        return jnp.sum(rows.reshape(nn, k, f_pad), axis=1)
    gath_fn = jax.jit(gath)
    _ = gath_fn(dpay, idx)
    print(f"unsort gather+fold: {timeit(gath_fn, dpay, idx):.2f} ms")

    # full composite fwd+bwd through custom vjp
    @jax.jit
    def full(payload, sorted_pid, slot_of_sorted, layout):
        def loss(pl_):
            o = RP.pallas_composite((num_tiles, tw, n_val, False), pl_,
                                    sorted_pid, slot_of_sorted, layout)
            return jnp.sum(o)
        return jax.grad(loss)(payload)
    _ = full(payload, sorted_pid, slot_of_sorted, layout)
    print(f"full fwd+bwd (vjp): "
          f"{timeit(full, payload, sorted_pid, slot_of_sorted, layout):.2f}"
          " ms")


if __name__ == "__main__":
    main()
