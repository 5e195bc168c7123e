#!/usr/bin/env python
"""Capture a jax.profiler device trace of the bench-setting hot paths.

Jits the flagship frame (render fwd), the GAUSSIAN train step, and the
FEATURE train step at bench.py's setting (1008x1344, 100k gaussians,
K=6), then records a few steady-state iterations of each under
jax.profiler.trace. The trace (perfetto/tensorboard format) gives
per-kernel device times — the only reliable per-stage breakdown here:
isolated per-stage jits measured through the axon tunnel carry a
50-200 ms constant dispatch artifact (see BASELINE.md round-4 notes).

Usage: python tools/trace_steps.py --out /tmp/trase_trace [--iters 5]
Inspect: python tools/trace_steps.py --summarize /tmp/trase_trace
"""
from __future__ import annotations

import argparse
import glob
import gzip
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

H, W = 1008, 1344
N = 100_000


def summarize(trace_dir: str, top: int = 25):
    """Aggregate device-op durations from the .trace.json.gz."""
    paths = glob.glob(os.path.join(
        trace_dir, "**", "*.trace.json.gz"), recursive=True)
    if not paths:
        print(f"no trace files under {trace_dir}")
        return
    path = max(paths, key=os.path.getmtime)
    with gzip.open(path, "rt") as f:
        data = json.load(f)
    events = data.get("traceEvents", [])
    # device lanes: pid names containing "TPU"/"Device" — fall back to
    # aggregating complete events by name everywhere
    pid_names = {e["pid"]: e["args"].get("name", "")
                 for e in events
                 if e.get("ph") == "M" and e.get("name") == "process_name"
                 and "args" in e}
    dev_pids = {p for p, nm in pid_names.items()
                if "TPU" in nm or "/device:" in nm or "Chip" in nm}
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        if dev_pids and e.get("pid") not in dev_pids:
            continue
        nm = e.get("name", "?")
        agg.setdefault(nm, [0.0, 0])
        agg[nm][0] += e.get("dur", 0) / 1000.0  # us -> ms
        agg[nm][1] += 1
    rows = sorted(agg.items(), key=lambda kv: -kv[1][0])[:top]
    print(f"{'total_ms':>10} {'count':>6}  op  ({os.path.basename(path)})")
    for nm, (ms, c) in rows:
        print(f"{ms:10.2f} {c:6d}  {nm[:110]}")


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="/tmp/trase_trace")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--summarize", default=None,
                    help="skip capture; summarize an existing trace dir")
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args(argv)

    if args.summarize:
        summarize(args.summarize, args.top)
        return

    import jax
    import jax.numpy as jnp

    from trase_tpu.engine import trainer as T
    from trase_tpu.models import gaussians as G
    from trase_tpu.models.deform import (
        deform_step, init_deform, make_deform_network,
    )
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.renderer import make_render_camera, render

    rng = np.random.default_rng(0)
    pts = (rng.normal(size=(N, 3)) * 1.2).astype(np.float32)
    pts[:, 2] += 4.0
    cols = rng.uniform(size=(N, 3)).astype(np.float32)
    params, aux = G.from_point_cloud(
        pts, cols, sh_degree=3, capacity=131072,
        dist2=np.full(N, 0.0004, np.float32))
    params = params._replace(gaussian_features=jnp.asarray(
        rng.normal(size=(131072, G.FEATURE_DIM)).astype(np.float32)))
    cam = make_render_camera(np.eye(3), np.zeros(3), 1.2, 0.95, H, W)
    net = make_deform_network("DeformNetwork")
    dvars = init_deform(jax.random.PRNGKey(0), net)
    cfg = RasterConfig(pairs_per_gaussian=6, max_per_tile=512,
                       tile_batch=64)
    state = T.init_train_state(params, aux, dvars)
    lrs = T.LearningRates(*[jnp.float32(1e-4)] * 8)
    gt = jnp.asarray(rng.uniform(size=(3, H, W)).astype(np.float32))
    hm, wm = H // 4, W // 4
    masks = jnp.asarray((rng.random((8, hm, wm)) > 0.7)
                        .astype(np.float32))

    @jax.jit
    def frame(params, dvars, fid):
        t = jnp.full((params.xyz.shape[0], 1), 0.0) + fid
        d = deform_step(net, dvars, params.xyz, t, dtype=jnp.bfloat16)
        return render(cam, params, aux.alive, jnp.zeros(3), *d,
                      sh_degree=3, with_features=False,
                      raster_cfg=cfg)["render"]

    def gstep(state, fid):
        return T.gaussian_phase_step(
            state, cam.buffers, gt, fid, jnp.float32(0.0), lrs,
            jnp.zeros(3), deform_net=net, image_height=H, image_width=W,
            sh_degree=3, use_deform=True, is_6dof=False,
            lambda_dssim=0.2, lambda_reg_deform=0.0, raster_cfg=cfg)

    gstep = jax.jit(gstep)

    def fstep(state, fid, key):
        return T.feature_phase_step(
            state, cam.buffers, masks, jnp.ones((8,), bool), fid, key,
            lrs, jnp.zeros(3), jnp.zeros((131072, 1), jnp.int32),
            deform_net=net, image_height=H, image_width=W, sh_degree=3,
            use_deform=True, is_6dof=False, contrastive_mode="soft",
            rfn=1.0, positive_th=0.75, negative_th=0.5,
            num_sampled_pixels=4096, num_sampled_masks=8,
            use_smoothing=False, smooth_dropout=0.5, mask_hw=(hm, wm),
            raster_cfg=cfg)

    fstep = jax.jit(fstep)

    def drain(x):
        return np.asarray(jnp.ravel(
            jax.tree_util.tree_leaves(x)[0])[:1])

    # compile + steady state OUTSIDE the trace
    print("[trace] compiling...", flush=True)
    img = frame(params, dvars, jnp.float32(0.4)); drain(img)
    s1, m1 = gstep(state, jnp.float32(0.3)); drain(m1["loss"])
    s2, m2 = fstep(state, jnp.float32(0.3), jax.random.PRNGKey(0))
    drain(m2["loss"])
    print("[trace] capturing...", flush=True)

    # isolated kernel-stage jits (probe_bwd_kernel's set): their DEVICE
    # durations inside the trace are accurate even though host-side
    # dispatch through the tunnel is not (BASELINE round-4 notes)
    from trase_tpu.ops import rasterize_pallas as RP
    from trase_tpu.ops.projection import compute_cov3d, project_gaussians
    from trase_tpu.ops.rasterize import _tile_grid

    @jax.jit
    def f_proj(params):
        cov3d = compute_cov3d(G.get_scaling(params),
                              G.get_rotation(params), 1.0)
        op = jnp.where(aux.alive, G.get_opacity(params)[:, 0], 0.0)
        return project_gaussians(
            params.xyz, cov3d, op, cam.buffers, H, W,
            sh_coeffs=G.get_features(params), sh_degree=3)

    proj = f_proj(params)
    th, tw = _tile_grid(H, W)
    f_layout = jax.jit(lambda pr: RP.build_window_layout(pr, H, W, cfg))
    sorted_pid, slot_of_sorted, layout, _ = f_layout(proj)
    payload, n_val = RP.build_payload(proj, None)
    gather = jax.jit(RP._gather_pairs)
    ps_t = gather(payload, sorted_pid)
    kw = dict(num_tiles=th * tw, tw=tw, n_val=n_val, interpret=False)
    f_fwdr = jax.jit(lambda ps: RP._forward_impl(ps, layout, **kw))
    patches, logt_stop, stop = f_fwdr(ps_t)
    g = jnp.ones_like(patches)
    f_bwd = jax.jit(lambda *a: RP._backward_impl(*a, **kw))
    f_bwd_nodma = jax.jit(lambda *a: RP._backward_impl(
        *a, **kw, emit_grads=False))
    dpay = f_bwd(ps_t, layout, g, logt_stop, stop)
    f_unsort = jax.jit(lambda d: RP.unsort_slot_gradients(
        d, sorted_pid, slot_of_sorted, payload.shape[0]))
    drain(f_bwd_nodma(ps_t, layout, g, logt_stop, stop))
    drain(f_unsort(dpay))

    jax.profiler.start_trace(args.out)
    for i in range(args.iters):
        img = frame(params, dvars, jnp.float32(0.4 + i * 1e-3))
    drain(img)
    for i in range(args.iters):
        s1, m1 = gstep(s1, jnp.float32(0.3 + i * 1e-3))
    drain(m1["loss"])
    for i in range(args.iters):
        s2, m2 = fstep(s2, jnp.float32(0.3 + i * 1e-3),
                       jax.random.PRNGKey(i))
    drain(m2["loss"])
    for _ in range(args.iters):
        lay = f_layout(proj)
        ps2 = gather(payload, sorted_pid)
        out = f_fwdr(ps2)
        d2 = f_bwd(ps2, layout, g, logt_stop, stop)
        d3 = f_bwd_nodma(ps2, layout, g, logt_stop, stop)
        u = f_unsort(d2)
    drain(u)
    jax.profiler.stop_trace()
    print(f"[trace] wrote {args.out}")
    summarize(args.out, args.top)


if __name__ == "__main__":
    main()
