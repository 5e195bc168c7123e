#!/usr/bin/env python
"""Replay a dumped training step (tools/probe_nan.py --dump) and bisect
the gradient explosion: dense vs Pallas backend, and per-stage cuts.

The dump carries the exact pre-step gaussian parameters, deform-MLP
weights and camera of the poisoned iteration, so the backward can be
re-run under controlled variations:

    python tools/probe_grad_replay.py --dump /tmp/probe_nan_state.npz
"""
from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--dump", default="/tmp/probe_nan_state.npz")
    ap.add_argument("--pairs_per_gaussian", type=int, default=32)
    ap.add_argument("--max_per_tile", type=int, default=1024)
    ap.add_argument("--backends", default="pallas,dense")
    ap.add_argument("--no_deform", action="store_true",
                    help="replay with the deform field disabled")
    args = ap.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from trase_tpu.engine import trainer as T
    from trase_tpu.losses.image_losses import l1_loss
    from trase_tpu.models.deform import make_deform_network
    from trase_tpu.models.gaussians import GaussianParams
    from trase_tpu.ops.projection import CameraBuffers
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.ops.ssim import ssim
    from trase_tpu.renderer import RenderCamera, render

    z = np.load(args.dump)
    n = z["xyz"].shape[0]
    p = GaussianParams(
        xyz=jnp.asarray(z["xyz"]),
        features_dc=jnp.asarray(z["features_dc"]),
        features_rest=jnp.asarray(z["features_rest"]),
        scaling=jnp.asarray(z["scaling"]),
        rotation=jnp.asarray(z["rotation"]),
        opacity=jnp.asarray(z["opacity"]),
        gaussian_features=jnp.asarray(z["gaussian_features"]),
        cluster_id=jnp.zeros((n, 1), jnp.float32),
    )
    alive = jnp.asarray(z["alive"])
    H, W = int(z["image_height"]), int(z["image_width"])
    buffers = CameraBuffers(
        world_view=jnp.asarray(z["world_view"]),
        full_proj=jnp.asarray(z["full_proj"]),
        campos=jnp.asarray(z["campos"]),
        tanfovx=jnp.asarray(z["tanfovx"]),
        tanfovy=jnp.asarray(z["tanfovy"]),
    )
    camera = RenderCamera(buffers, H, W)
    # rebuild the deform variable tree from the flattened dump keys
    deform_vars = {"params": {}}
    for k in z.files:
        if k.startswith("deform__"):
            path = k[len("deform__"):]
            layer = path.split("'")[3]
            leaf = path.split("'")[5]
            deform_vars["params"].setdefault(layer, {})[leaf] = (
                jnp.asarray(z[k]))
    deform_net = make_deform_network("DeformNetwork", is_blender=True)
    fid = jnp.float32(float(z["fid"]))
    ast = jnp.float32(float(z["ast"]))
    use_deform = not args.no_deform
    raster_cfg = RasterConfig(
        pairs_per_gaussian=args.pairs_per_gaussian,
        max_per_tile=args.max_per_tile)
    gt = jnp.zeros((3, H, W), jnp.float32)
    bg = jnp.zeros((3,), jnp.float32)

    def run(backend):
        def loss_fn(params, dvars, off):
            d_xyz, d_rot, d_scale = T._apply_deform(
                deform_net, dvars, params.xyz, fid, ast,
                use_deform, stop_grad_deform=False,
                gaussian_features=params.gaussian_features)
            out = render(camera, params, alive, bg,
                         d_xyz, d_rot, d_scale,
                         is_6dof=False, sh_degree=3,
                         mean2d_offset=off, with_features=False,
                         raster_cfg=raster_cfg, backend=backend)
            image = out["render"]
            loss = 0.8 * l1_loss(image, gt) + 0.2 * (1 - ssim(image, gt))
            return loss, out

        off = jnp.zeros((n, 2), jnp.float32)
        (loss, out), grads = jax.jit(
            jax.value_and_grad(loss_fn, argnums=(0, 1, 2), has_aux=True)
        )(p, deform_vars, off)
        gp, gdeform, goff = grads
        print(f"[{backend}] loss={float(loss):.6f}")
        row_maxg = np.zeros((n,), np.float64)
        for name in ("xyz", "scaling", "rotation", "opacity",
                     "features_dc"):
            g = np.abs(np.asarray(getattr(gp, name), np.float64))
            g = np.where(np.isfinite(g), g, np.inf).reshape(n, -1)
            print(f"[{backend}] grad[{name}]: max|g|={g.max():.3e}")
            row_maxg = np.maximum(row_maxg, g.max(axis=1))
        goff_np = np.abs(np.asarray(goff, np.float64))
        print(f"[{backend}] grad[mean2d_offset]: max|g|={goff_np.max():.3e}")
        flat = jax.tree_util.tree_leaves(gdeform)
        dmax = max(float(np.abs(np.asarray(x)).max()) for x in flat)
        print(f"[{backend}] deform grads: max|g|={dmax:.3e}")
        top = np.argsort(-row_maxg)[:8]
        print(f"[{backend}] top rows: "
              + ", ".join(f"{r}:{row_maxg[r]:.2e}" for r in top))
        return row_maxg

    for backend in args.backends.split(","):
        run(backend.strip())


if __name__ == "__main__":
    main()
