"""Golden-fixture regression tests (SURVEY §4c / VERDICT r1 item 9).

The CUDA reference cannot execute in this environment (its rasterizer
submodules are empty and there is no GPU), so true cross-stack pixel
parity is unverifiable here; these fixtures pin THIS stack's rendering
semantics instead: a checked-in snapshot ply + oracle-rendered
RGB/features/depth/alpha (tests/goldens/, generated once on the pristine
CPU backend). Every compositor backend — oracle, dense tiled, Pallas —
must keep reproducing them, so any semantic drift of the loader,
projection, SH eval, activations, or compositing across rounds fails
loudly. Loss semantics vs the reference are separately oracle-tested in
test_losses.py.
"""
import os

import numpy as np
import jax.numpy as jnp

GOLD = os.path.join(os.path.dirname(os.path.abspath(__file__)), "goldens")
H = W = 64


def _setup():
    from trase_tpu.models import gaussians as G
    from trase_tpu.models.gaussians_io import load_gaussian_ply
    from trase_tpu.ops.projection import compute_cov3d, project_gaussians
    from trase_tpu.renderer import make_render_camera

    params, aux, n, _ = load_gaussian_ply(
        os.path.join(GOLD, "golden_scene.ply"), sh_degree=2, capacity=None)
    z = np.load(os.path.join(GOLD, "golden_render.npz"))
    cam = make_render_camera(np.eye(3), np.array([0.0, 0.0, 3.0]),
                             0.9, 0.9, H, W)
    opacity = jnp.where(aux.alive, G.get_opacity(params)[:, 0], 0.0)
    cov3d = compute_cov3d(G.get_scaling(params), G.get_rotation(params))
    proj = project_gaussians(
        params.xyz, cov3d, opacity, cam.buffers, H, W,
        sh_coeffs=G.get_features(params), sh_degree=2)
    feats = np.asarray(params.gaussian_features)
    normed = feats / (np.linalg.norm(feats, axis=1, keepdims=True) + 1e-12)
    # dead (padded) rows: normalize their zero features to zero
    normed = np.where(np.asarray(aux.alive)[:, None], normed, 0.0)
    return proj, jnp.asarray(normed), jnp.asarray(z["bg"]), z


def _check(out, z, tol):
    np.testing.assert_allclose(np.asarray(out["render"]), z["render"],
                               atol=tol, err_msg="render")
    np.testing.assert_allclose(np.asarray(out["feats"]), z["feats"],
                               atol=tol, err_msg="feats")
    np.testing.assert_allclose(np.asarray(out["depth"]), z["depth"],
                               atol=tol * 20, err_msg="depth")
    np.testing.assert_allclose(np.asarray(out["alpha"]), z["alpha"],
                               atol=tol, err_msg="alpha")


def test_oracle_matches_golden():
    from trase_tpu.ops.rasterize_ref import rasterize_reference

    proj, extra, bg, z = _setup()
    out = rasterize_reference(proj, extra, bg, H, W)
    _check(out, z, 2e-6)


def test_dense_matches_golden():
    from trase_tpu.ops.rasterize import RasterConfig, rasterize_tiled

    proj, extra, bg, z = _setup()
    cfg = RasterConfig(pairs_per_gaussian=64, max_per_tile=256,
                       tile_batch=4)
    out = rasterize_tiled(proj, extra, bg, H, W, cfg)
    # tiled paths cull by the 3-sigma rect (CUDA semantics); the oracle
    # composites full ellipse tails -> small off-rect differences
    _check(out, z, 5e-3)


def test_pallas_matches_golden():
    from trase_tpu.ops.rasterize import RasterConfig
    from trase_tpu.ops.rasterize_pallas import rasterize_tiled_pallas

    proj, extra, bg, z = _setup()
    cfg = RasterConfig(pairs_per_gaussian=64, max_per_tile=256,
                       tile_batch=4)
    out = rasterize_tiled_pallas(proj, extra, bg, H, W, cfg,
                                 interpret=True)
    _check(out, z, 5e-3)
