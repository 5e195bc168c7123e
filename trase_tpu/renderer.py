"""Differentiable renderer façade.

Mirrors the reference's ``gaussian_renderer.render`` contract
(gaussian_renderer/__init__.py:37-155): applies the deformation deltas
(additive, or 6-DoF homogeneous transforms), evaluates SH (in the
projection stage), normalizes / optionally KNN-smooths the 32-dim
segmentation features, supports per-gaussian boolean masking for object
removal, and returns the same output keys:
``render, viewspace_points(-gradient carrier), visibility_filter, radii,
render_gaussian_features, depth``.

TPU-native differences:
- masking multiplies opacity by the mask instead of subsetting arrays
  (dynamic shapes are hostile to XLA; a zero-opacity gaussian is an
  exact no-op in the compositor);
- the screen-space gradient is carried by an explicit `mean2d_offset`
  input (zeros) added to the projected means, replacing the reference's
  retain_grad() trick (:47-52);
- ``render_composite`` (object composition) concatenates two gaussian
  sets ahead of one rasterizer invocation, like the reference (:251-331).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp
import numpy as np

from .models import gaussians as G
from .ops import rasterize as RT
from .ops import rasterize_pallas as RTP
from .ops.knn import smooth_features
from .ops.projection import CameraBuffers, compute_cov3d, project_gaussians
from .utils.rigid import from_homogeneous, to_homogeneous


def default_backend() -> str:
    """'pallas' on TPU, 'dense' elsewhere (CPU tests, interpret-free)."""
    import jax

    return "pallas" if jax.default_backend().startswith("tpu") else "dense"


def _rasterize(backend, proj, extra, bg_color, H, W, cfg,
               with_color=True, grad_values_only=False):
    if backend is None:
        backend = default_backend()
    if backend == "pallas":
        return RTP.rasterize_tiled_pallas(
            proj, extra, bg_color, H, W, cfg, with_color=with_color,
            grad_values_only=grad_values_only)
    if backend == "pallas_interpret":
        return RTP.rasterize_tiled_pallas(
            proj, extra, bg_color, H, W, cfg, interpret=True,
            with_color=with_color, grad_values_only=grad_values_only)
    if backend == "dense":
        # dense backend is plain XLA autodiff: unconsumed geometry
        # grads are dead code XLA removes itself; no flag needed
        return RT.rasterize_tiled(proj, extra, bg_color, H, W, cfg,
                                  with_color=with_color)
    raise ValueError(f"unknown rasterizer backend: {backend}")


class RenderCamera(NamedTuple):
    """Static-shape camera for jitted rendering. H/W live in python."""

    buffers: CameraBuffers
    image_height: int
    image_width: int


def make_render_camera(R: np.ndarray, T: np.ndarray, fovx: float, fovy: float,
                       image_height: int, image_width: int,
                       znear: float = 0.01, zfar: float = 100.0,
                       trans=np.array([0.0, 0.0, 0.0]), scale: float = 1.0
                       ) -> RenderCamera:
    from .utils import graphics

    wv = graphics.world_to_view(R, T, trans, scale).T
    proj = graphics.projection_matrix(znear, zfar, fovx, fovy).T
    full = wv @ proj
    campos = np.linalg.inv(wv)[3, :3]
    buffers = CameraBuffers(
        world_view=jnp.asarray(wv, jnp.float32),
        full_proj=jnp.asarray(full, jnp.float32),
        campos=jnp.asarray(campos, jnp.float32),
        tanfovx=jnp.float32(np.tan(fovx / 2)),
        tanfovy=jnp.float32(np.tan(fovy / 2)),
    )
    return RenderCamera(buffers=buffers, image_height=image_height,
                        image_width=image_width)


def apply_deformation(params: G.GaussianParams, d_xyz, d_rotation, d_scaling,
                      is_6dof: bool = False):
    """Deformed (means3D, scales, rotations) with activations applied.

    Matches gaussian_renderer/__init__.py:75-96: deltas are added to the
    ACTIVATED values — scales_act = exp(raw_scaling) + d_scaling and
    rot = normalize(normalize(raw_rot) + d_rotation). In 6-DoF mode d_xyz
    is a batch of homogeneous transforms applied to the canonical means.
    """
    if is_6dof and getattr(d_xyz, "ndim", 0) == 3:
        means3d = from_homogeneous(
            jnp.einsum("nij,nj->ni", d_xyz, to_homogeneous(params.xyz))
        )
    else:
        means3d = params.xyz + d_xyz
    scales = G.get_scaling(params) + d_scaling
    rots = G.get_rotation(params) + d_rotation
    rots = rots / (jnp.linalg.norm(rots, axis=-1, keepdims=True) + 1e-12)
    return means3d, scales, rots


def render(
    camera: RenderCamera,
    params: G.GaussianParams,
    aux_alive: jnp.ndarray,
    bg_color: jnp.ndarray,
    d_xyz=0.0,
    d_rotation=0.0,
    d_scaling=0.0,
    *,
    is_6dof: bool = False,
    scaling_modifier: float = 1.0,
    sh_degree: int = 3,
    override_color: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    norm_gaussian_features: bool = True,
    smooth_map: jnp.ndarray | None = None,
    smooth_rng=None,
    smooth_dropout: float = 0.5,
    mean2d_offset: jnp.ndarray | None = None,
    with_features: bool = True,
    with_color: bool = True,
    grad_values_only: bool = False,
    raster_cfg: RT.RasterConfig = RT.RasterConfig(),
    backend: str | None = None,
):
    """Render one view. Returns the reference's output dict.

    `grad_values_only=True` promises the caller consumes gradients only
    of the composited VALUES (features/rgb/depth), not of geometry /
    opacity / mean2d_offset — the Pallas backward then skips the alpha
    chain (see rasterize_tiled_pallas). Valid only when the loss's
    argnums really exclude geometry (FEATURE phase after densification
    ends).

    `aux_alive`: (C,) bool alive-mask; `mask`: optional (C,) bool keep-mask
    (False = removed, reference `render(mask=...)`); `smooth_map`: (C,K)
    neighbor indices to enable feature smoothing; `mean2d_offset`: (C,2)
    zeros whose gradient is the densification signal.

    `with_color=False` (requires with_features) composites only the 32
    feature channels + alpha — the FEATURE-phase fast path. The output
    dict then has no `render`/`depth` keys; SH evaluation is skipped
    entirely. Gradient-exact for losses that touch only the features
    (the reference's FEATURE phase, train.py:244-296).
    """
    H, W = camera.image_height, camera.image_width
    if not with_color and not with_features:
        raise ValueError("with_color=False requires with_features=True")

    means3d, scales, rots = apply_deformation(
        params, d_xyz, d_rotation, d_scaling, is_6dof
    )
    opacity = G.get_opacity(params)[:, 0]
    opacity = jnp.where(aux_alive, opacity, 0.0)
    if mask is not None:
        opacity = jnp.where(mask, opacity, 0.0)

    cov3d = compute_cov3d(scales, rots, scaling_modifier)

    if not with_color:
        # color is never composited: skip the SH evaluation entirely
        # (a zero placeholder keeps ProjectedGaussians total)
        proj = project_gaussians(
            means3d, cov3d, opacity, camera.buffers, H, W,
            colors_precomp=jnp.zeros((means3d.shape[0], 3),
                                     means3d.dtype),
        )
    elif override_color is not None:
        proj = project_gaussians(
            means3d, cov3d, opacity, camera.buffers, H, W,
            colors_precomp=override_color,
        )
    else:
        proj = project_gaussians(
            means3d, cov3d, opacity, camera.buffers, H, W,
            sh_coeffs=G.get_features(params), sh_degree=sh_degree,
        )

    if mean2d_offset is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)

    extra = None
    if with_features:
        feats = params.gaussian_features
        if smooth_map is not None:
            feats = smooth_features(feats, smooth_map, smooth_rng,
                                    smooth_dropout)
        if norm_gaussian_features:
            # safe norm: dead slots hold all-zero features and
            # linalg.norm's gradient at 0 is NaN
            feats = feats / jnp.sqrt(
                jnp.sum(feats * feats, axis=-1, keepdims=True) + 1e-12
            )
        extra = feats

    out = _rasterize(backend, proj, extra, bg_color, H, W, raster_cfg,
                     with_color=with_color,
                     grad_values_only=grad_values_only)

    result = {
        "visibility_filter": proj.radius > 0,
        "radii": proj.radius,
        "alpha": out["alpha"],
        "overflow": out["overflow"],
        # would-drop count at K//2 (pallas backend only): feeds the
        # trainer's pair-budget de-escalation; -1 = not available
        "overflow_half": out.get("overflow_half", jnp.float32(-1.0)),
    }
    if with_color:
        result["render"] = out["render"]
        result["depth"] = out["depth"]
    if with_features:
        result["render_gaussian_features"] = out["feats"]
        result["render_gaussian_features_hwc"] = out["feats_hwc"]
        if "feats_acc_hwc" in out:
            # pallas features-only fast path: [acc | feats] unsliced
            # (see rasterize_tiled_pallas) — lets the FEATURE loss
            # avoid the minor-dim channel-slice copy
            result["render_gaussian_features_acc_hwc"] = (
                out["feats_acc_hwc"])
    return result


def render_composite(
    camera: RenderCamera,
    bg_params: G.GaussianParams,
    bg_alive: jnp.ndarray,
    dyn_params: G.GaussianParams,
    dyn_alive: jnp.ndarray,
    d_xyz, d_rotation, d_scaling,
    bg_color: jnp.ndarray,
    scales_bias: float = 1.0,
    motion_bias=(0.0, 0.0, 0.0),
    rotation_bias=(0.0, 0.0, 0.0),
    *,
    sh_degree: int = 3,
    mask: jnp.ndarray | None = None,
    raster_cfg: RT.RasterConfig = RT.RasterConfig(),
    backend: str | None = None,
):
    """Composite a static background gaussian set with a deformed, edited
    dynamic set in a single rasterization (gaussian_renderer/__init__.py:
    251-331). The dynamic set is rescaled / rotated / translated by the
    edit biases before concatenation."""
    from .editing import transform_gaussians

    H, W = camera.image_height, camera.image_width

    means_d, scales_d, rots_d = apply_deformation(
        dyn_params, d_xyz, d_rotation, d_scaling
    )
    opa_d = G.get_opacity(dyn_params)[:, 0]
    opa_d = jnp.where(dyn_alive, opa_d, 0.0)
    if mask is not None:
        opa_d = jnp.where(mask, opa_d, 0.0)
    means_d, rots_d, scales_d = transform_gaussians(
        means_d, rots_d, scales_d, scales_bias, jnp.asarray(motion_bias),
        rotation_bias,
    )

    means_b = bg_params.xyz
    scales_b = G.get_scaling(bg_params)
    rots_b = G.get_rotation(bg_params)
    opa_b = jnp.where(bg_alive, G.get_opacity(bg_params)[:, 0], 0.0)

    means = jnp.concatenate([means_b, means_d], axis=0)
    scales = jnp.concatenate([scales_b, scales_d], axis=0)
    rots = jnp.concatenate([rots_b, rots_d], axis=0)
    opacity = jnp.concatenate([opa_b, opa_d], axis=0)
    shs = jnp.concatenate(
        [G.get_features(bg_params), G.get_features(dyn_params)], axis=0
    )

    cov3d = compute_cov3d(scales, rots, 1.0)
    proj = project_gaussians(
        means, cov3d, opacity, camera.buffers, H, W,
        sh_coeffs=shs, sh_degree=sh_degree,
    )
    out = _rasterize(backend, proj, None, bg_color, H, W, raster_cfg)
    return {"render": out["render"]}
