"""Per-Gaussian projection stage of the rasterizer (pure jnp, vectorized).

Implements the EWA-splatting preprocessing contract of the reference's
CUDA rasterizer (submodules/diff-gaussian-rasterization, interface pinned
by gaussian_renderer/__init__.py:58-146): world->view transform, frustum
cull, 3D covariance from scale/rotation, perspective Jacobian to 2D
covariance with the +0.3 pixel low-pass, conic + screen radius, and
SH->RGB evaluation. Everything is embarrassingly parallel over N — on
TPU it's one fused elementwise pipeline plus small matmuls.
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..utils.quaternion import build_scaling_rotation, unpack_sym33
from ..utils.sh import eval_sh


class CameraBuffers(NamedTuple):
    """Device-side camera parameters (all jnp arrays; H/W static ints)."""

    world_view: jnp.ndarray  # (4,4), row-vector convention (pre-transposed)
    full_proj: jnp.ndarray  # (4,4), row-vector convention
    campos: jnp.ndarray  # (3,)
    tanfovx: jnp.ndarray  # scalar
    tanfovy: jnp.ndarray  # scalar


class ProjectedGaussians(NamedTuple):
    mean2d: jnp.ndarray  # (N,2) pixel coords
    depth: jnp.ndarray  # (N,) view-space z
    conic: jnp.ndarray  # (N,3) inverse 2D covariance (a,b,c): ax^2+2bxy+cy^2
    radius: jnp.ndarray  # (N,) float screen radius, 0 => culled
    color: jnp.ndarray  # (N,3) RGB from SH (or precomputed)
    opacity: jnp.ndarray  # (N,)
    valid: jnp.ndarray  # (N,) bool visibility


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) activated scales + (N,4) quats -> (N,3,3) covariance."""
    L = build_scaling_rotation(scale_modifier * scales, rotations)
    return jnp.matmul(L, jnp.swapaxes(L, 1, 2))


def project_gaussians(
    means3d: jnp.ndarray,
    cov3d: jnp.ndarray,
    opacities: jnp.ndarray,
    cam: CameraBuffers,
    image_height: int,
    image_width: int,
    sh_coeffs: jnp.ndarray | None = None,
    sh_degree: int = 0,
    colors_precomp: jnp.ndarray | None = None,
    znear: float = 0.2,
) -> ProjectedGaussians:
    """EWA projection of N gaussians to screen space.

    means3d: (N,3); cov3d: (N,3,3) or packed (N,6); opacities: (N,) or (N,1);
    sh_coeffs: (N, (deg+1)^2, 3) or None when colors_precomp is given.
    """
    N = means3d.shape[0]
    if cov3d.ndim == 2:
        cov3d = unpack_sym33(cov3d)
    opacities = opacities.reshape(N)

    ones = jnp.ones((N, 1), dtype=means3d.dtype)
    hom = jnp.concatenate([means3d, ones], axis=1)

    # View space (row-vector convention: p' = p @ M, matching the
    # reference's pre-transposed world_view_transform).
    p_view = hom @ cam.world_view
    t = p_view[:, :3]
    tz_raw = t[:, 2]
    # Culled gaussians (tz <= znear, e.g. parked dead slots at the origin
    # with tz == 0) must not poison gradients: 0/0 forward NaNs survive
    # the downstream validity `where` in the backward pass. Divide by a
    # sanitized tz instead — culled outputs are discarded anyway.
    behind = tz_raw <= znear
    tz = jnp.where(behind, jnp.ones_like(tz_raw), tz_raw)

    # Clip space -> NDC -> pixels.
    p_hom = hom @ cam.full_proj
    p_w = 1.0 / (p_hom[:, 3] + 1e-7)
    p_ndc = p_hom[:, :3] * p_w[:, None]
    # CUDA rasterizer: pix = ((ndc + 1) * S - 1) * 0.5
    mean2d = jnp.stack(
        [
            ((p_ndc[:, 0] + 1.0) * image_width - 1.0) * 0.5,
            ((p_ndc[:, 1] + 1.0) * image_height - 1.0) * 0.5,
        ],
        axis=1,
    )

    # EWA: J W Sigma W^T J^T with clamped view-space x/y (1.3 * tan(fov/2)).
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = jnp.clip(t[:, 0] / tz, -limx, limx) * tz
    tytz = jnp.clip(t[:, 1] / tz, -limy, limy) * tz

    focal_x = image_width / (2.0 * cam.tanfovx)
    focal_y = image_height / (2.0 * cam.tanfovy)

    zero = jnp.zeros_like(tz)
    J = jnp.stack(
        [
            focal_x / tz, zero, -(focal_x * txtz) / (tz * tz),
            zero, focal_y / tz, -(focal_y * tytz) / (tz * tz),
        ],
        axis=-1,
    ).reshape(N, 2, 3)

    W = cam.world_view[:3, :3].T  # rotation part, column-vector convention
    T_mat = J @ W  # (N,2,3)
    cov2d = T_mat @ cov3d @ jnp.swapaxes(T_mat, 1, 2)  # (N,2,2)

    # Low-pass filter: every splat is at least ~1px wide (the +0.3 of the
    # reference kernel).
    a = cov2d[:, 0, 0] + 0.3
    b = cov2d[:, 0, 1]
    c = cov2d[:, 1, 1] + 0.3

    det = a * c - b * b
    det_inv = 1.0 / (det + 1e-12)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=1)

    # Screen-space radius: 3 sigma of the major axis.
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Frustum / validity culling.
    valid = ~behind & (det > 0.0)
    in_image = (
        (mean2d[:, 0] + radius > 0)
        & (mean2d[:, 0] - radius < image_width)
        & (mean2d[:, 1] + radius > 0)
        & (mean2d[:, 1] - radius < image_height)
    )
    valid = valid & in_image
    radius = jnp.where(valid, radius, 0.0)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        # sh_coeffs: (N, K, 3) -> eval along camera ray directions.
        dirs = means3d - cam.campos[None, :]
        dirs = dirs / (jnp.linalg.norm(dirs, axis=1, keepdims=True) + 1e-9)
        shs_view = jnp.swapaxes(sh_coeffs, 1, 2)  # (N, 3, K)
        color = jnp.maximum(eval_sh(sh_degree, shs_view, dirs) + 0.5, 0.0)

    return ProjectedGaussians(
        mean2d=mean2d,
        depth=tz,
        conic=conic,
        radius=radius,
        color=color,
        opacity=opacities,
        valid=valid,
    )
