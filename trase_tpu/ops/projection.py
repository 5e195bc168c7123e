"""Per-Gaussian projection stage of the rasterizer (pure jnp, vectorized).

Implements the EWA-splatting preprocessing contract of the reference's
CUDA rasterizer (submodules/diff-gaussian-rasterization, interface pinned
by gaussian_renderer/__init__.py:58-146): world->view transform, frustum
cull, 3D covariance from scale/rotation, perspective Jacobian to 2D
covariance with the +0.3 pixel low-pass, conic + screen radius, and
SH->RGB evaluation.

TPU layout note: everything is computed in structure-of-arrays form —
per-gaussian components as (N,) vectors so N rides the 128-lane axis.
Batched (N,3,3) matmuls or (N,3) minor-dim arithmetic waste >95% of
the VPU lanes on TPU (the minor dim maps to lanes); the quaternion,
covariance, and EWA algebra is therefore expanded to scalar formulas.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..utils.sh import C0, C1, C2, C3

# Minimum contributing alpha. Defined HERE (not rasterize_ref, which
# re-exports it) because the extent cull below and every backend's
# alpha threshold must be the same constant: the cull drops tiles that
# the kernels would zero anyway (reference CUDA forward.cu's 1/255).
ALPHA_EPS = 1.0 / 255.0


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
    # (N,2) half-extents (px) of the exact contributing support's AABB:
    # alpha >= ALPHA_EPS only inside the ellipse q <= 2(log op - log
    # ALPHA_EPS), whose AABB is (sqrt(t*cov00), sqrt(t*cov11)). Every
    # backend composites exactly zero (with zero gradient) outside it,
    # so tile binning with this box instead of the circular 3-sigma
    # `radius` square is output-exact while cutting the pair count for
    # anisotropic and low-opacity splats. None => use `radius`.
    extent: jnp.ndarray | None = None


def compute_cov3d(scales: jnp.ndarray, rotations: jnp.ndarray,
                  scale_modifier: float = 1.0) -> jnp.ndarray:
    """(N,3) activated scales + (N,4) wxyz quats -> (N,6) packed symmetric
    covariance [xx, xy, xz, yy, yz, zz] = R diag(s^2) R^T.

    Matches the reference's build_scaling_rotation -> L L^T
    (utils/general_utils.py:122-154), expanded to elementwise form.
    """
    q = rotations / jnp.linalg.norm(rotations, axis=-1, keepdims=True)
    w, x, y, z = q[:, 0], q[:, 1], q[:, 2], q[:, 3]
    # rotation matrix rows (scalar formulas)
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    s0 = (scale_modifier * scales[:, 0]) ** 2
    s1 = (scale_modifier * scales[:, 1]) ** 2
    s2 = (scale_modifier * scales[:, 2]) ** 2
    xx = s0 * r00 * r00 + s1 * r01 * r01 + s2 * r02 * r02
    xy = s0 * r00 * r10 + s1 * r01 * r11 + s2 * r02 * r12
    xz = s0 * r00 * r20 + s1 * r01 * r21 + s2 * r02 * r22
    yy = s0 * r10 * r10 + s1 * r11 * r11 + s2 * r12 * r12
    yz = s0 * r10 * r20 + s1 * r11 * r21 + s2 * r12 * r22
    zz = s0 * r20 * r20 + s1 * r21 * r21 + s2 * r22 * r22
    return jnp.stack([xx, xy, xz, yy, yz, zz], axis=1)


def _sh_basis(deg: int, x, y, z):
    """Real SH basis values b_k(dir), k < (deg+1)^2, each (N,). Same
    constants/order as utils.sh.eval_sh (reference
    utils/sh_utils.py:57-112).
    """
    basis = [jnp.full_like(x, C0)]
    if deg > 0:
        basis += [-C1 * y, C1 * z, -C1 * x]
        if deg > 1:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            basis += [
                C2[0] * xy, C2[1] * yz, C2[2] * (2.0 * zz - xx - yy),
                C2[3] * xz, C2[4] * (xx - yy),
            ]
            if deg > 2:
                basis += [
                    C3[0] * y * (3 * xx - yy),
                    C3[1] * xy * z,
                    C3[2] * y * (4 * zz - xx - yy),
                    C3[3] * z * (2 * zz - 3 * xx - 3 * yy),
                    C3[4] * x * (4 * zz - xx - yy),
                    C3[5] * z * (xx - yy),
                    C3[6] * x * (xx - 3 * yy),
                ]
    return jnp.stack(basis, axis=0)  # (K, N): K sublanes, N lanes


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

    means3d: (N,3); cov3d: packed (N,6) [xx,xy,xz,yy,yz,zz] or (N,3,3);
    opacities: (N,) or (N,1); sh_coeffs: (N, (deg+1)^2, 3) or None when
    colors_precomp is given.
    """
    N = means3d.shape[0]
    if cov3d.ndim == 3:
        cov3d = jnp.stack(
            [cov3d[:, 0, 0], cov3d[:, 0, 1], cov3d[:, 0, 2],
             cov3d[:, 1, 1], cov3d[:, 1, 2], cov3d[:, 2, 2]], axis=1)
    opacities = opacities.reshape(N)

    mx, my_, mz = means3d[:, 0], means3d[:, 1], means3d[:, 2]
    WV = cam.world_view  # (4,4) row-vector convention: p' = p @ WV

    # View space (p_view = [x y z 1] @ WV)
    tx = mx * WV[0, 0] + my_ * WV[1, 0] + mz * WV[2, 0] + WV[3, 0]
    ty = mx * WV[0, 1] + my_ * WV[1, 1] + mz * WV[2, 1] + WV[3, 1]
    tz_raw = mx * WV[0, 2] + my_ * WV[1, 2] + mz * WV[2, 2] + WV[3, 2]
    # Culled gaussians (tz <= znear, e.g. parked dead slots at the origin
    # with tz == 0) must not poison gradients: 0/0 forward NaNs survive
    # the downstream validity `where` in the backward pass. Divide by a
    # sanitized tz instead — culled outputs are discarded anyway.
    behind = tz_raw <= znear
    tz = jnp.where(behind, jnp.ones_like(tz_raw), tz_raw)

    # Clip space -> NDC -> pixels.
    FP = cam.full_proj
    hx = mx * FP[0, 0] + my_ * FP[1, 0] + mz * FP[2, 0] + FP[3, 0]
    hy = mx * FP[0, 1] + my_ * FP[1, 1] + mz * FP[2, 1] + FP[3, 1]
    hw = mx * FP[0, 3] + my_ * FP[1, 3] + mz * FP[2, 3] + FP[3, 3]
    p_w = 1.0 / (hw + 1e-7)
    # CUDA rasterizer: pix = ((ndc + 1) * S - 1) * 0.5
    px = ((hx * p_w + 1.0) * image_width - 1.0) * 0.5
    py = ((hy * p_w + 1.0) * image_height - 1.0) * 0.5

    # EWA: J W Sigma W^T J^T with clamped view-space x/y (1.3 tan(fov/2)).
    limx = 1.3 * cam.tanfovx
    limy = 1.3 * cam.tanfovy
    txtz = jnp.clip(tx / tz, -limx, limx) * tz
    tytz = jnp.clip(ty / tz, -limy, limy) * tz
    focal_x = image_width / (2.0 * cam.tanfovx)
    focal_y = image_height / (2.0 * cam.tanfovy)

    # J = [[fx/tz, 0, -fx*txtz/tz^2], [0, fy/tz, -fy*tytz/tz^2]],
    # W = world_view[:3,:3]^T (column-vector rotation), T = J @ W:
    inv_tz = 1.0 / tz
    j00 = focal_x * inv_tz
    j02 = -(focal_x * txtz) * inv_tz * inv_tz
    j11 = focal_y * inv_tz
    j12 = -(focal_y * tytz) * inv_tz * inv_tz
    # W[i, k] = WV[k, i] (since world_view is stored pre-transposed)
    t00 = j00 * WV[0, 0] + j02 * WV[0, 2]
    t01 = j00 * WV[1, 0] + j02 * WV[1, 2]
    t02 = j00 * WV[2, 0] + j02 * WV[2, 2]
    t10 = j11 * WV[0, 1] + j12 * WV[0, 2]
    t11 = j11 * WV[1, 1] + j12 * WV[1, 2]
    t12 = j11 * WV[2, 1] + j12 * WV[2, 2]

    cxx, cxy, cxz = cov3d[:, 0], cov3d[:, 1], cov3d[:, 2]
    cyy, cyz, czz = cov3d[:, 3], cov3d[:, 4], cov3d[:, 5]
    # S @ T^T rows (u = row of T mapped through Sigma)
    s0t0 = cxx * t00 + cxy * t01 + cxz * t02
    s1t0 = cxy * t00 + cyy * t01 + cyz * t02
    s2t0 = cxz * t00 + cyz * t01 + czz * t02
    s0t1 = cxx * t10 + cxy * t11 + cxz * t12
    s1t1 = cxy * t10 + cyy * t11 + cyz * t12
    s2t1 = cxz * t10 + cyz * t11 + czz * t12
    a = t00 * s0t0 + t01 * s1t0 + t02 * s2t0 + 0.3
    b = t00 * s0t1 + t01 * s1t1 + t02 * s2t1
    c = t10 * s0t1 + t11 * s1t1 + t12 * s2t1 + 0.3

    det = a * c - b * b
    det_inv = 1.0 / (det + 1e-12)
    conic = jnp.stack([c * det_inv, -b * det_inv, a * det_inv], axis=1)

    # Screen-space radius: 3 sigma of the major axis.
    mid = 0.5 * (a + c)
    lambda1 = mid + jnp.sqrt(jnp.maximum(0.1, mid * mid - det))
    radius = jnp.ceil(3.0 * jnp.sqrt(lambda1))

    # Frustum / validity culling. Zero-opacity gaussians (dead capacity
    # slots, masked-out gaussians) are culled too: they contribute
    # exactly nothing but would otherwise flood the per-tile lists —
    # a dead slot at the origin with unit scale covers the whole image
    # and can push real gaussians past the per-tile compositing budget.
    valid = ~behind & (det > 0.0) & (opacities > 0.0)
    in_image = (
        (px + radius > 0)
        & (px - radius < image_width)
        & (py + radius > 0)
        & (py - radius < image_height)
    )
    valid = valid & in_image
    radius = jnp.where(valid, radius, 0.0)

    # Exact-support AABB (see ProjectedGaussians.extent). Clipped to
    # `radius` so the existing >3-sigma truncation semantics (and the
    # stored goldens) are preserved exactly: the binned tile set is a
    # subset of the radius square, and every dropped tile satisfies
    # q > t at all its pixels, i.e. contributes exactly zero alpha and
    # zero gradient under the kernels' ALPHA_EPS threshold.
    t_sup = 2.0 * (jnp.log(jnp.maximum(opacities, 1e-38))
                   - float(np.log(ALPHA_EPS)))
    t_sup = jnp.maximum(t_sup, 0.0)
    # (1 + 4 ulp) pad: ex/ey are f32-computed from (a, c) while the
    # kernels evaluate support via the regularized-inverse conic, so
    # the two can disagree by ~1 ulp at the support boundary; the pad
    # keeps the AABB conservative (never drops a boundary pixel with
    # alpha == ALPHA_EPS) at zero binning cost (ADVICE r4)
    pad = 1.0 + 4.0 * np.float32(np.finfo(np.float32).eps)
    ex = jnp.minimum(jnp.sqrt(t_sup * jnp.maximum(a, 0.0)) * pad, radius)
    ey = jnp.minimum(jnp.sqrt(t_sup * jnp.maximum(c, 0.0)) * pad, radius)
    extent = jnp.where(valid[:, None], jnp.stack([ex, ey], axis=1), 0.0)

    if colors_precomp is not None:
        color = colors_precomp
    else:
        dx = mx - cam.campos[0]
        dy = my_ - cam.campos[1]
        dz = mz - cam.campos[2]
        inv_n = 1.0 / jnp.sqrt(dx * dx + dy * dy + dz * dz + 1e-18)
        # (N,K,3) -> (K,3,N) via an MXU identity contraction: XLA's
        # minor-to-major relayout costs ~3 ms at 131k gaussians, the
        # (K*3, K*3) @ (K*3, N) matmul ~1.9 ms (measured, v5e)
        kk = sh_coeffs.shape[1] * 3
        flat = sh_coeffs.reshape(N, kk)
        eye = jnp.eye(kk, dtype=flat.dtype)
        # Precision.HIGHEST: on TPU the default MXU precision truncates
        # f32 operands to bf16; this identity contraction is a pure
        # relayout and must not round the SH coefficients (or their
        # gradients through the transposed contraction).
        sh_t = jax.lax.dot_general(
            eye, flat, (((1,), (1,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32,
        ).reshape(sh_coeffs.shape[1], 3, N)
        bas = _sh_basis(sh_degree, dx * inv_n, dy * inv_n,
                        dz * inv_n)  # ((deg+1)^2, N)
        # a checkpoint may store fewer coefficients than the active
        # degree implies; absent coefficients contribute zero
        k_used = min(bas.shape[0], sh_t.shape[0])
        chans = [jnp.sum(bas[:k_used] * sh_t[:k_used, c, :], axis=0)
                 for c in range(3)]
        color = jnp.maximum(jnp.stack(chans, axis=1) + 0.5, 0.0)

    return ProjectedGaussians(
        mean2d=jnp.stack([px, py], axis=1),
        depth=tz,
        conic=conic,
        radius=radius,
        color=color,
        opacity=opacities,
        valid=valid,
        extent=extent,
    )
