"""Unit tests for the pure-math core (SH, quaternions, rigid, projection).

Verified against independent references: scipy rotations, Monte-Carlo SH
orthonormality, and closed-form projection properties — not against the
reference source.
"""
import numpy as np
import jax.numpy as jnp
import pytest
from scipy.spatial.transform import Rotation as ScipyRot

from trase_tpu.utils import sh, graphics, rigid, quaternion, schedules


# ---------------------------------------------------------------- SH ------

def _random_dirs(n, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n, 3))
    return d / np.linalg.norm(d, axis=1, keepdims=True)


def test_sh_band0_is_constant():
    dirs = jnp.asarray(_random_dirs(10))
    coeffs = jnp.zeros((10, 1, 1)).at[:, 0, 0].set(1.0)
    out = sh.eval_sh(0, coeffs, dirs)
    np.testing.assert_allclose(out, sh.C0, rtol=1e-6)


def test_sh_orthonormality_monte_carlo():
    """Real SH bands are orthonormal over the sphere: E[4*pi*Yi*Yj] = delta."""
    n = 200_000
    dirs = _random_dirs(n, seed=1)
    deg = 3
    ncoef = (deg + 1) ** 2
    # Evaluate all basis functions at once: channel c carries the one-hot
    # coefficient for basis function c (identity coefficient matrix).
    coeffs = jnp.asarray(np.eye(ncoef, dtype=np.float32))[None]  # (1,16,16)
    basis = np.asarray(
        sh.eval_sh(deg, coeffs, jnp.asarray(dirs[:, None, :], dtype=jnp.float32))
    ).reshape(n, ncoef)
    gram = 4 * np.pi * (basis.T @ basis) / n
    np.testing.assert_allclose(gram, np.eye(ncoef), atol=0.05)


def test_rgb_sh_roundtrip():
    rgb = jnp.asarray(np.random.default_rng(0).uniform(size=(5, 3)))
    np.testing.assert_allclose(sh.sh_to_rgb(sh.rgb_to_sh(rgb)), rgb, atol=1e-6)


# ------------------------------------------------------ quaternions -------

def test_build_rotation_matches_scipy():
    rng = np.random.default_rng(2)
    q_wxyz = rng.normal(size=(32, 4))
    R_mine = np.asarray(quaternion.build_rotation(jnp.asarray(q_wxyz)))
    q_unit = q_wxyz / np.linalg.norm(q_wxyz, axis=1, keepdims=True)
    # scipy uses xyzw order
    R_scipy = ScipyRot.from_quat(q_unit[:, [1, 2, 3, 0]]).as_matrix()
    np.testing.assert_allclose(R_mine, R_scipy, atol=1e-6)


def test_covariance_is_R_S2_Rt():
    rng = np.random.default_rng(3)
    s = jnp.asarray(rng.uniform(0.1, 2.0, size=(16, 3)))
    q = jnp.asarray(rng.normal(size=(16, 4)))
    packed = quaternion.covariance_from_scaling_rotation(s, 1.0, q)
    cov = np.asarray(quaternion.unpack_sym33(packed))
    R = np.asarray(quaternion.build_rotation(q))
    expected = np.einsum("nij,nj,nkj->nik", R, np.asarray(s) ** 2, R)
    np.testing.assert_allclose(cov, expected, atol=1e-5)
    # PSD
    eigs = np.linalg.eigvalsh(cov)
    assert (eigs > -1e-6).all()


def test_quaternion_multiply_matches_scipy():
    rng = np.random.default_rng(4)
    q1 = rng.normal(size=(8, 4))
    q2 = rng.normal(size=(8, 4))
    q1 /= np.linalg.norm(q1, axis=1, keepdims=True)
    q2 /= np.linalg.norm(q2, axis=1, keepdims=True)
    out = np.asarray(
        quaternion.quaternion_multiply(jnp.asarray(q1), jnp.asarray(q2))
    )
    r = ScipyRot.from_quat(q1[:, [1, 2, 3, 0]]) * ScipyRot.from_quat(
        q2[:, [1, 2, 3, 0]]
    )
    expected = r.as_quat()[:, [3, 0, 1, 2]]
    # quaternion double cover: compare up to sign
    sign = np.sign(np.sum(out * expected, axis=1, keepdims=True))
    np.testing.assert_allclose(out, expected * sign, atol=1e-6)


def test_rotmat_to_quat_roundtrip():
    rng = np.random.default_rng(5)
    for _ in range(5):
        R = ScipyRot.random(random_state=rng.integers(1 << 30)).as_matrix()
        q = quaternion.rotmat_to_quat(R)
        R2 = np.asarray(quaternion.build_rotation(jnp.asarray(q[None])))[0]
        np.testing.assert_allclose(R, R2, atol=1e-6)


# ------------------------------------------------------------ rigid -------

def test_exp_so3_matches_scipy():
    rng = np.random.default_rng(6)
    axis = rng.normal(size=(16, 3))
    axis /= np.linalg.norm(axis, axis=1, keepdims=True)
    theta = rng.uniform(0.01, np.pi - 0.1, size=(16, 1))
    R = np.asarray(rigid.exp_so3(jnp.asarray(axis), jnp.asarray(theta)))
    R_scipy = ScipyRot.from_rotvec(axis * theta).as_matrix()
    np.testing.assert_allclose(R, R_scipy, atol=1e-5)


def test_exp_log_se3_roundtrip():
    rng = np.random.default_rng(7)
    w = rng.normal(size=(8, 3))
    w /= np.linalg.norm(w, axis=1, keepdims=True)
    v = rng.normal(size=(8, 3))
    theta = rng.uniform(0.1, np.pi - 0.2, size=(8, 1))
    S = jnp.asarray(np.concatenate([w, v], axis=1))
    T = rigid.exp_se3(S, jnp.asarray(theta))
    # log_se3 (reference rigid_utils.py:107-125) returns [unit_w | v] and
    # drops theta — recover theta via log_so3, then exp must invert log.
    twist = np.asarray(rigid.log_se3(T))
    _, th2 = rigid.log_so3(T[:, :3, :3])
    th2 = np.asarray(th2).reshape(-1, 1)
    T2 = np.asarray(rigid.exp_se3(jnp.asarray(twist), jnp.asarray(th2)))
    np.testing.assert_allclose(np.asarray(T), T2, atol=1e-3)


def test_homogeneous_roundtrip():
    v = jnp.asarray(np.random.default_rng(8).normal(size=(4, 3)))
    np.testing.assert_allclose(
        rigid.from_homogeneous(rigid.to_homogeneous(v)), v, rtol=1e-6
    )


# --------------------------------------------------------- graphics -------

def test_projection_matrix_depth_range():
    znear, zfar = 0.01, 100.0
    fovx = fovy = np.deg2rad(60.0)
    P = graphics.projection_matrix(znear, zfar, fovx, fovy)
    # near-plane point on the axis -> ndc z = 0
    p_near = P @ np.array([0, 0, znear, 1.0])
    assert abs(p_near[2] / p_near[3]) < 1e-6
    # far-plane point -> ndc z = 1
    p_far = P @ np.array([0, 0, zfar, 1.0])
    np.testing.assert_allclose(p_far[2] / p_far[3], 1.0, rtol=1e-5)
    # frustum edge maps to ndc x = 1
    z = 5.0
    p_edge = P @ np.array([np.tan(fovx / 2) * z, 0, z, 1.0])
    np.testing.assert_allclose(p_edge[0] / p_edge[3], 1.0, rtol=1e-5)


def test_world_to_view_maps_camera_center_to_origin():
    rng = np.random.default_rng(9)
    R = ScipyRot.random(random_state=1).as_matrix()
    t = rng.normal(size=3)
    W2V = graphics.world_to_view(R, t)
    center = np.linalg.inv(W2V)[:3, 3]
    mapped = W2V @ np.append(center, 1.0)
    np.testing.assert_allclose(mapped[:3], 0.0, atol=1e-5)


def test_fov_focal_roundtrip():
    fov = np.deg2rad(70.0)
    assert abs(graphics.focal_to_fov(graphics.fov_to_focal(fov, 800), 800) - fov) < 1e-9


# -------------------------------------------------------- schedules -------

def test_expon_lr_endpoints():
    f = schedules.expon_lr_func(1e-2, 1e-4, max_steps=1000)
    np.testing.assert_allclose(f(0), 1e-2, rtol=1e-9)
    np.testing.assert_allclose(f(1000), 1e-4, rtol=1e-9)
    assert f(-1) == 0.0
    # log-linear midpoint
    np.testing.assert_allclose(f(500), 1e-3, rtol=1e-9)


def test_linear_noise_endpoints():
    f = schedules.linear_noise_func(0.1, 1e-15, lr_delay_mult=0.01,
                                    max_steps=20000)
    assert f(20000) == pytest.approx(1e-15, abs=1e-16)
    assert 0 < f(10000) < 0.1


def test_lambda_scheduler():
    f = schedules.lambda_scheduler_func([1.0, 0.5, 0.1], [0, 100, 1000])
    assert f(0) == 1.0 and f(99) == 1.0
    assert f(100) == 1.0  # bisect_left semantics: switch after the landmark
    assert f(101) == 0.5
    assert f(5000) == 0.1
