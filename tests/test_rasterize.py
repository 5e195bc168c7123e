"""Rasterizer tests: reference compositor sanity, tiled-vs-reference
equivalence, and gradient checks (incl. the screen-space mean gradient
used for densification)."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trase_tpu.ops import projection as P
from trase_tpu.ops import rasterize as R
from trase_tpu.ops import rasterize_ref as RR
from trase_tpu.utils import graphics
from trase_tpu.utils.sh import rgb_to_sh


def make_camera(H, W, fov_deg=60.0, cam_z=-5.0):
    fov = np.deg2rad(fov_deg)
    Rm = np.eye(3)
    t = np.array([0.0, 0.0, -cam_z])  # world->cam translation
    wv = graphics.world_to_view(Rm, t).T  # row-vector convention
    proj = graphics.projection_matrix(0.01, 100.0, fov, fov).T
    full = wv @ proj
    campos = np.linalg.inv(wv)[3, :3]
    return P.CameraBuffers(
        world_view=jnp.asarray(wv, jnp.float32),
        full_proj=jnp.asarray(full, jnp.float32),
        campos=jnp.asarray(campos, jnp.float32),
        tanfovx=jnp.float32(np.tan(fov / 2)),
        tanfovy=jnp.float32(np.tan(fov / 2)),
    )


def random_scene(n, seed=0, spread=1.5):
    rng = np.random.default_rng(seed)
    means = rng.uniform(-spread, spread, size=(n, 3)).astype(np.float32)
    scales = rng.uniform(0.05, 0.3, size=(n, 3)).astype(np.float32)
    quats = rng.normal(size=(n, 4)).astype(np.float32)
    colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
    opac = rng.uniform(0.3, 0.95, size=(n,)).astype(np.float32)
    feats = rng.normal(size=(n, 8)).astype(np.float32)
    return means, scales, quats, colors, opac, feats


def project(means, scales, quats, colors, opac, cam, H, W):
    cov3d = P.compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
    return P.project_gaussians(
        jnp.asarray(means), cov3d, jnp.asarray(opac), cam, H, W,
        colors_precomp=jnp.asarray(colors),
    )


class TestReferenceCompositor:
    def test_background_only(self):
        H = W = 32
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, feats = random_scene(4)
        # All gaussians behind the camera -> pure background.
        proj = project(means + np.array([0, 0, -100.0], np.float32),
                       scales, quats, colors, opac, cam, H, W)
        bg = jnp.asarray([1.0, 0.0, 0.5])
        out = RR.rasterize_reference(proj, None, bg, H, W)
        np.testing.assert_allclose(
            np.asarray(out["render"]),
            np.broadcast_to(np.array([1.0, 0.0, 0.5])[:, None, None], (3, H, W)),
            atol=1e-6,
        )
        assert not np.asarray(proj.valid).any()

    def test_single_gaussian_center_color(self):
        H = W = 33  # odd => center pixel on axis
        cam = make_camera(H, W)
        means = np.array([[0.0, 0.0, 0.0]], np.float32)
        scales = np.array([[0.5, 0.5, 0.5]], np.float32)
        quats = np.array([[1.0, 0, 0, 0]], np.float32)
        colors = np.array([[0.2, 0.9, 0.4]], np.float32)
        opac = np.array([0.99], np.float32)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        out = RR.rasterize_reference(proj, None, jnp.zeros(3), H, W)
        img = np.asarray(out["render"])
        center = img[:, H // 2, W // 2]
        # alpha at center ~= min(0.99, opacity) = 0.99
        np.testing.assert_allclose(center, 0.99 * colors[0], rtol=1e-3)
        # depth at center ~= view z = 5
        d = np.asarray(out["depth"])[0, H // 2, W // 2]
        np.testing.assert_allclose(d, 0.99 * 5.0, rtol=1e-3)

    def test_front_to_back_ordering(self):
        """A nearer opaque gaussian must occlude a farther one."""
        H = W = 17
        cam = make_camera(H, W)
        means = np.array([[0, 0, -1.0], [0, 0, 1.0]], np.float32)  # z=-1 nearer
        scales = np.full((2, 3), 0.5, np.float32)
        quats = np.tile(np.array([[1.0, 0, 0, 0]], np.float32), (2, 1))
        colors = np.array([[1.0, 0, 0], [0, 1.0, 0]], np.float32)
        opac = np.array([0.95, 0.95], np.float32)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        out = np.asarray(
            RR.rasterize_reference(proj, None, jnp.zeros(3), H, W)["render"]
        )
        center = out[:, H // 2, W // 2]
        assert center[0] > 0.9  # red (near) dominates
        assert center[1] < 0.1


class TestTiledVsReference:
    @pytest.mark.parametrize("n,H,W,seed", [
        (50, 48, 64, 1),
        pytest.param(200, 40, 40, 2, marks=pytest.mark.slow),
    ])
    def test_match(self, n, H, W, seed):
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, feats = random_scene(n, seed)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        ref = RR.rasterize_reference(proj, jnp.asarray(feats), bg, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=64, max_per_tile=n,
                             tile_batch=4)
        tiled = R.rasterize_tiled(proj, jnp.asarray(feats), bg, H, W, cfg)
        assert int(tiled["overflow"]) == 0
        np.testing.assert_allclose(
            np.asarray(tiled["render"]), np.asarray(ref["render"]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(tiled["feats"]), np.asarray(ref["feats"]), atol=2e-5
        )
        np.testing.assert_allclose(
            np.asarray(tiled["depth"]), np.asarray(ref["depth"]), atol=2e-4
        )

    def test_overflow_reported(self):
        H = W = 32
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(64, 3)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=1, max_per_tile=8, tile_batch=4)
        tiled = R.rasterize_tiled(proj, None, jnp.zeros(3), H, W, cfg)
        assert int(tiled["overflow"]) > 0

    def test_no_index_starvation_under_overflow(self):
        """K-budget overflow must truncate each gaussian's own rect
        (aspect-balanced around its mean), NEVER starve high-index
        gaussians: the dense backend's global n*K slot buffer used to
        fill in gaussian-index order from UNCLAMPED rects, silently
        dropping every gaussian after the budget ran out (whole
        objects vanished at 1K resolutions — scale_val round 3)."""
        H = W = 64
        cam = make_camera(H, W)
        n = 32
        rng = np.random.default_rng(5)
        # big splats: each covers many tiles so total coverage >> n*K
        means = np.zeros((n, 3), np.float32)
        means[:, 0] = rng.uniform(-0.5, 0.5, n)
        means[:, 1] = rng.uniform(-0.5, 0.5, n)
        means[:, 2] = 3.0
        means[-1] = [0.0, 0.0, 2.0]  # last: front-most, at center
        scales = np.full((n, 3), 0.25, np.float32)
        quats = np.tile(np.array([1, 0, 0, 0], np.float32), (n, 1))
        colors = np.zeros((n, 3), np.float32)
        colors[-1] = [0.0, 1.0, 0.0]  # the LAST gaussian is green
        opac = np.full(n, 0.9, np.float32)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=2, max_per_tile=n,
                             tile_batch=4)
        tiled = R.rasterize_tiled(proj, None, jnp.zeros(3), H, W, cfg)
        assert int(tiled["overflow"]) > 0  # budget IS overflowing
        # the last gaussian must still composite around its own center
        cx = int(np.asarray(proj.mean2d[-1, 0]))
        cy = int(np.asarray(proj.mean2d[-1, 1]))
        cx = min(max(cx, 0), W - 1)
        cy = min(max(cy, 0), H - 1)
        green = float(tiled["render"][1, cy, cx])
        assert green > 0.05, (
            f"last-index gaussian starved (green={green:.4f} at its "
            f"center) — global pair-slot allocation regressed")

    @pytest.mark.slow
    def test_dense_matches_pallas_under_overflow(self):
        """Both backends share clamp_rect_to_budget, so their
        truncation semantics are identical pair-for-pair."""
        from trase_tpu.ops.rasterize_pallas import rasterize_tiled_pallas

        H = W = 48
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(40, 7)
        scales = scales * 4.0  # force rect > K for most gaussians
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=4, max_per_tile=64,
                             tile_batch=4)
        dense = R.rasterize_tiled(proj, None, jnp.zeros(3), H, W, cfg)
        pallas = rasterize_tiled_pallas(proj, None, jnp.zeros(3), H, W,
                                        cfg, interpret=True)
        assert int(dense["overflow"]) == int(pallas["overflow"]) > 0
        np.testing.assert_allclose(np.asarray(dense["render"]),
                                   np.asarray(pallas["render"]),
                                   atol=3e-5)


class TestGradients:
    def _loss_fn(self, H, W, cam, scales, quats, opac, target):
        def loss(means, colors, mean2d_offset):
            cov3d = P.compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))
            proj = P.project_gaussians(
                means, cov3d, jnp.asarray(opac), cam, H, W,
                colors_precomp=colors,
            )
            proj = proj._replace(mean2d=proj.mean2d + mean2d_offset)
            out = RR.rasterize_reference(proj, None, jnp.zeros(3), H, W)
            return jnp.abs(out["render"] - target).mean()

        return loss

    def test_grads_flow_and_match_fd(self):
        H = W = 24
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(12, 4)
        target = jnp.zeros((3, H, W)) + 0.5
        loss = self._loss_fn(H, W, cam, scales, quats, opac, target)
        means_j = jnp.asarray(means)
        colors_j = jnp.asarray(colors)
        off = jnp.zeros((12, 2))
        g_means, g_colors, g_off = jax.grad(loss, argnums=(0, 1, 2))(
            means_j, colors_j, off
        )
        assert np.isfinite(np.asarray(g_means)).all()
        assert np.abs(np.asarray(g_off)).sum() > 0  # mean2d grad flows
        # Finite-difference check on a color entry (smooth path).
        eps = 1e-3
        e = jnp.zeros_like(colors_j).at[0, 1].set(eps)
        fd = (loss(means_j, colors_j + e, off) - loss(means_j, colors_j - e, off)) / (
            2 * eps
        )
        np.testing.assert_allclose(np.asarray(g_colors)[0, 1], np.asarray(fd),
                                   rtol=5e-2, atol=1e-5)

    @pytest.mark.slow
    def test_tiled_grads_match_reference(self):
        H = W = 32
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(30, 5)
        target = jnp.zeros((3, H, W)) + 0.25
        cov3d = P.compute_cov3d(jnp.asarray(scales), jnp.asarray(quats))

        def loss_with(rasterizer):
            def f(means_, colors_):
                proj = P.project_gaussians(
                    means_, cov3d, jnp.asarray(opac), cam, H, W,
                    colors_precomp=colors_,
                )
                out = rasterizer(proj)
                return jnp.abs(out["render"] - target).mean()

            return f

        ref_r = lambda proj: RR.rasterize_reference(proj, None, jnp.zeros(3), H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=64, max_per_tile=30, tile_batch=2)
        til_r = lambda proj: R.rasterize_tiled(proj, None, jnp.zeros(3), H, W, cfg)

        g_ref = jax.grad(loss_with(ref_r), argnums=(0, 1))(
            jnp.asarray(means), jnp.asarray(colors)
        )
        g_til = jax.grad(loss_with(til_r), argnums=(0, 1))(
            jnp.asarray(means), jnp.asarray(colors)
        )
        np.testing.assert_allclose(
            np.asarray(g_ref[0]), np.asarray(g_til[0]), atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(g_ref[1]), np.asarray(g_til[1]), atol=1e-5
        )


class TestExtentCull:
    """The exact-support AABB cull (projection.ProjectedGaussians.extent)
    must cut pair count without changing any output: dropped tiles are
    exactly those where every pixel has alpha < ALPHA_EPS, which all
    backends zero out anyway."""

    def _proj(self, H=64, W=80, n=120, seed=7):
        rng = np.random.default_rng(seed)
        means = rng.uniform(-1.5, 1.5, size=(n, 3)).astype(np.float32)
        # strongly anisotropic scales + a wide opacity range incl. the
        # near-transparent splats the cull helps most
        scales = np.stack([
            rng.uniform(0.02, 0.1, n), rng.uniform(0.2, 0.6, n),
            rng.uniform(0.05, 0.2, n)], 1).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        colors = rng.uniform(0, 1, size=(n, 3)).astype(np.float32)
        opac = np.concatenate([
            rng.uniform(0.004, 0.05, n // 2),
            rng.uniform(0.3, 0.99, n - n // 2)]).astype(np.float32)
        feats = rng.normal(size=(n, 8)).astype(np.float32)
        cam = make_camera(H, W)
        return project(means, scales, quats, colors, opac, cam, H, W), \
            jnp.asarray(feats), H, W

    def test_extent_is_tighter_and_consistent(self):
        proj, _, H, W = self._proj()
        ex = np.asarray(proj.extent)
        rad = np.asarray(proj.radius)
        valid = np.asarray(proj.valid)
        assert (ex[valid] <= rad[valid, None] + 1e-5).all()
        th, tw = R._tile_grid(H, W)
        _, _, _, count_ext = R._tile_rects(proj, th, tw)
        _, _, _, count_rad = R._tile_rects(
            proj._replace(extent=None), th, tw)
        n_ext = int(jnp.sum(count_ext))
        n_rad = int(jnp.sum(count_rad))
        assert n_ext <= n_rad
        assert n_ext < 0.8 * n_rad, (n_ext, n_rad)  # a real cut

    @pytest.mark.parametrize("backend", ["dense", "pallas_interpret"])
    def test_outputs_unchanged(self, backend):
        from trase_tpu.renderer import _rasterize

        proj, feats, H, W = self._proj()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        cfg = R.RasterConfig(pairs_per_gaussian=16, max_per_tile=512,
                             tile_batch=8)
        a = _rasterize(backend, proj, feats, bg, H, W, cfg)
        b = _rasterize(backend, proj._replace(extent=None), feats, bg,
                       H, W, cfg)
        for key in ("render", "feats", "depth", "alpha"):
            np.testing.assert_allclose(
                np.asarray(a[key]), np.asarray(b[key]),
                atol=2e-6, err_msg=f"{backend}:{key}")

    @pytest.mark.slow  # the default-suite output-parity tests pin
    # the same where-threshold mechanism; the autodiff cross-check
    # is opt-in
    def test_grads_unchanged_dense(self):
        proj, feats, H, W = self._proj(H=48, W=48, n=60)
        bg = jnp.zeros(3)
        cfg = R.RasterConfig(pairs_per_gaussian=16, max_per_tile=512,
                             tile_batch=8)
        gt = jnp.asarray(np.random.default_rng(0).uniform(
            size=(3, H, W)).astype(np.float32))

        def loss(p, extent_on):
            pr = proj._replace(mean2d=p,
                               extent=proj.extent if extent_on else None)
            out = R.rasterize_tiled(pr, feats, bg, H, W, cfg)
            return jnp.abs(out["render"] - gt).mean()

        g_on = jax.grad(loss)(proj.mean2d, True)
        g_off = jax.grad(loss)(proj.mean2d, False)
        np.testing.assert_allclose(np.asarray(g_on), np.asarray(g_off),
                                   atol=2e-6)

    def test_alpha_cull_outputs_unchanged_pallas(self):
        """RasterConfig.alpha_cull (pallas pair-level max-alpha bound)
        composes with the extent rects and must also be output-exact:
        culled pairs are provably below ALPHA_EPS over their whole
        tile."""
        from trase_tpu.renderer import _rasterize

        proj, feats, H, W = self._proj()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        base = R.RasterConfig(pairs_per_gaussian=16, max_per_tile=512,
                              tile_batch=8)
        a = _rasterize("pallas_interpret", proj, feats, bg, H, W,
                       base._replace(alpha_cull=True))
        b = _rasterize("pallas_interpret", proj, feats, bg, H, W, base)
        for key in ("render", "feats", "depth", "alpha"):
            np.testing.assert_allclose(
                np.asarray(a[key]), np.asarray(b[key]),
                atol=2e-6, err_msg=key)
