"""Pallas compositor tests (interpret mode on CPU): forward equality vs
the dense tiled compositor, full custom-VJP gradient equality, and the
fixed-K binning semantics. The same kernels run compiled on the real
chip; the driver's bench exercises that path."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from trase_tpu.ops import projection as P
from trase_tpu.ops import rasterize as R
from trase_tpu.ops import rasterize_pallas as RP
from trase_tpu.ops import rasterize_ref as RR

from test_rasterize import make_camera, project, random_scene

# pack_features pinned OFF: this module's parity suite checks the
# compositing MECHANISM against f32 oracles at tight tolerances; the
# bf16-packed payload (the production default since r5) has its own
# dedicated parity tests with pack-appropriate tolerances below.
CFG = R.RasterConfig(pairs_per_gaussian=64, max_per_tile=256,
                     tile_batch=4, pack_features=False)


def pallas_raster(proj, extra, bg, H, W, cfg=CFG):
    return RP.rasterize_tiled_pallas(proj, extra, bg, H, W, cfg,
                                     interpret=True)


class TestPallasForward:
    @pytest.mark.parametrize("n,H,W,seed", [
        (50, 48, 64, 1),
        pytest.param(200, 40, 40, 2, marks=pytest.mark.slow),
    ])
    def test_matches_dense(self, n, H, W, seed):
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, feats = random_scene(n, seed)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        dense = R.rasterize_tiled(proj, jnp.asarray(feats), bg, H, W, CFG)
        pall = pallas_raster(proj, jnp.asarray(feats), bg, H, W)
        # fp-reassociation tolerances: the kernel's log-space
        # transmittance and 128-pair window chunking associate the
        # per-pixel sums differently than the dense path
        for k, tol in [("render", 2e-4), ("feats", 5e-4), ("depth", 2e-3),
                       ("alpha", 2e-4)]:
            np.testing.assert_allclose(
                np.asarray(pall[k]), np.asarray(dense[k]), atol=tol,
                err_msg=k)

    def test_matches_oracle(self, ):
        H, W = 40, 56
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, feats = random_scene(80, 7)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        bg = jnp.asarray([0.3, 0.0, 0.9])
        ref = RR.rasterize_reference(proj, jnp.asarray(feats), bg, H, W)
        pall = pallas_raster(proj, jnp.asarray(feats), bg, H, W)
        # 2e-3 tolerance: the tiled paths cull by the 3-sigma screen rect
        # (CUDA reference behavior) while the oracle composites every
        # gaussian's full ellipse tail; pixels just outside a rect can
        # differ by up to ~opacity*exp(-4.5). The dense tiled path shows
        # the identical deviation on this scene.
        np.testing.assert_allclose(
            np.asarray(pall["render"]), np.asarray(ref["render"]), atol=2e-3)
        np.testing.assert_allclose(
            np.asarray(pall["feats"]), np.asarray(ref["feats"]), atol=2e-2)

    def test_background_only(self):
        H = W = 32
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(4)
        proj = project(means + np.array([0, 0, -100.0], np.float32),
                       scales, quats, colors, opac, cam, H, W)
        bg = jnp.asarray([1.0, 0.0, 0.5])
        out = pallas_raster(proj, None, bg, H, W)
        np.testing.assert_allclose(
            np.asarray(out["render"]),
            np.broadcast_to(np.array([1.0, 0.0, 0.5])[:, None, None],
                            (3, H, W)),
            atol=1e-6,
        )

    def test_truncation_overflow_reported(self):
        """Fixed-K expansion: rects larger than K tiles are truncated
        and counted."""
        H = W = 64
        cam = make_camera(H, W)
        means = np.array([[0.0, 0.0, 0.0]], np.float32)
        scales = np.array([[1.5, 1.5, 1.5]], np.float32)  # huge splat
        quats = np.array([[1.0, 0, 0, 0]], np.float32)
        colors = np.array([[1.0, 0.5, 0.2]], np.float32)
        opac = np.array([0.9], np.float32)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=2, max_per_tile=8,
                             tile_batch=4)
        out = pallas_raster(proj, None, jnp.zeros(3), H, W, cfg)
        assert int(out["overflow"]) > 0


class TestWindowLayout:
    def test_coverage_invariants(self):
        """Padded-aligned layout: block w IS window w; each window
        belongs to one tile; per-tile slots are depth-ordered valid
        pairs followed by dead-row padding; bookkeeping arrays agree."""
        H, W = 64, 96
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(300, 11)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=8, max_per_tile=256,
                             tile_batch=4)
        sorted_pid, slot_of_sorted, layout, overflow = (
            RP.build_window_layout(proj, H, W, cfg))
        n_ = proj.mean2d.shape[0]
        chunk = RP.PAIR_CHUNK
        # reconstruct the per-slot gaussian map from the pair->slot map
        sorted_gauss = np.asarray(sorted_pid) // cfg.pairs_per_gaussian
        sos = np.asarray(slot_of_sorted)
        slot_cap = layout.meta_t.shape[0] * chunk
        sg_pad_np = np.full(slot_cap, n_, np.int32)
        valid_p = sos < slot_cap
        sg_pad_np[sos[valid_p]] = sorted_gauss[valid_p]
        sg_pad = jnp.asarray(sg_pad_np)
        th, tw = R._tile_grid(H, W)
        num_tiles = th * tw
        n = proj.mean2d.shape[0]
        nk = n * cfg.pairs_per_gaussian

        mt = np.asarray(layout.meta_t)
        ws = np.asarray(layout.win_start)
        gs = np.asarray(layout.group_start)
        total_win = int(np.asarray(layout.total_win))
        s_cap = mt.shape[0]
        sg = np.asarray(sg_pad).reshape(s_cap, chunk)

        # bookkeeping: win_start nondecreasing, capped at total_win;
        # group_start = window starts of each gx-tile row segment
        assert ws[0] == 0 and ws[num_tiles] == total_win
        assert (np.diff(ws) >= 0).all()
        gx, gxn = RP.group_geometry(tw)
        g = np.arange(th * gxn)
        tile_lo = (g // gxn) * tw + (g % gxn) * gx
        np.testing.assert_array_equal(gs[:-1], ws[tile_lo])
        assert gs[-1] == total_win

        # meta packs tile<<9 | first<<8 | cnt: occupied windows carry
        # their tile + a first flag exactly at the tile's window start
        # + the valid-lane count; tail windows carry the sentinel
        for w in range(s_cap):
            if w < total_win:
                t = int(np.searchsorted(ws[1:num_tiles + 1], w,
                                        side="right"))
                assert mt[w] >> 9 == t
                assert ((mt[w] >> 8) & 1 == 1) == (w == ws[t])
                cnt = mt[w] & 255
                valid_in_w = (sg[w] != n).sum()
                assert cnt == valid_in_w
            else:
                assert mt[w] == num_tiles << 9

        # slots: values in [0, n]; per tile, valid slots form a prefix
        # of its window span and are depth-ordered (quantized key);
        # everything past total_win is dead
        assert sg.min() >= 0 and sg.max() <= n
        assert (sg[total_win:] == n).all()
        depth = np.asarray(proj.depth)
        per_gauss_count = np.zeros(n + 1, np.int64)
        for t in range(num_tiles):
            span = sg[ws[t]:ws[t + 1]].ravel()
            valid = span != n
            k = valid.sum()
            assert valid[:k].all() and not valid[k:].any(), \
                "padding must be a suffix"
            d = depth[span[:k]]
            # depth-ordering up to the 19-bit quantization granularity
            dmin, dmax = depth.min(), depth.max()
            quantum = (dmax - dmin) / ((1 << RP.DEPTH_BITS) - 1)
            assert (np.diff(d) >= -1.5 * quantum).all()
            np.add.at(per_gauss_count, span[:k], 1)
        # no gaussian binned more than its K pair budget
        assert per_gauss_count[:n].max() <= cfg.pairs_per_gaussian
        assert per_gauss_count.sum() <= nk

    @pytest.mark.slow
    def test_depth_bits_shrink_large_tile_count(self):
        """>= 8192 tiles (1440p/4K frames): the u32 composite key
        shrinks its depth field so the tile id still fits — pairs must
        stay grouped by tile and depth-ordered at the coarser
        granularity (ADVICE r1: the old fixed 19-bit depth silently
        wrapped the key)."""
        H, W = 1440, 2560  # 160x90 = 14400 tiles > 2^13
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(64, 5)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=4, max_per_tile=64,
                             tile_batch=4)
        sorted_pid, _, layout, _ = RP.build_window_layout(
            proj, H, W, cfg)
        th, tw = R._tile_grid(H, W)
        num_tiles = th * tw
        assert num_tiles >= (1 << 13)
        n = proj.mean2d.shape[0]
        K = cfg.pairs_per_gaussian
        ws = np.asarray(layout.win_start)
        total_win = int(np.asarray(layout.total_win))
        assert ws[num_tiles] == total_win and total_win > 0
        # windows' meta tile ids must be valid despite the wider tile
        # field
        mt = np.asarray(layout.meta_t)
        occupied = mt[:total_win] >> 9
        assert occupied.max() < num_tiles
        # every valid pair's sort bucket matches its true tile
        depth = np.asarray(proj.depth)
        sp = np.asarray(sorted_pid)
        win_off = np.asarray(layout.win_off)
        for w in range(total_win):
            t = int(mt[w] >> 9)
            cnt = int(mt[w] & 255)
            gs = sp[win_off[w]:win_off[w] + cnt] // K
            d = depth[gs]
            # coarser quantum: 32-bit key minus ceil(log2(T+1)) bits
            import math

            depth_bits = 32 - max(14, math.ceil(
                math.log2(num_tiles + 1)))
            quantum = (depth.max() - depth.min()) / (
                (1 << depth_bits) - 1)
            assert (np.diff(d) >= -1.5 * quantum).all()

    def test_layout_guards_raise(self):
        """Static trace-time guards: un-representable tile counts and
        2^24-exceeding pair totals raise instead of silently
        corrupting the index maps."""
        H, W = 64, 64
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, _ = random_scene(16, 3)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        cfg = R.RasterConfig(pairs_per_gaussian=4, max_per_tile=64,
                             tile_batch=4)
        # > 2^22 tiles cannot fit the u32 key with >= 10 depth bits
        with np.testing.assert_raises(ValueError):
            RP.build_window_layout(proj, 16 * 2100, 16 * 2100, cfg)

    def test_fused_deform_matches_flax(self):
        from trase_tpu.models.deform import (
            deform_step, init_deform, make_deform_network,
        )
        net = make_deform_network("DeformNetwork")
        dvars = init_deform(jax.random.PRNGKey(0), net)
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.normal(size=(300, 3)), jnp.float32)
        t = jnp.full((300, 1), 0.42, jnp.float32)
        ref = deform_step(net, dvars, xyz, t)
        fus = deform_step(net, dvars, xyz, t, fused=True)
        for a, b in zip(ref, fus):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-6
            # bf16 hidden stack (same budget as the flax bf16 path)
            assert np.abs(a - b).max() / scale < 2e-2

    def test_bf16_deform_close(self):
        from trase_tpu.models.deform import (
            deform_step, init_deform, make_deform_network,
        )
        net = make_deform_network("DeformNetwork")
        dvars = init_deform(jax.random.PRNGKey(0), net)
        rng = np.random.default_rng(0)
        xyz = jnp.asarray(rng.normal(size=(256, 3)), jnp.float32)
        t = jnp.full((256, 1), 0.37, jnp.float32)
        full = deform_step(net, dvars, xyz, t)
        half = deform_step(net, dvars, xyz, t, dtype=jnp.bfloat16)
        for a, b in zip(full, half):
            a, b = np.asarray(a), np.asarray(b)
            assert b.dtype == np.float32
            scale = np.abs(a).max() + 1e-6
            assert np.abs(a - b).max() / scale < 2e-2


class TestPallasGradients:
    @pytest.mark.slow
    def test_grads_match_dense(self):
        H, W = 48, 64
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, feats = random_scene(80, 3)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        bg = jnp.asarray([0.1, 0.2, 0.3])
        rng = np.random.default_rng(0)
        wr = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
        wf = jnp.asarray(rng.normal(size=(feats.shape[1], H, W)), jnp.float32)
        wd = jnp.asarray(rng.normal(size=(1, H, W)), jnp.float32)
        wa = jnp.asarray(rng.normal(size=(1, H, W)), jnp.float32)

        def loss_fn(raster):
            def f(mean2d, conic, opa, color, depth, extra):
                p = proj._replace(mean2d=mean2d, conic=conic, opacity=opa,
                                  color=color, depth=depth)
                out = raster(p, extra, bg, H, W, CFG)
                return (jnp.sum(out["render"] * wr)
                        + jnp.sum(out["feats"] * wf)
                        + jnp.sum(out["depth"] * wd)
                        + jnp.sum(out["alpha"] * wa))
            return f

        args = (proj.mean2d, proj.conic, proj.opacity, proj.color,
                proj.depth, jnp.asarray(feats))
        argnums = (0, 1, 2, 3, 4, 5)
        gd = jax.grad(loss_fn(R.rasterize_tiled), argnums=argnums)(*args)
        gp = jax.grad(loss_fn(pallas_raster), argnums=argnums)(*args)
        for nm, a, b in zip(
                ["mean2d", "conic", "opacity", "color", "depth", "extra"],
                gd, gp):
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            # fp-reassociation: log-space weights + forward-prefix
            # suffix accumulation associate sums differently
            assert np.abs(a - b).max() / scale < 3e-4, nm

    def test_zombie_window_grads(self):
        """Early-termination bookkeeping regression (round-3 NaN bug).

        A deep stack of opaque splats on one tile terminates the
        forward after its first window while later windows of the SAME
        tile share a superblock with the NEXT tile's first window. The
        forward's superblock gate used to force-run those dead "zombie"
        windows (advancing stop/logt_out) while the fully-dead
        superblock between them was skipped (its window totals never
        added to logt). The backward then over-subtracted the missing
        totals during its log-space transmittance reconstruction,
        exp()'d a large POSITIVE log, and emitted finite-but-
        astronomical (~e^40..e^3000) gradients that overflowed Adam's
        second moment at the next squaring. Discovered on a real
        1008px training run (grads ~1e27 with a perfectly finite
        loss); the dense backend is the behavioral oracle here.
        """
        H = W = 32  # 2x2 tiles, one group per tile row
        # tile-0 stack: 21 windows (terminates in window 0); tile-1:
        # 3 windows. Group-0 total = 24 windows = exactly 3 superblocks
        # (SUPER=8), so tile-1's FIRST window (w21) gates in superblock
        # 2 alongside zombie tile-0 windows w16-20, while superblock 1
        # (w8-15, all dead tile-0) is skipped outright — the exact
        # bookkeeping mismatch being regression-tested. A tail window
        # would be processed under the per-window gate and never
        # trigger it.
        n0, n1 = 2640, 300
        assert RP.SUPER == 8, "window layout tuned for SUPER == 8"
        n = n0 + n1
        mean2d = np.zeros((n, 2), np.float32)
        mean2d[:n0] = [8.0, 8.0]  # tile (0, 0) center
        mean2d[n0:] = [24.0, 8.0]  # tile (1, 0) center
        depth = np.linspace(1.0, 2.0, n).astype(np.float32)
        # sigma = 10 px: alpha >= 0.5 over the WHOLE tile, so every
        # pixel's transmittance dies inside window 0 (early termination
        # requires max-over-pixels logt < log T_EPS, not just the
        # center's)
        conic = np.tile(np.array([[0.01, 0.0, 0.01]], np.float32),
                        (n, 1))
        radius = np.full((n,), 3.0, np.float32)
        color = np.tile(np.array([[0.9, 0.5, 0.1]], np.float32), (n, 1))
        opac = np.full((n,), 0.95, np.float32)  # T < 1e-4 in 3 pairs
        proj = P.ProjectedGaussians(
            mean2d=jnp.asarray(mean2d), depth=jnp.asarray(depth),
            conic=jnp.asarray(conic), radius=jnp.asarray(radius),
            color=jnp.asarray(color), opacity=jnp.asarray(opac),
            valid=jnp.ones((n,), bool))
        cfg = R.RasterConfig(pairs_per_gaussian=1, max_per_tile=4096,
                             tile_batch=4)
        bg = jnp.asarray([0.2, 0.1, 0.4])
        rng = np.random.default_rng(3)
        wr = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)
        wa = jnp.asarray(rng.normal(size=(1, H, W)), jnp.float32)

        def loss_fn(raster):
            def f(mean2d, conic, opa, color):
                pr = proj._replace(mean2d=mean2d, conic=conic,
                                   opacity=opa, color=color)
                out = raster(pr, None, bg, H, W, cfg)
                return (jnp.sum(out["render"] * wr)
                        + jnp.sum(out["alpha"] * wa))
            return f

        args = (proj.mean2d, proj.conic, proj.opacity, proj.color)
        argnums = (0, 1, 2, 3)
        gd = jax.grad(loss_fn(R.rasterize_tiled), argnums=argnums)(*args)
        gp = jax.grad(loss_fn(pallas_raster), argnums=argnums)(*args)
        for nm, a, b in zip(["mean2d", "conic", "opacity", "color"],
                            gd, gp):
            a, b = np.asarray(a), np.asarray(b)
            assert np.isfinite(b).all(), nm
            scale = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() / scale < 3e-4, nm

    @pytest.mark.slow
    def test_mean2d_offset_grad_through_render(self):
        """The densification signal (viewspace grad, reference
        train.py:366) must flow through the pallas path too."""
        from trase_tpu.models import gaussians as G
        from trase_tpu.renderer import make_render_camera, render

        n = 32
        rng = np.random.default_rng(0)
        pts = rng.uniform(-1, 1, (n, 3)).astype(np.float32)
        cols = rng.uniform(0, 1, (n, 3)).astype(np.float32)
        params, aux = G.from_point_cloud(
            pts, cols, sh_degree=1, capacity=n,
            dist2=np.full(n, 0.01, np.float32))
        cam = make_render_camera(np.eye(3), np.array([0, 0, 3.0]), 1.0, 1.0,
                                 32, 32)

        def loss(off):
            out = render(cam, params, aux.alive, jnp.zeros(3),
                         sh_degree=1, mean2d_offset=off,
                         with_features=False, raster_cfg=CFG,
                         backend="pallas_interpret")
            return out["render"].sum()

        g = jax.grad(loss)(jnp.zeros((n, 2)))
        assert np.isfinite(np.asarray(g)).all()
        assert np.abs(np.asarray(g)).sum() > 0


@pytest.mark.slow
class TestPackedFeatures:
    """cfg.pack_features parity: the bf16-paired feature payload must
    leave geometry-derived outputs (rgb/alpha/depth) and ALL gradients
    essentially unchanged — only the composited feature image rounds
    to bf16 value precision."""

    PACKED = CFG._replace(pack_features=True)

    def _setup(self, n=120, H=48, W=64, seed=5):
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, feats = random_scene(n, seed)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        feats = np.asarray(feats)
        feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        return proj, jnp.asarray(feats), H, W

    def test_forward_parity(self):
        proj, feats, H, W = self._setup()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        ref = pallas_raster(proj, feats, bg, H, W)
        pk = pallas_raster(proj, feats, bg, H, W, cfg=self.PACKED)
        # identical compositing weights -> geometry outputs match to
        # fp-reassociation noise; feats round to bf16 (~2^-8 rel)
        for k, tol in [("render", 1e-6), ("alpha", 1e-6),
                       ("depth", 1e-6)]:
            np.testing.assert_allclose(np.asarray(pk[k]),
                                       np.asarray(ref[k]), atol=tol,
                                       err_msg=k)
        np.testing.assert_allclose(np.asarray(pk["feats"]),
                                   np.asarray(ref["feats"]),
                                   atol=6e-3, err_msg="feats")

    def test_grad_parity(self):
        proj, feats, H, W = self._setup(n=90, seed=9)
        bg = jnp.zeros(3)
        rng = np.random.default_rng(1)
        wf = jnp.asarray(rng.normal(size=(feats.shape[1], H, W)),
                         jnp.float32)
        wr = jnp.asarray(rng.normal(size=(3, H, W)), jnp.float32)

        def loss_fn(cfg):
            def f(mean2d, opa, extra):
                p = proj._replace(mean2d=mean2d, opacity=opa)
                out = RP.rasterize_tiled_pallas(p, extra, bg, H, W,
                                                cfg, interpret=True)
                return (jnp.sum(out["feats"] * wf)
                        + jnp.sum(out["render"] * wr))
            return f

        args = (proj.mean2d, proj.opacity, feats)
        gu = jax.grad(loss_fn(CFG), argnums=(0, 1, 2))(*args)
        gp = jax.grad(loss_fn(self.PACKED), argnums=(0, 1, 2))(*args)
        # feature-row grads use only the (identical) compositing
        # weights -> near-exact; geometry grads see the bf16-rounded
        # values through q = g.vals -> bf16-relative tolerance
        for nm, a, b, tol in [("extra", gu[2], gp[2], 1e-6),
                              ("mean2d", gu[0], gp[0], 8e-3),
                              ("opacity", gu[1], gp[1], 8e-3)]:
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() / scale < tol, nm

    def test_odd_channels_fall_back_unpacked(self):
        proj, feats, H, W = self._setup(n=40, seed=3)
        bg = jnp.zeros(3)
        odd = feats[:, :5]
        ref = pallas_raster(proj, odd, bg, H, W)
        pk = pallas_raster(proj, odd, bg, H, W, cfg=self.PACKED)
        np.testing.assert_allclose(np.asarray(pk["feats"]),
                                   np.asarray(ref["feats"]), atol=1e-6)


@pytest.mark.slow
class TestPairBudgetQuality:
    """Quantify the fixed-K pair-budget truncation cost on an
    ADVERSARIAL scene (heavy-tailed splat sizes, the trained-scene
    regime the synthetic benches miss). The reference rasterizer has
    unbounded per-gaussian tile coverage; our static K must degrade
    gracefully and be near-exact at the default K=8."""

    def _heavy_tailed_scene(self, n=600, seed=11):
        rng = np.random.default_rng(seed)
        means = rng.normal(size=(n, 3)).astype(np.float32) * 0.6
        means[:, 2] += 3.0
        # log-normal scales: a fat tail of splats covering many tiles
        scales = np.exp(
            rng.normal(loc=-4.2, scale=1.3, size=(n, 3))
        ).astype(np.float32)
        quats = rng.normal(size=(n, 4)).astype(np.float32)
        quats /= np.linalg.norm(quats, axis=1, keepdims=True)
        colors = rng.uniform(size=(n, 3)).astype(np.float32)
        opac = rng.uniform(0.3, 0.95, size=n).astype(np.float32)
        return means, scales, quats, colors, opac

    def test_psnr_vs_dense_by_k(self):
        H, W = 128, 128
        cam = make_camera(H, W)
        means, scales, quats, colors, opac = self._heavy_tailed_scene()
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        bg = jnp.asarray([0.0, 0.0, 0.0])

        # unbudgeted ground truth: the dense compositor with a per-tile
        # capacity covering every pair
        dense_cfg = R.RasterConfig(pairs_per_gaussian=1024,
                                   max_per_tile=640, tile_batch=4)
        ref = R.rasterize_tiled(proj, None, bg, H, W, dense_cfg)
        ref_img = np.asarray(ref["render"])
        assert int(ref["overflow"]) == 0

        def psnr_at(k):
            cfg = R.RasterConfig(pairs_per_gaussian=k, max_per_tile=640,
                                 tile_batch=4)
            out = pallas_raster(proj, None, bg, H, W, cfg=cfg)
            img = np.asarray(out["render"])
            mse = float(np.mean((img - ref_img) ** 2))
            return (10.0 * np.log10(1.0 / max(mse, 1e-12)),
                    int(out["overflow"]))

        results = {k: psnr_at(k) for k in (4, 8, 16, 32)}
        psnrs = {k: v[0] for k, v in results.items()}
        drops = {k: v[1] for k, v in results.items()}
        # quality is monotone in K, overflow is anti-monotone
        assert psnrs[8] >= psnrs[4] - 0.5
        assert psnrs[16] >= psnrs[8] - 0.5
        assert psnrs[32] >= psnrs[16] - 0.5
        assert drops[4] >= drops[8] >= drops[16] >= drops[32]
        # the default budget stays visually near-exact even on the
        # heavy-tailed scene, and K=32 is pixel-exact
        assert psnrs[8] > 35.0, (psnrs, drops)
        assert psnrs[32] > 60.0, (psnrs, drops)
        # overflow reporting reflects the truncation that PSNR measures
        assert drops[4] > 0


class TestFeaturesOnly:
    """with_color=False (the FEATURE-phase fast path): compositing only
    the extra channels must produce feature image, alpha, and the
    feature/geometry gradients IDENTICAL to the full render — the rgb
    and depth rows carry zero cotangent in the FEATURE loss, so their
    removal is exact, not approximate."""

    def _setup(self, n=56, H=32, W=48, seed=11):
        cam = make_camera(H, W)
        means, scales, quats, colors, opac, feats = random_scene(n, seed)
        proj = project(means, scales, quats, colors, opac, cam, H, W)
        feats = np.asarray(feats)
        feats = feats / np.linalg.norm(feats, axis=1, keepdims=True)
        return proj, jnp.asarray(feats), H, W

    def test_forward_parity_both_backends(self):
        proj, feats, H, W = self._setup()
        bg = jnp.asarray([0.1, 0.2, 0.3])
        full = pallas_raster(proj, feats, bg, H, W)
        for backend in ("pallas", "dense"):
            if backend == "pallas":
                fo = RP.rasterize_tiled_pallas(
                    proj, feats, bg, H, W, CFG, interpret=True,
                    with_color=False)
            else:
                fo = R.rasterize_tiled(proj, feats, bg, H, W, CFG,
                                       with_color=False)
            assert "render" not in fo and "depth" not in fo
            np.testing.assert_allclose(
                np.asarray(fo["feats"]), np.asarray(full["feats"]),
                atol=1e-5, err_msg=f"feats/{backend}")
            np.testing.assert_allclose(
                np.asarray(fo["alpha"]), np.asarray(full["alpha"]),
                atol=1e-5, err_msg=f"alpha/{backend}")
            np.testing.assert_allclose(
                np.asarray(fo["feats_hwc"]),
                np.asarray(full["feats"]).transpose(1, 2, 0), atol=1e-5)

    @pytest.mark.parametrize("packed", [
        # unpacked parity: same mechanism at a coarser payload —
        # covered by the packed default; keep the full matrix opt-in
        pytest.param(False, marks=pytest.mark.slow),
        True,
    ])
    def test_grad_parity(self, packed):
        proj, feats, H, W = self._setup(n=48, seed=4)
        bg = jnp.zeros(3)
        rng = np.random.default_rng(2)
        wf = jnp.asarray(rng.normal(size=(feats.shape[1], H, W)),
                         jnp.float32)
        cfg = CFG._replace(pack_features=True) if packed else CFG

        def loss_fn(with_color):
            def f(mean2d, opa, extra):
                p = proj._replace(mean2d=mean2d, opacity=opa)
                out = RP.rasterize_tiled_pallas(
                    p, extra, bg, H, W, cfg, interpret=True,
                    with_color=with_color)
                return jnp.sum(out["feats"] * wf)
            return f

        args = (proj.mean2d, proj.opacity, feats)
        gfull = jax.grad(loss_fn(True), argnums=(0, 1, 2))(*args)
        gslim = jax.grad(loss_fn(False), argnums=(0, 1, 2))(*args)
        for nm, a, b in [("mean2d", gfull[0], gslim[0]),
                         ("opacity", gfull[1], gslim[1]),
                         ("extra", gfull[2], gslim[2])]:
            a, b = np.asarray(a), np.asarray(b)
            scale = np.abs(a).max() + 1e-8
            assert np.abs(a - b).max() / scale < 1e-5, nm

    @pytest.mark.parametrize("packed", [False, True])
    def test_grad_values_only_parity(self, packed):
        """grad_values_only=True must leave the VALUE-row gradients
        (features) bit-identical to the full backward while zeroing the
        geometry/opacity gradients — the post-densify FEATURE-phase
        contract (reference train.py:362-366 stops consuming the
        screen-space gradient there)."""
        proj, feats, H, W = self._setup(n=48, seed=4)
        bg = jnp.zeros(3)
        rng = np.random.default_rng(2)
        wf = jnp.asarray(rng.normal(size=(feats.shape[1], H, W)),
                         jnp.float32)
        cfg = CFG._replace(pack_features=True) if packed else CFG

        def loss_fn(values_only):
            def f(mean2d, opa, extra):
                p = proj._replace(mean2d=mean2d, opacity=opa)
                out = RP.rasterize_tiled_pallas(
                    p, extra, bg, H, W, cfg, interpret=True,
                    with_color=False, grad_values_only=values_only)
                return jnp.sum(out["feats"] * wf)
            return f

        args = (proj.mean2d, proj.opacity, feats)
        gfull = jax.grad(loss_fn(False), argnums=(0, 1, 2))(*args)
        gvals = jax.grad(loss_fn(True), argnums=(0, 1, 2))(*args)
        # value gradients: exactly the full backward's
        np.testing.assert_array_equal(np.asarray(gfull[2]),
                                      np.asarray(gvals[2]))
        # geometry/opacity gradients: exactly zero (declared dead)
        assert np.all(np.asarray(gvals[0]) == 0.0)
        assert np.all(np.asarray(gvals[1]) == 0.0)
        # and the full ones are NOT zero (the test has teeth)
        assert np.abs(np.asarray(gfull[0])).max() > 0

    def test_feature_step_values_only_matches_stats_variant(self):
        """with_densify_stats=False must produce bit-identical
        gaussian_features updates (the only trained group) — it drops
        only the screen-space stats accumulation."""
        from trase_tpu.engine import trainer as T
        from trase_tpu.models import gaussians as G
        from trase_tpu.models.deform import (
            init_deform, make_deform_network,
        )
        from trase_tpu.renderer import make_render_camera

        n, cap = 60, 64
        rng = np.random.default_rng(0)
        pts = (rng.normal(size=(n, 3)) * 0.5).astype(np.float32)
        pts[:, 2] += 3.0
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        params, aux = G.from_point_cloud(
            pts, cols, 1, capacity=cap, dist2=np.full(n, 0.01, np.float32))
        params = params._replace(
            gaussian_features=jnp.asarray(
                rng.normal(size=(cap, G.FEATURE_DIM)).astype(np.float32)))
        H = W = 48
        net = make_deform_network("DeformNetwork")
        dvars = init_deform(jax.random.PRNGKey(0), net)
        state = T.init_train_state(params, aux, dvars)
        cam = make_render_camera(np.eye(3), np.zeros(3), 0.8, 0.8, H, W)
        masks = jnp.asarray(
            (rng.random((4, H, W)) > 0.6).astype(np.float32))
        lrs = T.LearningRates(*[jnp.float32(1e-3)] * 8)
        kw = dict(
            deform_net=net, image_height=H, image_width=W, sh_degree=1,
            use_deform=True, is_6dof=False, contrastive_mode="soft",
            rfn=1.0, positive_th=0.75, negative_th=0.5,
            num_sampled_pixels=64, num_sampled_masks=4,
            use_smoothing=False, smooth_dropout=0.5, mask_hw=(H, W),
            raster_cfg=R.RasterConfig(pairs_per_gaussian=8,
                                      max_per_tile=128, tile_batch=4))
        outs = {}
        for stats in (True, False):
            s, m = T.feature_phase_step(
                state, cam.buffers, masks, jnp.ones((4,), bool),
                jnp.float32(0.4), jax.random.PRNGKey(3), lrs,
                jnp.zeros(3), jnp.zeros((cap, 1), jnp.int32),
                with_densify_stats=stats, **kw)
            assert bool(m["finite"])
            outs[stats] = s
        np.testing.assert_array_equal(
            np.asarray(outs[True].params.gaussian_features),
            np.asarray(outs[False].params.gaussian_features))
        # stats-off leaves the densification accumulators untouched
        np.testing.assert_array_equal(
            np.asarray(outs[False].aux.xyz_gradient_accum),
            np.asarray(state.aux.xyz_gradient_accum))

    def test_feature_step_backend_parity(self, monkeypatch):
        """The pallas path's feats_acc_hwc fast loss (norm via
        total^2 - acc^2, unsliced channel gathers) must produce the
        same update as the dense backend's plain-hwc path."""
        from trase_tpu import renderer as RD
        from trase_tpu.engine import trainer as T
        from trase_tpu.models import gaussians as G
        from trase_tpu.models.deform import (
            init_deform, make_deform_network,
        )
        from trase_tpu.renderer import make_render_camera

        n, cap = 60, 64
        rng = np.random.default_rng(0)
        pts = (rng.normal(size=(n, 3)) * 0.5).astype(np.float32)
        pts[:, 2] += 3.0
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        params, aux = G.from_point_cloud(
            pts, cols, 1, capacity=cap, dist2=np.full(n, 0.01, np.float32))
        params = params._replace(
            gaussian_features=jnp.asarray(
                rng.normal(size=(cap, G.FEATURE_DIM)).astype(np.float32)))
        H = W = 48
        net = make_deform_network("DeformNetwork")
        dvars = init_deform(jax.random.PRNGKey(0), net)
        state = T.init_train_state(params, aux, dvars)
        cam = make_render_camera(np.eye(3), np.zeros(3), 0.8, 0.8, H, W)
        masks = jnp.asarray(
            (rng.random((4, 24, 24)) > 0.6).astype(np.float32))
        lrs = T.LearningRates(*[jnp.float32(1e-3)] * 8)
        kw = dict(
            deform_net=net, image_height=H, image_width=W, sh_degree=1,
            use_deform=False, is_6dof=False, contrastive_mode="soft",
            rfn=1.0, positive_th=0.75, negative_th=0.5,
            num_sampled_pixels=64, num_sampled_masks=4,
            use_smoothing=False, smooth_dropout=0.5, mask_hw=(24, 24),
            with_densify_stats=False,
            raster_cfg=R.RasterConfig(pairs_per_gaussian=8,
                                      max_per_tile=128, tile_batch=4))
        outs = {}
        for backend in ("dense", "pallas_interpret"):
            # fresh jit per backend: the backend is resolved at TRACE
            # time inside render(), so a shared jit cache would ignore
            # the monkeypatch
            monkeypatch.setattr(RD, "default_backend", lambda b=backend: b)
            import functools as ft
            step = jax.jit(ft.partial(T._feature_phase_body, **kw))
            s, m = step(
                state, cam.buffers, masks, jnp.ones((4,), bool),
                jnp.float32(0.4), jax.random.PRNGKey(3), lrs,
                jnp.zeros(3), jnp.zeros((cap, 1), jnp.int32))
            assert bool(m["finite"])
            outs[backend] = (float(m["loss"]),
                             np.asarray(s.params.gaussian_features))
        # cross-backend: dense and pallas compositing differ in fp
        # association, and the contrastive thresholds can flip a pair
        # near the boundary (sign-flipped per-element grads) — so this
        # is a sanity band, not an equivalence: loss close, and the
        # overwhelming majority of feature updates identical to 1e-4
        l_d, f_d = outs["dense"]
        l_p, f_p = outs["pallas_interpret"]
        assert abs(l_d - l_p) < 5e-4 * max(abs(l_d), 1.0)
        frac_close = np.mean(np.abs(f_p - f_d) < 1e-4)
        assert frac_close > 0.99, frac_close

    def test_acc_hwc_loss_math_equivalence(self):
        """Same-backend check of the fast-path formulas: norm via
        total^2 - acc^2 and unsliced gathers must match the sliced
        hwc path on the SAME rendered tensor to fp-epsilon."""
        proj, feats, H, W = self._setup(n=48, seed=4)
        bg = jnp.zeros(3)
        out = RP.rasterize_tiled_pallas(
            proj, feats, bg, H, W, CFG, interpret=True, with_color=False)
        featsA = np.asarray(out["feats_acc_hwc"])
        hwc = np.asarray(out["feats_hwc"])
        np.testing.assert_array_equal(featsA[..., 1:], hwc)
        sq_new = (featsA * featsA).sum(-1) - featsA[..., 0] ** 2
        sq_old = (hwc * hwc).sum(-1)
        np.testing.assert_allclose(
            np.sqrt(np.maximum(sq_new, 0.0) + 1e-12),
            np.sqrt(sq_old + 1e-12), atol=5e-6)

    def test_feature_step_runs_and_matches_full_loss(self):
        """feature_phase_step (which now renders features-only) yields
        a loss identical to an explicit full-render computation of the
        same objective."""
        from trase_tpu.engine import trainer as T
        from trase_tpu.models import gaussians as G

        n, cap = 60, 64
        rng = np.random.default_rng(0)
        pts = (rng.normal(size=(n, 3)) * 0.5).astype(np.float32)
        pts[:, 2] += 3.0
        cols = rng.uniform(size=(n, 3)).astype(np.float32)
        params, aux = G.from_point_cloud(
            pts, cols, 1, capacity=cap, dist2=np.full(n, 0.01, np.float32))
        params = params._replace(
            gaussian_features=jnp.asarray(
                rng.normal(size=(cap, G.FEATURE_DIM)).astype(np.float32)))
        from trase_tpu.models.deform import (
            init_deform, make_deform_network,
        )
        from trase_tpu.renderer import make_render_camera

        H = W = 48
        net = make_deform_network("DeformNetwork")
        dvars = init_deform(jax.random.PRNGKey(0), net)
        state = T.init_train_state(params, aux, dvars)
        cam = make_render_camera(np.eye(3), np.zeros(3), 0.8, 0.8, H, W)
        masks = jnp.asarray(
            (rng.random((4, H, W)) > 0.6).astype(np.float32))
        lrs = T.LearningRates(*[jnp.float32(1e-3)] * 8)
        new_state, metrics = T.feature_phase_step(
            state, cam.buffers, masks, jnp.ones((4,), bool),
            jnp.float32(0.4), jax.random.PRNGKey(3), lrs, jnp.zeros(3),
            jnp.zeros((cap, 1), jnp.int32),
            deform_net=net, image_height=H, image_width=W, sh_degree=1,
            use_deform=True, is_6dof=False, contrastive_mode="soft",
            rfn=1.0, positive_th=0.75, negative_th=0.5,
            num_sampled_pixels=64, num_sampled_masks=4,
            use_smoothing=False, smooth_dropout=0.5, mask_hw=(H, W),
            raster_cfg=R.RasterConfig(pairs_per_gaussian=8,
                                      max_per_tile=128, tile_batch=4))
        assert bool(metrics["finite"])
        assert np.isfinite(float(metrics["loss"]))
        moved = np.abs(np.asarray(new_state.params.gaussian_features
                                  - state.params.gaussian_features)).max()
        assert moved > 0
