"""Headless interactive viewer — the GUI replacement.

Behavioral contract: gui.py / gui_standalone.py in the reference,
re-exposed as a programmable server object instead of a dearpygui
window (which needs a display):

- orbit camera navigation (cam_utils.OrbitCamera — same math);
- render modes Render / Rendered Features / Gaussian Features /
  Gaussian Clusters / Segmentation / Point Cloud / Depth
  (gui.py:672-677, mode dispatch gui.py:975-1083);
- clustering buttons -> `cluster(...)` writing clusters{,_kmeans}.pt
  (gui.py:248-319);
- click-prompt selection: pixel -> rendered depth -> unproject by the
  inverse full-projection -> nearest deformed gaussian -> its cluster,
  with the cosine score-threshold post-filter (gui.py:754-839,456-464);
- text-prompt selection via ext.grounded_sam when available
  (gui.py:1032-1064), mask-file fallback;
- removal (render with mask=~segmented, gui.py:414-417,1070),
  save-object (save_ply(mask=...), gui.py:617-651);
- per-frame ms / FPS readout (gui.py:1104-1124);
- gaussian-motion trajectory overlay: FPS-sampled tracks drawn as
  jet-colored polylines over the frame (gui.py:1154-1191).

The repo-root `viewer.py` CLI drives this object as a REPL.
"""
from __future__ import annotations

import os
import time

import numpy as np

MODES = ("Render", "Rendered Features", "Gaussian Features",
         "Gaussian Clusters", "Segmentation", "Point Cloud", "Depth")


class HeadlessViewer:
    def __init__(self, params, aux, n_gaussians, deform_net=None,
                 deform_vars=None, W=800, H=800, radius=2.0, fovy=60.0,
                 white_background=False, is_6dof=False, sh_degree=3,
                 model_dir=None, loaded_iter=None, raster_cfg=None,
                 backend=None):
        import jax.numpy as jnp

        from .cam_utils import OrbitCamera
        from .ops.rasterize import RasterConfig

        self.params = params
        self.aux = aux
        self.n = n_gaussians
        self.deform_net = deform_net
        self.deform_vars = deform_vars
        self.cam = OrbitCamera(W, H, r=radius, fovy=fovy)
        self.W, self.H = W, H
        self.white_background = white_background
        self.is_6dof = is_6dof
        self.sh_degree = sh_degree
        self.model_dir = model_dir
        self.loaded_iter = loaded_iter
        self.raster_cfg = raster_cfg or RasterConfig(
            pairs_per_gaussian=16, max_per_tile=1024, tile_batch=32)
        self.backend = backend
        self.bg = jnp.asarray(
            [1.0, 1.0, 1.0] if white_background else [0.0, 0.0, 0.0])

        self.mode = "Render"
        self.fid = 0.0
        self.score_threshold = 0.8
        self.cluster_ids = None  # (capacity,) int64, -1 = none
        self.cluster_rgb = None
        self.selected_clusters: list[int] = []
        self.segmented_mask = None  # (capacity,) bool device array
        self.last_frame_ms = float("nan")
        self._pca_rgb = None
        self._jit_cache = {}
        self.show_trajectory = False
        self._traj = None  # dict(ids, colors, history) once enabled
        self._traj_cfg = (32, 512, 1)  # samp_num, gs_num, thickness

    # ---------- model loading ----------

    @classmethod
    def from_model_path(cls, model_path, iteration=-1, model_type=
                        "DeformNetwork", is_blender=False, is_6dof=False,
                        sh_degree=3, **kw):
        """Standalone load from point_cloud.ply + deform weights +
        clusters, no dataset needed (gui_standalone.py:597-605)."""
        import jax
        import jax.numpy as jnp

        from .cluster.clustering import load_clusters
        from .models.deform import make_deform_network
        from .models.gaussians_io import load_checkpoint, load_gaussian_ply
        from .utils.general import search_for_max_iteration

        pc_dir = os.path.join(model_path, "point_cloud")
        it = iteration if iteration >= 0 else search_for_max_iteration(pc_dir)
        if it is None:
            raise FileNotFoundError(f"no snapshots under {pc_dir}")
        ply = os.path.join(pc_dir, f"iteration_{it}", "point_cloud.ply")
        params, aux, n, _ = load_gaussian_ply(ply, sh_degree=sh_degree)
        # the loader infers the file's true SH degree; render with it
        sh_degree = int(round(np.sqrt(params.features_rest.shape[1] + 1))) - 1

        net = make_deform_network(model_type, is_blender=is_blender,
                                  is_6dof=is_6dof)
        dvars = None
        dpath = os.path.join(model_path, "deform", f"iteration_{it}",
                             "deform.pkl")
        if os.path.exists(dpath):
            dvars = jax.tree_util.tree_map(
                jnp.asarray, load_checkpoint(dpath)["vars"])

        v = cls(params, aux, n, deform_net=net, deform_vars=dvars,
                is_6dof=is_6dof, sh_degree=sh_degree,
                model_dir=model_path, loaded_iter=it, **kw)
        for name in ("clusters.pt", "clusters_kmeans.pt"):
            p = os.path.join(pc_dir, f"iteration_{it}", name)
            if os.path.exists(p) or os.path.exists(p + ".npz"):
                ids, rgb = load_clusters(p)
                v.set_clusters(ids, rgb)
                break
        return v

    def set_clusters(self, ids, rgb):
        capacity = self.params.xyz.shape[0]
        self.cluster_ids = np.full(capacity, -1, np.int64)
        self.cluster_ids[:len(ids)] = np.asarray(ids).reshape(-1)
        self.cluster_rgb = np.zeros((capacity, 3), np.float32)
        self.cluster_rgb[:len(rgb)] = np.asarray(rgb)

    # ---------- clustering (gui.py:248-319) ----------

    def cluster(self, kmeans=False, k=64, save=True, **kw):
        from .cluster.clustering import (
            hdbscan_cluster, kmeans_cluster, save_clusters,
        )

        feats = np.asarray(self.params.gaussian_features)[:self.n]
        if kmeans:
            ids, rgb, _ = kmeans_cluster(feats, k=k, **kw)
            fname = "clusters_kmeans.pt"
        else:
            ids, rgb, _, k = hdbscan_cluster(feats, **kw)
            fname = "clusters.pt"
        self.set_clusters(ids, rgb)
        if save and self.model_dir and self.loaded_iter is not None:
            out = os.path.join(self.model_dir, "point_cloud",
                               f"iteration_{self.loaded_iter}", fname)
            save_clusters(out, ids, rgb)
        return int(np.unique(ids).size)

    # ---------- rendering ----------

    def _render_camera(self):
        from .cam_utils import pose_to_render_camera

        return pose_to_render_camera(
            self.cam.pose, self.W, self.H, self.cam.fovx, self.cam.fovy,
            self.cam.near, self.cam.far)

    def _deform(self, fid):
        import jax.numpy as jnp

        from .models.deform import deform_step

        capacity = self.params.xyz.shape[0]
        if self.deform_vars is None:
            z3 = jnp.zeros((capacity, 3))
            return z3, jnp.zeros((capacity, 4)), jnp.zeros((capacity, 3))
        t = jnp.full((capacity, 1), float(fid))
        return deform_step(self.deform_net, self.deform_vars,
                           self.params.xyz, t)

    def _raw_frame(self, override_color=None, mask=None, fid=None):
        import functools

        import jax
        import jax.numpy as jnp

        from .renderer import render

        fid = self.fid if fid is None else fid
        camera = self._render_camera()
        d_xyz, d_rot, d_scale = self._deform(fid)
        capacity = self.params.xyz.shape[0]

        key = "frame"
        if key not in self._jit_cache:
            @functools.partial(jax.jit,
                               static_argnames=("use_override",))
            def _f(params, d_xyz, d_rot, d_scale, buffers, override, mask,
                   *, use_override):
                from .renderer import RenderCamera
                cam = RenderCamera(buffers, self.H, self.W)
                out = render(
                    cam, params, self.aux.alive, self.bg,
                    d_xyz, d_rot, d_scale, is_6dof=self.is_6dof,
                    sh_degree=self.sh_degree,
                    override_color=override if use_override else None,
                    mask=mask, with_features=False,
                    raster_cfg=self.raster_cfg, backend=self.backend)
                # display path: quantize ON DEVICE so the host fetch
                # moves (H, W, 3) uint8 — 4x less than f32. On a
                # tunneled host the fetch dominates the frame; on a
                # local host it still saves 3/4 of the PCIe copy.
                out["render_u8"] = jnp.clip(
                    jnp.transpose(out["render"], (1, 2, 0)) * 255.0,
                    0, 255).astype(jnp.uint8)
                return out
            self._jit_cache[key] = _f
        f = self._jit_cache[key]
        return f(
            self.params, d_xyz, d_rot, d_scale, camera.buffers,
            jnp.zeros((capacity, 3)) if override_color is None
            else jnp.asarray(override_color),
            jnp.ones((capacity,), bool) if mask is None else mask,
            use_override=override_color is not None,
        ), d_xyz

    def render_frame(self, mode=None, apply_selection_removal=False):
        """One frame in the given mode -> (3, H, W) float image in [0,1].

        Updates the ms/FPS readout (gui.py:1104-1124)."""
        import jax.numpy as jnp

        from .viz import feature3d_to_rgb, point_splat

        mode = mode or self.mode
        t0 = time.perf_counter()
        mask = None
        if apply_selection_removal and self.segmented_mask is not None:
            mask = ~self.segmented_mask

        d_xyz = None
        if mode == "Render":
            out, d_xyz = self._raw_frame(mask=mask)
            img = np.asarray(out["render_u8"]).transpose(2, 0, 1)
            img = img.astype(np.float32) / 255.0
        elif mode == "Depth":
            out, d_xyz = self._raw_frame(mask=mask)
            depth = np.asarray(out["depth"])[0]
            img = np.broadcast_to(
                (depth / max(depth.max(), 1e-9))[None], (3,) + depth.shape
            ).copy()
        elif mode == "Rendered Features":
            img, d_xyz = self._feature_render(mask)
        elif mode == "Segmentation":
            if self.cluster_rgb is None:
                raise RuntimeError("run .cluster() first")
            out, d_xyz = self._raw_frame(
                override_color=self.cluster_rgb, mask=mask)
            img = np.asarray(out["render"])
        elif mode in ("Point Cloud", "Gaussian Features",
                      "Gaussian Clusters"):
            _, d_xyz = self._raw_frame(mask=mask)
            deformed = np.asarray(self.params.xyz + d_xyz)[:self.n]
            cam = self._render_camera()
            fp = np.asarray(cam.buffers.full_proj)
            colors = None
            if mode == "Gaussian Features":
                colors = np.asarray(self._pca()[:self.n])
            elif mode == "Gaussian Clusters":
                if self.cluster_rgb is None:
                    raise RuntimeError("run .cluster() first")
                colors = self.cluster_rgb[:self.n]
            img = point_splat(deformed, fp, self.H, self.W, colors,
                              self.white_background)
        else:
            raise ValueError(f"unknown mode {mode!r}; one of {MODES}")

        if self.show_trajectory and d_xyz is not None:
            img = self._apply_trajectory(img, d_xyz)
        self.last_frame_ms = (time.perf_counter() - t0) * 1000.0
        return img

    def toggle_trajectory(self, on=None, samp_num=32, gs_num=512,
                          thickness=1):
        """'Visualize Trajectory' checkbox (gui.py:1154-1191): track
        farthest-point-sampled gaussians across rendered frames and
        overlay their motion as jet-colored polylines. Tracks are
        (re)seeded from the current selection (if any) on enable."""
        self.show_trajectory = ((not self.show_trajectory)
                                if on is None else bool(on))
        self._traj = None
        self._traj_cfg = (samp_num, gs_num, thickness)
        return self.show_trajectory

    def _apply_trajectory(self, img, d_xyz):
        import jax
        import jax.numpy as jnp

        from .models import gaussians as G
        from .models.deform import farthest_point_sample
        from .viz import draw_polylines, jet_colors

        samp_num, gs_num, thickness = self._traj_cfg
        if self._traj is None:
            # seed: opacity > .1 among alive (gui.py:1159), restricted
            # to the selection when one exists (gui.py:1163-1166)
            alive = np.asarray(self.aux.alive)
            keep = alive & (
                np.asarray(G.get_opacity(self.params))[:, 0] > 0.1)
            if self.segmented_mask is not None:
                sel = keep & np.asarray(self.segmented_mask)
                if sel.sum() >= 4:
                    keep = sel
            cand = np.flatnonzero(keep)
            if cand.size == 0:
                cand = np.flatnonzero(alive)
            m = min(gs_num, cand.size)
            pts = jnp.asarray(
                np.asarray(self.params.xyz)[cand], jnp.float32)
            fps_idx = np.asarray(farthest_point_sample(
                jax.random.PRNGKey(0), pts, m))
            self._traj = {"ids": cand[fps_idx],
                          "colors": jet_colors(m), "history": []}
        tr = self._traj
        if self.is_6dof and getattr(d_xyz, "ndim", 0) == 3:
            # 6-DoF deform: d_xyz is a batch of homogeneous transforms
            # (renderer.apply_deformation:96-99), not a displacement
            xyz = np.asarray(self.params.xyz)[tr["ids"]]
            T = np.asarray(d_xyz)[tr["ids"]]
            hom = np.concatenate([xyz, np.ones_like(xyz[:, :1])], axis=1)
            out4 = np.einsum("nij,nj->ni", T, hom)
            pos = out4[:, :3] / np.where(
                np.abs(out4[:, 3:4]) < 1e-9, 1e-9, out4[:, 3:4])
        else:
            pos = (np.asarray(self.params.xyz)
                   + np.asarray(d_xyz))[tr["ids"]]  # (M, 3)
        tr["history"].append(pos)
        if len(tr["history"]) > samp_num:
            tr["history"] = tr["history"][-samp_num:]
        if len(tr["history"]) < 2:
            return img
        cam = self._render_camera()
        fp = np.asarray(cam.buffers.full_proj)
        world = np.stack(tr["history"])  # (T, M, 3)
        hom = np.concatenate(
            [world, np.ones_like(world[..., :1])], axis=-1)
        p = hom @ fp
        xy = p[..., :2] / np.where(
            np.abs(p[..., 3:4]) < 1e-9, 1e-9, p[..., 3:4])
        xy = (xy + 1) / 2 * np.array([self.W, self.H], np.float32)
        # behind-camera samples (w <= 0) project to mirrored pixels —
        # drop the segments touching them (same guard as point_splat's
        # p[:, 3] > 0)
        valid = p[..., 3] > 1e-6  # (T, M)
        rgb, alpha = draw_polylines(self.H, self.W, xy, tr["colors"],
                                    thickness, valid=valid)
        a = alpha[None]  # (1, H, W) over the (3, H, W) frame
        return img * (1 - a) + rgb.transpose(2, 0, 1) * a

    def _pca(self):
        from .viz import feature3d_to_rgb

        if self._pca_rgb is None:
            capacity = self.params.xyz.shape[0]
            feats = np.asarray(self.params.gaussian_features)[:self.n]
            pca = np.asarray(feature3d_to_rgb(feats))
            full = np.zeros((capacity, 3), np.float32)
            full[:self.n] = pca
            self._pca_rgb = full
        return self._pca_rgb

    def _feature_render(self, mask):
        """Composite the 32-dim features and PCA-color them
        (gui.py 'Rendered Features' mode). Returns (img, d_xyz)."""
        out, d_xyz = self._raw_frame(override_color=self._pca(),
                                     mask=mask)
        return np.asarray(out["render"]), d_xyz

    @property
    def fps(self):
        return 1000.0 / self.last_frame_ms if self.last_frame_ms else 0.0

    # ---------- selection (gui.py:754-839, 456-464) ----------

    def click_select(self, px, py, add=True):
        """Select the cluster under pixel (px, py) at the current view
        and time. Returns the cluster id (or None off-geometry)."""
        import jax.numpy as jnp

        from .ops.knn import knn

        if self.cluster_ids is None:
            raise RuntimeError("run .cluster() first")
        out, d_xyz = self._raw_frame()
        depth_img = np.asarray(out["depth"])[0]
        alpha = np.asarray(out["alpha"])[0]
        ph, pw = int(py), int(px)
        if alpha[ph, pw] <= 1e-3:
            return None
        d = depth_img[ph, pw] / max(alpha[ph, pw], 1e-6)
        cam = self._render_camera()
        znear, zfar = self.cam.near, self.cam.far
        z = zfar / (zfar - znear) * d - zfar * znear / (zfar - znear)
        uvz = np.array([((pw - 0.5) / self.W * 2 - 1) * d,
                        ((ph - 0.5) / self.H * 2 - 1) * d, z, d],
                       np.float32)[None]
        inv = np.linalg.inv(np.asarray(cam.buffers.full_proj))
        p3d = (uvz @ inv)[0, :3]

        deformed = np.asarray(self.params.xyz + d_xyz)
        deformed = np.where(np.asarray(self.aux.alive)[:, None], deformed,
                            np.inf)
        idx = int(np.linalg.norm(deformed - p3d, axis=-1).argmin())
        cid = int(self.cluster_ids[idx])
        if add and cid not in self.selected_clusters:
            self.selected_clusters.append(cid)
        self._recompute_mask()
        return cid

    def select_clusters(self, ids):
        self.selected_clusters = [int(i) for i in ids]
        self._recompute_mask()

    def text_select(self, text=None, mask2d=None, threshold=500):
        """Text-prompt selection (gui.py:1032-1064): 2D mask (from
        Grounded-SAM or a provided array) -> depth unproject -> KNN ->
        cluster-id bincount."""
        import jax.numpy as jnp

        from .ops.knn import knn

        if self.cluster_ids is None:
            raise RuntimeError("run .cluster() first")
        out, d_xyz = self._raw_frame()
        if mask2d is None:
            from .ext.grounded_sam import grounded_sam_mask

            mask2d = grounded_sam_mask(text, np.asarray(out["render"]))
        depth = np.asarray(out["depth"])[0]
        ys, xs = np.nonzero(np.asarray(mask2d))
        if len(ys) == 0:
            return []
        d = depth[ys, xs]
        znear, zfar = self.cam.near, self.cam.far
        z = zfar / (zfar - znear) * d - zfar * znear / (zfar - znear)
        uvz = np.stack([((xs - 0.5) / self.W * 2 - 1) * d,
                        ((ys - 0.5) / self.H * 2 - 1) * d, z, d], axis=1)
        cam = self._render_camera()
        inv = np.linalg.inv(np.asarray(cam.buffers.full_proj))
        pts3d = (uvz @ inv)[:, :3]
        deformed = np.asarray(self.params.xyz + d_xyz)
        _, nn_idx = knn(jnp.asarray(pts3d, jnp.float32),
                        jnp.asarray(deformed), k=1)
        cls = self.cluster_ids[np.asarray(nn_idx)[:, 0]]
        counts = np.bincount(cls[cls >= 0])
        ids = np.nonzero(counts > threshold)[0].tolist()
        self.select_clusters(ids)
        return ids

    def _recompute_mask(self):
        """Cluster membership + cosine post-filter (gui.py:823-839)."""
        import jax.numpy as jnp

        from .cluster.clustering import postprocessing

        if not self.selected_clusters:
            self.segmented_mask = None
            return
        feats = np.asarray(self.params.gaussian_features)
        seg = None
        for cid in self.selected_clusters:
            pre = self.cluster_ids == cid
            if not pre.any():
                continue
            post = pre & postprocessing(
                feats, feats[pre].mean(axis=0),
                score_threshold=self.score_threshold)
            seg = post if seg is None else seg | post
        self.segmented_mask = None if seg is None else jnp.asarray(seg)

    def clear_selection(self):
        self.selected_clusters = []
        self.segmented_mask = None

    # ---------- editing (gui.py:617-651) ----------

    def save_object(self, path=None):
        """save_ply(mask=segmented) -> point_cloud_object.ply."""
        from .models.gaussians_io import save_gaussian_ply

        if self.segmented_mask is None:
            raise RuntimeError("nothing selected")
        if path is None:
            path = os.path.join(
                self.model_dir, "point_cloud",
                f"iteration_{self.loaded_iter}", "point_cloud_object.ply")
        save_gaussian_ply(path, self.params, self.aux.alive,
                          mask=np.asarray(self.segmented_mask))
        return path

    def save_without_object(self, path=None):
        from .models.gaussians_io import save_gaussian_ply

        if self.segmented_mask is None:
            raise RuntimeError("nothing selected")
        if path is None:
            path = os.path.join(
                self.model_dir, "point_cloud",
                f"iteration_{self.loaded_iter}",
                "point_cloud_wo_object.ply")
        save_gaussian_ply(path, self.params, self.aux.alive,
                          mask=~np.asarray(self.segmented_mask))
        return path

    # ---------- composition (gaussian_renderer/__init__.py:251-331,
    # Scene(load_object=...), scene/__init__.py:106-119) ----------

    def load_object(self, ply_path):
        """Load an extracted object ply as the dynamic set for
        composition; this viewer's model becomes the background."""
        from .models.gaussians_io import load_gaussian_ply

        params, aux, n, _ = load_gaussian_ply(ply_path,
                                              sh_degree=self.sh_degree)
        self.object_params = params
        self.object_alive = aux.alive
        self.object_n = n
        return n

    def render_composite_frame(self, scales_bias=1.0,
                               motion_bias=(0.0, 0.0, 0.0),
                               rotation_bias=(0.0, 0.0, 0.0), fid=None):
        """Composite the loaded object (rescaled/rotated/translated,
        deformed by this model's deform field) with the background set
        in ONE rasterization. Returns (3, H, W)."""
        import jax.numpy as jnp

        from .renderer import render_composite

        if getattr(self, "object_params", None) is None:
            raise RuntimeError("load_object() first")
        t0 = time.perf_counter()
        camera = self._render_camera()
        fid = self.fid if fid is None else fid
        if self.deform_vars is not None:
            from .models.deform import deform_step

            cap = self.object_params.xyz.shape[0]
            t = jnp.full((cap, 1), float(fid))
            d_xyz, d_rot, d_scale = deform_step(
                self.deform_net, self.deform_vars, self.object_params.xyz,
                t)
        else:
            d_xyz = d_rot = d_scale = 0.0
        out = render_composite(
            camera, self.params, self.aux.alive,
            self.object_params, self.object_alive,
            d_xyz, d_rot, d_scale, self.bg,
            scales_bias=scales_bias, motion_bias=motion_bias,
            rotation_bias=rotation_bias, sh_degree=self.sh_degree,
            raster_cfg=self.raster_cfg, backend=self.backend)
        self.last_frame_ms = (time.perf_counter() - t0) * 1000.0
        return np.asarray(out["render"])
