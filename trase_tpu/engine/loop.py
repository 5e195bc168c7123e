"""Host-side training orchestrator: the reference `training()` loop
(train.py:76-398) over the jitted phase steps in engine/trainer.py.

Differences forced by the TPU execution model, all semantics-preserving:
- cameras/gt images/masks are uploaded once and cached as device arrays
  keyed by camera uid (the reference moves tensors per iteration);
- SAM mask stacks are padded to one static (M_max, H, W) shape per
  dataset so the FEATURE step compiles once;
- the feature-smoothing KNN map is recomputed only when xyz can have
  changed (phase switch into FEATURE, densify) — exact, since xyz is
  frozen during a FEATURE block;
- densify/prune is a jitted masked-write op with static `max_new`;
  capacity growth is a rare host-side reallocation + recompile.
"""
from __future__ import annotations

import os
import time
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from ..models import gaussians as G
from ..models.deform import init_deform, make_deform_network
from ..models.gaussians_io import load_checkpoint, save_checkpoint
from ..ops.knn import build_feature_smooth_map
from ..ops.rasterize import RasterConfig
from ..renderer import RenderCamera, render
from ..utils.image import psnr
from . import trainer as T


class TensorBoardLogger:
    """Optional TB logging via torch.utils.tensorboard (train.py:43-48)."""

    def __init__(self, model_path: str):
        self.writer = None
        try:
            from torch.utils.tensorboard import SummaryWriter

            self.writer = SummaryWriter(model_path)
        except ImportError:
            print("Tensorboard not available: not logging progress")

    def scalar(self, tag, value, step):
        if self.writer is not None:
            self.writer.add_scalar(tag, float(value), step)

    def images(self, tag, image, step):
        if self.writer is not None:
            self.writer.add_images(tag, np.asarray(image), step)


class Trainer:
    def __init__(self, dataset_args, opt_args, pipe_args, scene,
                 raster_cfg: Optional[RasterConfig] = None,
                 max_new_per_densify: int = 8192,
                 seed: int = 0):
        self.args = dataset_args
        self.opt = opt_args
        self.pipe = pipe_args
        self.scene = scene
        self.raster_cfg = raster_cfg or RasterConfig()
        self.max_new = max_new_per_densify

        self.deform_net = make_deform_network(
            getattr(opt_args, "deform_type", "DeformNetwork"),
            is_blender=dataset_args.is_blender,
            is_6dof=dataset_args.is_6dof,
        )
        rng = jax.random.PRNGKey(seed)
        self.np_rng = np.random.default_rng(seed)
        rng, init_rng = jax.random.split(rng)
        deform_vars = init_deform(init_rng, self.deform_net)
        self.rng = rng

        self.state = T.init_train_state(
            scene.gaussian_params, scene.gaussian_aux, deform_vars
        )
        self.lr_at = T.make_learning_rate_schedules(
            opt_args, scene.spatial_lr_scale
        )
        self.opt_state = T.OptState(opt_args.iterative_opt_interval)

        bg = [1.0, 1.0, 1.0] if dataset_args.white_background else [0, 0, 0]
        self.bg_color = jnp.asarray(bg, jnp.float32)

        self.active_sh_degree = 0
        self.max_sh_degree = dataset_args.sh_degree

        cams = scene.get_train_cameras()
        self.num_frames = len(cams)
        self.ast_noise_fn = T.make_ast_noise_fn(
            self.num_frames, dataset_args.is_blender
        )

        # device-side caches — BOUNDED (LRU): a padded (M_max, H, W)
        # mask stack is ~M_max*H*W*4 bytes and a gt image ~H*W*12; at
        # Neu3D scale an unbounded per-camera cache OOMs the chip
        # (reference trades the same memory with load2gpu_on_the_fly /
        # load_*_on_the_fly, arguments/__init__.py:68,73-74)
        from collections import OrderedDict

        self.gt_cache_size = int(getattr(opt_args, "gt_cache_size", 128))
        self.mask_cache_size = int(getattr(opt_args, "mask_cache_size", 8))
        self._gt_cache: OrderedDict = OrderedDict()
        self._mask_cache: OrderedDict = OrderedDict()
        self._mask_hw: Optional[tuple] = None
        self._m_max: Optional[int] = None
        self._prefetcher = None
        self._prefetched: dict = {}
        self._next_cam = None
        self._smooth_map = None
        self._smooth_dirty = True

        self.overflow_warn_frac = float(
            getattr(opt_args, "overflow_warn_frac", 0.02))
        # auto-escalation of the pair budget: the reference rasterizer
        # has unbounded per-gaussian tile coverage, so when truncation
        # stays above the warning threshold we double K (one retrace)
        # instead of silently degrading quality. 0 disables.
        self.max_pairs_per_gaussian = int(
            getattr(opt_args, "max_pairs_per_gaussian", 32))
        self._overflow_strikes = 0
        # de-escalation bookkeeping: never drop K below what the user
        # configured, and only after a sustained clean streak
        self._initial_pairs_per_gaussian = \
            self.raster_cfg.pairs_per_gaussian
        self._deescalate_clean = 0
        # metrics pipeline: the host runs up to `metrics_pipeline_depth`
        # iterations ahead of the metric fetches and drains them in
        # batches of `metrics_consume_batch` with ONE device_get — each
        # fetch through the remote-device tunnel is a full RPC round
        # trip (BASELINE.md round-4 caveat: 50-200 ms), so per-iteration
        # float(metrics[...]) calls dominate wall-clock long before the
        # device does. Flushed fully at phase switches / milestones, so
        # the NaN retro-correction (see _consume_metrics) lands before
        # any decision that depends on it.
        from collections import deque

        self.metrics_pipeline_depth = int(
            getattr(opt_args, "metrics_pipeline_depth", 24))
        self.metrics_consume_batch = int(
            getattr(opt_args, "metrics_consume_batch", 8))
        self._pending: "deque" = deque()
        self._last_consume_t = None
        # device-resident base key for in-graph per-step RNG derivation
        # (feature_phase_step_packed folds in the iteration index)
        self.rng, self._step_base_rng = jax.random.split(self.rng)
        self._render_view_cache: dict = {}
        self._n_alive_cache = int(G.num_alive(self.state.aux))
        self.ema_loss = 0.0
        self.ema_pos = 0.0
        self.ema_neg = 0.0
        self.best_psnr = 0.0
        self.best_iteration = 0
        self.tb = TensorBoardLogger(dataset_args.model_path) \
            if dataset_args.model_path else None

    # ------------------------------------------------------------ caches

    @staticmethod
    def _cam_key(cam):
        """Cache key that is unique ACROSS splits. `cam.uid` is the
        reference's per-split enumeration index (scene/cameras.py), so
        train uid 0 and test uid 0 COLLIDE — keying the GT cache by uid
        made every test-split evaluate() compare renders against
        cached TRAIN images (r5 diagnosis: reader-path test render
        scored 25.2 dB vs its own GT while evaluate reported 12.9 —
        exactly the cross-pair score; every earlier round's low
        test-PSNR readout was this artifact, not model quality).
        Training was never affected: the train loop only touches the
        train split, whose uids are unique."""
        return (cam.image_name, cam.image_width, cam.image_height)

    def _gt_image(self, cam) -> jnp.ndarray:
        key = self._cam_key(cam)
        if key in self._gt_cache:
            self._gt_cache.move_to_end(key)
            return self._gt_cache[key]
        img = cam.image
        if img is None:
            from PIL import Image as PILImage

            from ..native import rgba_to_rgb_f32

            with PILImage.open(cam.image_path) as im:
                raw = np.asarray(im.convert("RGBA"))
            img = rgba_to_rgb_f32(raw, np.asarray(self.bg_color))
        self._gt_cache[key] = jnp.asarray(img)
        while len(self._gt_cache) > self.gt_cache_size:
            self._gt_cache.popitem(last=False)
        return self._gt_cache[key]

    def _prepare_mask_meta(self, cams):
        """One static (M_max, H, W) shape across the dataset. Reads
        shape metadata only — no decoded stacks are retained (the
        round-1 version held every decoded mask in host RAM)."""
        from ..data.masks import decode_mask_file, mask_file_shape

        # size the mask LRU to the train set (capped): an undersized
        # cache re-uploads a ~20 MB decoded stack every FEATURE
        # iteration, and evicted device buffers release lazily through
        # the RPC tunnel — the r5 resume run leaked ~20 MB/feature-iter
        # to 130 GB host RSS and was OOM-killed at default size 8 with
        # 60 cameras. With cache >= n_cams each stack uploads once.
        self.mask_cache_size = max(self.mask_cache_size,
                                   min(len(cams), 128))
        m_max, hw = 0, None
        for cam in cams:
            if cam.masks is not None:
                shape = cam.masks.shape
            elif cam.mask_path:
                shape = mask_file_shape(cam.mask_path)
                if shape is None:
                    m = decode_mask_file(cam.mask_path)
                    shape = None if m is None else m.shape
            else:
                shape = None
            if shape is not None:
                m_max = max(m_max, shape[0])
                hw = tuple(shape[1:])
        self._m_max = max(m_max, 1)
        self._mask_hw = hw
        if any(cam.mask_path for cam in cams):
            from ..data.masks import MaskPrefetcher

            self._prefetcher = MaskPrefetcher(self._m_max)

    def _submit_mask_prefetch(self, cam):
        """Kick off background decode for an upcoming camera."""
        if (self._prefetcher is not None and cam.masks is None
                and cam.mask_path
                and self._cam_key(cam) not in self._mask_cache
                and cam.mask_path not in self._prefetched):
            self._prefetched[cam.mask_path] = True
            self._prefetcher.submit(cam.mask_path)

    def _masks_for(self, cam):
        key = self._cam_key(cam)
        if key in self._mask_cache:
            self._mask_cache.move_to_end(key)
            return self._mask_cache[key]
        masks = cam.masks
        padded_np = valid_np = None
        if masks is None and cam.mask_path:
            if cam.mask_path in self._prefetched:
                # drain the prefetch queue until our file arrives
                while cam.mask_path in self._prefetched:
                    path, padded = self._prefetcher.get()
                    del self._prefetched[path]
                    if path == cam.mask_path and padded is not None:
                        padded_np, valid_np = padded.masks, padded.valid
            if padded_np is None:
                from ..data.masks import load_padded_masks

                padded = load_padded_masks(cam.mask_path, self._m_max)
                if padded is not None:
                    padded_np, valid_np = padded.masks, padded.valid
        if padded_np is None:
            if masks is None:
                return None
            n = masks.shape[0]
            m = self._m_max
            padded_np = np.zeros((m,) + masks.shape[1:], np.float32)
            padded_np[: min(n, m)] = masks[:m]
            valid_np = np.arange(m) < n
        entry = (jnp.asarray(padded_np), jnp.asarray(valid_np))
        self._mask_cache[key] = entry
        while len(self._mask_cache) > self.mask_cache_size:
            self._mask_cache.popitem(last=False)
        return entry

    def _get_smooth_map(self):
        if self._smooth_dirty or self._smooth_map is None:
            k = max(int(self.opt.smooth_K), 1)
            self._smooth_map = jax.jit(
                build_feature_smooth_map, static_argnames=("k",)
            )(self.state.params.xyz, k=k)
            self._smooth_dirty = False
        return self._smooth_map

    def _dummy_smooth_map(self):
        """Device-cached (C,1) zeros for the no-smoothing path — a fresh
        jnp.zeros per iteration is a per-step device dispatch."""
        capacity = self.state.params.xyz.shape[0]
        cached = getattr(self, "_dummy_smooth", None)
        if cached is None or cached.shape[0] != capacity:
            cached = jnp.zeros((capacity, 1), jnp.int32)
            self._dummy_smooth = cached
        return cached

    # ------------------------------------------------------------- steps

    def _gaussian_step(self, cam, iteration):
        use_deform = iteration >= self.opt.warm_up
        ast = self.ast_noise_fn(self.np_rng, iteration)
        rc = cam.to_render_camera()
        scal = T.pack_step_scalars(cam.fid, ast, iteration,
                                   self.lr_at(iteration))
        new_state, metrics = T.gaussian_phase_step_packed(
            self.state, rc.buffers, self._gt_image(cam), scal,
            self.bg_color,
            deform_net=self.deform_net,
            image_height=rc.image_height, image_width=rc.image_width,
            sh_degree=self.active_sh_degree,
            use_deform=use_deform, is_6dof=self.args.is_6dof,
            lambda_dssim=self.opt.lambda_dssim,
            lambda_reg_deform=self.opt.lambda_reg_deform,
            raster_cfg=self.raster_cfg,
        )
        self.state = new_state
        return metrics

    def _feature_step(self, cam, iteration):
        entry = self._masks_for(cam)
        if entry is None:
            return None  # no masks for this camera -> skip (reference
            # assumes masks exist for all train views)
        masks, valid = entry
        use_deform = iteration >= self.opt.warm_up
        use_smoothing = self.opt.smooth_K != 1
        rc = cam.to_render_camera()
        scal = T.pack_step_scalars(cam.fid, 0.0, iteration,
                                   self.lr_at(iteration))
        new_state, metrics = T.feature_phase_step_packed(
            self.state, rc.buffers, masks, valid,
            scal, self._step_base_rng, self.bg_color,
            self._get_smooth_map() if use_smoothing else
            self._dummy_smooth_map(),
            deform_net=self.deform_net,
            image_height=rc.image_height, image_width=rc.image_width,
            sh_degree=self.active_sh_degree,
            use_deform=use_deform, is_6dof=self.args.is_6dof,
            contrastive_mode=self.opt.contrastive_mode,
            rfn=self.opt.rfn,
            positive_th=self.opt.hard_positive_th,
            negative_th=self.opt.hard_negative_th,
            num_sampled_pixels=self.opt.num_sampled_pixels,
            num_sampled_masks=self.opt.num_sampled_masks,
            use_smoothing=use_smoothing,
            smooth_dropout=0.5,
            mask_hw=self._mask_hw,
            raster_cfg=self.raster_cfg,
            # reference gates add_densification_stats on iteration <
            # densify_until_iter (train.py:362-366); past it, the step
            # differentiates only gaussian_features, which unlocks the
            # values-only Pallas backward (one retrace at the boundary)
            with_densify_stats=iteration < self.opt.densify_until_iter,
        )
        self.state = new_state
        return metrics

    def _densify(self, iteration):
        size_threshold = (20.0 if iteration > self.opt.opacity_reset_interval
                          else 0.0)
        self.rng, d_rng = jax.random.split(self.rng)
        cfg = G.DensifyConfig(
            grad_threshold=self.opt.densify_grad_threshold,
            percent_dense=self.opt.percent_dense,
            min_opacity=0.005,
        )
        # grow capacity when the buffer is nearly full
        n_alive = int(G.num_alive(self.state.aux))
        capacity = self.state.params.xyz.shape[0]
        if n_alive + self.max_new + self.max_new > capacity:
            p, a, o = G.grow_capacity(
                self.state.params, self.state.aux, self.state.opt,
                capacity * 2)
            self.state = self.state._replace(params=p, aux=a, opt=o)
            print(f"[densify] capacity {capacity} -> {capacity * 2}")
        new_state, stats = T.densify_step(
            self.state, d_rng,
            jnp.float32(self.scene.cameras_extent),
            jnp.float32(size_threshold),
            cfg=cfg, max_new=self.max_new,
        )
        self.state = new_state
        self._smooth_dirty = True
        self._n_alive_cache = int(stats["n_alive"]) \
            if "n_alive" in stats else int(G.num_alive(new_state.aux))
        return stats

    def _reset_opacity(self):
        self.state = T.reset_opacity_step(self.state)

    def _handle_overflow(self, iteration: int, dropped: float,
                         dropped_half: float = -1.0):
        """Pair-budget truncation guard: the reference rasterizer has
        unbounded per-gaussian tile coverage; ours trades a static K
        pair budget (RasterConfig.pairs_per_gaussian) for TPU-static
        shapes. Complain loudly when the drop rate is no longer
        negligible, and after two consecutive strikes double K toward
        the reference's unbounded-coverage semantics (one retrace of
        the jitted steps; the sharded trainer's step cache keys include
        raster_cfg so its steps rebuild too). `dropped_half` is the
        pallas kernel's would-drop count at K//2 (-1 when the backend
        doesn't report it): when an escalated K would still drop
        nothing at half budget for 10 consecutive checks, K halves
        back toward (never below) the configured starting budget —
        escalations triggered by a transient (pre-prune densify spike)
        are pure sort/gather waste afterwards."""
        total = max(float(self._n_alive_cache)
                    * self.raster_cfg.pairs_per_gaussian, 1.0)
        frac = dropped / total
        if self.tb:
            self.tb.scalar("overflow/dropped_pairs", dropped, iteration)
        if frac <= self.overflow_warn_frac:
            self._overflow_strikes = 0
            k = self.raster_cfg.pairs_per_gaussian
            if dropped_half == 0.0 and \
                    k > self._initial_pairs_per_gaussian:
                self._deescalate_clean += 1
                if self._deescalate_clean >= 10:
                    self.raster_cfg = self.raster_cfg._replace(
                        pairs_per_gaussian=k // 2)
                    self._deescalate_clean = 0
                    print(f"[ITER {iteration}] pair budget "
                          f"de-escalated: K={k} -> {k // 2} (no drops "
                          f"at K//2 for 10 consecutive checks)")
            else:
                self._deescalate_clean = 0
            return
        self._deescalate_clean = 0
        print(f"[ITER {iteration}] WARNING: pair budget overflow "
              f"{dropped:.0f} dropped pairs ({frac:.1%} of budget) — "
              f"raise --pairs_per_gaussian (K="
              f"{self.raster_cfg.pairs_per_gaussian})")
        self._overflow_strikes += 1
        k = self.raster_cfg.pairs_per_gaussian
        if self._overflow_strikes >= 2 and \
                k * 2 <= self.max_pairs_per_gaussian:
            self.raster_cfg = self.raster_cfg._replace(
                pairs_per_gaussian=k * 2)
            self._overflow_strikes = 0
            print(f"[ITER {iteration}] pair budget auto-escalated: "
                  f"K={k} -> {k * 2}")

    # ------------------------------------------------------------- train

    def train(self, first_iter: int = 0, testing_iterations=(),
              saving_iterations=(), checkpoint_iterations=(),
              progress=True, on_iteration=None,
              stall_timeout_s: float = 0.0):
        """stall_timeout_s > 0 arms a failure-detection watchdog: a
        daemon thread that hard-exits the process (os._exit(86)) when
        no iteration completes for that long. The axon tunnel can wedge
        with the host blocked inside an uninterruptible native recv —
        Python signal handlers never run (the main thread is off the
        bytecode loop), so --max_hours deadlines in host callbacks
        cannot fire; this killed multiple long runs before it was
        understood (BASELINE r4/r5 notes). A hard exit preserves the
        last committed snapshot + incremental curve for post-hoc eval;
        84+2=86 is distinguishable from timeout(1)'s 124."""
        opt = self.opt
        viewpoint_stack = []
        iter_bar = None
        self._heartbeat = time.time()
        if stall_timeout_s > 0:
            import threading

            def _watchdog():
                while True:
                    time.sleep(min(stall_timeout_s / 4, 60.0))
                    dt = time.time() - self._heartbeat
                    if dt > stall_timeout_s:
                        print(f"\n[watchdog] no iteration completed in "
                              f"{dt:.0f}s (> {stall_timeout_s:.0f}s) — "
                              "device/tunnel presumed wedged; hard "
                              "exit. Last snapshot + curve.jsonl are "
                              "intact for post-hoc eval.", flush=True)
                        os._exit(86)

            threading.Thread(target=_watchdog, daemon=True,
                             name="stall-watchdog").start()
        if progress:
            try:
                from tqdm import tqdm

                iter_bar = tqdm(range(first_iter, opt.iterations),
                                desc="Training progress")
            except ImportError:
                pass

        if first_iter >= opt.iterative_opt_interval and \
                first_iter >= opt.warm_up_3d_features:
            self.opt_state.state = T.FEATURE

        train_cams = self.scene.get_train_cameras()
        has_masks = any(c.masks is not None or c.mask_path
                        for c in train_cams)
        if has_masks:
            self._prepare_mask_meta(train_cams)

        t_start = time.time()
        for iteration in range(first_iter + 1, opt.iterations + 1):
            if iteration % 1000 == 0 and \
                    self.active_sh_degree < self.max_sh_degree:
                self.active_sh_degree += 1

            if iteration >= opt.warm_up_3d_features and has_masks:
                # consume the previous step's metrics BEFORE the switch
                # decision when a switch would fire: a non-finite step
                # landing exactly at the boundary retro-corrects the
                # optimistic counter, which must happen before
                # `iterations > max_iterations` is evaluated or the
                # phase flips one step early (one extra host sync per
                # ~iterative_opt_interval steps, off the hot path)
                if (self._pending
                        and self.opt_state.iterations
                        > self.opt_state.max_iterations):
                    self._flush_metrics(iter_bar, all_pending=True)
                if self.opt_state.switch():
                    viewpoint_stack = list(train_cams)
                    if self.opt_state.state == T.FEATURE:
                        self._smooth_dirty = True

            if not viewpoint_stack:
                viewpoint_stack = list(train_cams)
            if self._next_cam is not None:
                cam = self._next_cam
            else:
                cam = viewpoint_stack.pop(
                    int(self.np_rng.integers(0, len(viewpoint_stack))))
            # pre-draw the next view and start its mask decode on the
            # background thread so bit-unpacking overlaps the device
            # step (the reference decodes on the critical path,
            # train.py:246-249)
            if viewpoint_stack:
                self._next_cam = viewpoint_stack.pop(
                    int(self.np_rng.integers(0, len(viewpoint_stack))))
                if has_masks:
                    self._submit_mask_prefetch(self._next_cam)
            else:
                self._next_cam = None

            if self.opt_state.state == T.GAUSSIAN or not has_masks:
                metrics = self._gaussian_step(cam, iteration)
            else:
                metrics = self._feature_step(cam, iteration)
                if metrics is None:
                    metrics = self._gaussian_step(cam, iteration)

            # Pipeline the metrics fetches: enqueue this step's metrics
            # and drain the queue in batches once it is deep enough —
            # the device runs up to `metrics_pipeline_depth` iterations
            # ahead of the (RPC-expensive) host fetches. The phase
            # counter is incremented optimistically at enqueue (finite
            # losses are the overwhelming case — matching reference
            # train.py:378-380 exactly on healthy runs) and
            # retro-corrected on a NaN when its metrics are consumed;
            # the queue is flushed fully before any decision that
            # depends on it (phase switch, milestones).
            self.opt_state.step()
            self._pending.append((iteration, metrics))
            if len(self._pending) >= self.metrics_pipeline_depth:
                self._flush_metrics(iter_bar)
            elif iteration % 100 == 0 and "overflow" in metrics:
                # drain NOW so the pair-budget controller (which only
                # acts on %100 steps, _handle_overflow) reacts with
                # one-iteration latency instead of up to pipeline_depth
                # steps of truncated pairs — one extra RPC per 100
                # iterations, off the hot path
                self._flush_metrics(iter_bar, all_pending=True)
            if iter_bar and iteration % 10 == 0:
                iter_bar.update(10)

            milestone = (iteration in testing_iterations
                         or iteration in saving_iterations
                         or iteration in checkpoint_iterations)
            if milestone:
                self._flush_metrics(iter_bar, all_pending=True)

            if iteration in testing_iterations:
                cur = self.evaluate(iteration)
                if cur > self.best_psnr:
                    self.best_psnr = cur
                    self.best_iteration = iteration

            if iteration in saving_iterations:
                self.save_snapshot(iteration)

            # densification (train.py:361-373)
            if iteration < opt.densify_until_iter:
                if iteration > opt.densify_from_iter and \
                        iteration % opt.densification_interval == 0:
                    self._densify(iteration)
                if iteration % opt.opacity_reset_interval == 0 or (
                        self.args.white_background
                        and iteration == opt.densify_from_iter):
                    self._reset_opacity()

            if iteration in checkpoint_iterations:
                self.save_ckpt(iteration)

            if on_iteration is not None:
                on_iteration(self, iteration, metrics)
            self._heartbeat = time.time()

        self._flush_metrics(iter_bar, all_pending=True)
        if iter_bar:
            iter_bar.close()
        dt = time.time() - t_start
        n_iters = opt.iterations - first_iter
        print(f"Best PSNR = {self.best_psnr} in Iteration "
              f"{self.best_iteration}")
        if n_iters > 0:
            print(f"[timing] {n_iters} iters in {dt:.1f}s = "
                  f"{n_iters / dt:.2f} it/s")

    def _flush_metrics(self, iter_bar=None, all_pending: bool = False):
        """Drain queued (iteration, metrics) pairs, oldest first, with
        ONE device_get per batch — one tunnel RPC amortized over
        `metrics_consume_batch` iterations instead of several per
        iteration. With all_pending=True the whole queue drains (phase
        switches, milestones, end of training)."""
        take = (len(self._pending) if all_pending
                else min(self.metrics_consume_batch, len(self._pending)))
        if take == 0:
            return
        batch = [self._pending.popleft() for _ in range(take)]
        fetched = jax.device_get(
            [m.get("packed", {k: v for k, v in m.items()
                              if k != "packed"})
             for _, m in batch])
        # per-iteration time = inter-drain wall clock divided by the
        # number of iterations drained (the drain interval spans
        # `take` device steps plus the RPC stall; logging the raw gap
        # per row would overstate iter_time by the batch factor)
        now = time.time()
        iter_ms = None
        if self._last_consume_t is not None:
            iter_ms = (now - self._last_consume_t) * 1000.0 / take
        self._last_consume_t = now
        for (it, m), row in zip(batch, fetched):
            self._consume_metrics(it, m, row, iter_bar=iter_bar,
                                  iter_ms=iter_ms)

    def _consume_metrics(self, iteration: int, metrics: dict,
                         fetched=None, iter_bar=None, iter_ms=None):
        """Host-side bookkeeping for a completed step: NaN guard
        (retro-corrects the optimistic phase-counter increment), EMA
        displays, TensorBoard scalars, overflow telemetry. Runs up to
        `metrics_pipeline_depth` iterations behind the device by
        design. `fetched` is the host copy of metrics["packed"] (or of
        the metrics dict for steps that don't pack); None fetches
        synchronously."""
        if fetched is None:
            fetched = jax.device_get(
                metrics.get("packed",
                            {k: v for k, v in metrics.items()
                             if k != "packed"}))
        if isinstance(fetched, dict):
            vals = {k: float(v) for k, v in fetched.items()}
        else:
            vals = dict(zip(T.METRIC_KEYS,
                            np.asarray(fetched, np.float64)))
        loss = vals["loss"]
        finite = bool(vals["finite"])
        if not finite:
            # non-finite loss OR post-update state (trainer._all_finite): the
            # in-graph guard skipped the whole update, so this is one
            # lost step, not a poisoned run
            print(f"[ITER {iteration}] non-finite loss/grads "
                  f"(loss={loss:.6g}) — step skipped")
            # undo the optimistic opt_state.step() for this iteration
            # (the in-graph NaN guard already skipped the param update)
            self.opt_state.iterations = max(
                0, self.opt_state.iterations - 1)
        else:
            self.ema_loss = 0.4 * loss + 0.6 * self.ema_loss
        if "overflow" in metrics and iteration % 100 == 0:
            self._handle_overflow(
                iteration, vals["overflow"],
                vals.get("overflow_half", -1.0))
        if "pos_sim" in metrics:
            self.ema_pos = 0.4 * vals["pos_sim"] + 0.6 * self.ema_pos
            self.ema_neg = 0.4 * vals.get("neg_sim", 0.0) + \
                0.6 * self.ema_neg

        if self.tb:
            if "l1" in metrics:
                self.tb.scalar("train_loss_patches/l1_loss",
                               vals["l1"], iteration)
            self.tb.scalar("train_loss_patches/total_loss", loss,
                           iteration)
            if iter_ms is not None:
                self.tb.scalar("iter_time", iter_ms, iteration)

        if iter_bar and iteration % 10 == 0:
            show = {"Loss": f"{self.ema_loss:.3f}",
                    "State": self.opt_state.state,
                    "Points": self._n_alive_cache}
            if self.opt_state.state == T.FEATURE:
                show["RFN"] = f"{vals.get('rfn', 0.0):.3f}"
                show["Pos sim."] = f"{self.ema_pos:.3f}"
                show["Neg sim."] = f"{self.ema_neg:.3f}"
            if getattr(self.opt, "monitor_mem", False):
                # reference --monitor_mem fields (train.py:318-320):
                # peak device memory + host RSS
                show.update(self._memory_stats())
            iter_bar.set_postfix(show)

    def _memory_stats(self) -> dict:
        """Peak device bytes + host RSS, the reference's --monitor_mem
        progress fields (train.py:318-320)."""
        out = {}
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use",
                             stats.get("bytes_in_use", 0))
            if peak:
                out["Mem"] = f"{peak / 2**30:.2f}GB"
        except Exception:  # noqa: BLE001 — backend without memory_stats
            pass
        try:
            import resource

            rss_kb = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
            out["RSS"] = f"{rss_kb / 2**20:.2f}GB"
        except Exception:  # noqa: BLE001
            pass
        return out

    # ------------------------------------------------------------- eval

    def evaluate(self, iteration: int) -> float:
        """Fixed-index train/test PSNR report (train.py:421-495)."""
        test_psnr = 0.0
        test_cams = self.scene.get_test_cameras()
        train_cams = self.scene.get_train_cameras()
        configs = (
            ("test", [test_cams[i % len(test_cams)]
                      for i in range(5, 30, 5)] if test_cams else []),
            ("train", [train_cams[i % len(train_cams)]
                       for i in range(5, 30, 5)] if train_cams else []),
        )
        for name, cams in configs:
            if not cams:
                continue
            psnrs, l1s = [], []
            for cam in cams:
                img = self.render_view(cam)
                gt = self._gt_image(cam)
                img = jnp.clip(img, 0.0, 1.0)
                gt = jnp.clip(gt, 0.0, 1.0)
                psnrs.append(float(psnr(img[None], gt[None]).mean()))
                l1s.append(float(jnp.abs(img - gt).mean()))
            mean_psnr = float(np.mean(psnrs))
            print(f"\n[ITER {iteration}] Evaluating {name}: "
                  f"L1 {np.mean(l1s):.6f} PSNR {mean_psnr:.3f}")
            if self.tb:
                self.tb.scalar(f"{name}/loss_viewpoint - l1_loss",
                               float(np.mean(l1s)), iteration)
                self.tb.scalar(f"{name}/loss_viewpoint - psnr",
                               mean_psnr, iteration)
            if name == "test":
                test_psnr = mean_psnr
        if self.tb:
            self.tb.scalar("total_points",
                           int(G.num_alive(self.state.aux)), iteration)
        return test_psnr

    def render_view(self, cam, d_zero: bool = False):
        # jit cache keyed by everything closed over: a fresh jit per
        # call would recompile for EVERY view of EVERY eval (~20-40 s
        # each on hardware); one compile serves all same-shape cameras
        # since pose buffers and fid are traced arguments
        rc = cam.to_render_camera()
        key = (rc.image_height, rc.image_width, d_zero,
               self.active_sh_degree, self.args.is_6dof, self.raster_cfg)
        fn = self._render_view_cache.get(key)
        if fn is None:
            H, W = rc.image_height, rc.image_width
            sh_degree = self.active_sh_degree
            raster_cfg = self.raster_cfg
            is_6dof = self.args.is_6dof
            deform_net = self.deform_net
            bg_color = self.bg_color

            @jax.jit
            def _r(params, alive, deform_vars, buffers, fid):
                rcam = RenderCamera(buffers, H, W)
                if d_zero:
                    d = (0.0, 0.0, 0.0)
                else:
                    d = T._apply_deform(
                        deform_net, deform_vars, params.xyz, fid, 0.0,
                        True, stop_grad_deform=True,
                        gaussian_features=params.gaussian_features)
                return render(rcam, params, alive, bg_color, *d,
                              is_6dof=is_6dof, sh_degree=sh_degree,
                              with_features=False,
                              raster_cfg=raster_cfg)["render"]

            self._render_view_cache[key] = fn = _r
        state = self.state
        return fn(state.params, state.aux.alive, state.deform_vars,
                  rc.buffers, jnp.float32(cam.fid))

    # ------------------------------------------------------------- save

    def save_snapshot(self, iteration: int):
        print(f"\n[ITER {iteration}] Saving Gaussians")
        smoothed = None
        if self.opt.smooth_K != 1:
            from ..ops.knn import smooth_features

            smoothed = np.asarray(smooth_features(
                self.state.params.gaussian_features,
                self._get_smooth_map(), rng=None))
        self.scene.save(iteration, self.state.params,
                        self.state.aux.alive, smoothed_features=smoothed)
        deform_dir = os.path.join(self.args.model_path, "deform",
                                  f"iteration_{iteration}")
        save_checkpoint(os.path.join(deform_dir, "deform.pkl"),
                        {"vars": self.state.deform_vars,
                         "type": getattr(self.opt, "deform_type",
                                         "DeformNetwork")})

    @staticmethod
    def _state_schema(state) -> list:
        """Keyed schema of a TrainState pytree: (path, dtype) per leaf.

        NamedTuples pickle positionally, so a field rename between save
        and load would silently transpose state through a bare
        unflatten. The schema is written into the checkpoint at save
        time and checked by name against the live template on load.
        Shapes are intentionally NOT part of the schema — capacity
        growth between runs is legal.
        """
        leaves = jax.tree_util.tree_flatten_with_path(state)[0]
        return [(jax.tree_util.keystr(p),
                 str(x.dtype) if hasattr(x, "dtype") else
                 type(x).__name__)
                for p, x in leaves]

    def save_ckpt(self, iteration: int):
        print(f"\n[ITER {iteration}] Saving Checkpoint")
        save_checkpoint(
            os.path.join(self.args.model_path, f"chkpnt{iteration}.pkl"),
            {
                "state": self.state,
                "schema": self._state_schema(self.state),
                "iteration": iteration,
                "active_sh_degree": self.active_sh_degree,
                "opt_state": (self.opt_state.state,
                              self.opt_state.iterations),
            },
        )

    def load_ckpt(self, path: str):
        if path.endswith(".pth"):
            return self.load_reference_ckpt(path)
        payload = load_checkpoint(path)
        tmpl = self.state
        tmpl_schema = self._state_schema(tmpl)
        saved_schema = payload.get("schema")
        if saved_schema is not None:
            saved_schema = [tuple(row) for row in saved_schema]
            if saved_schema != tmpl_schema:
                saved_paths = [p for p, _ in saved_schema]
                tmpl_paths = [p for p, _ in tmpl_schema]
                missing = [p for p in tmpl_paths if p not in saved_paths]
                extra = [p for p in saved_paths if p not in tmpl_paths]
                dtype_diff = [
                    (p, sd, td)
                    for (p, sd), (tp, td) in zip(saved_schema, tmpl_schema)
                    if p == tp and sd != td
                ]
                raise ValueError(
                    f"checkpoint schema mismatch loading {path}: "
                    f"missing fields {missing or 'none'}, unexpected "
                    f"fields {extra or 'none'}, dtype changes "
                    f"{dtype_diff or 'none'}. The checkpoint was written "
                    f"by a different TrainState layout; refusing to load "
                    f"it positionally."
                )
        else:
            import warnings

            warnings.warn(
                f"{path} predates keyed checkpoint schemas; falling back "
                f"to positional restore (fields are matched by order)."
            )
        flat_np, _ = jax.tree_util.tree_flatten(payload["state"])
        flat_t, treedef = jax.tree_util.tree_flatten(tmpl)
        if len(flat_np) != len(flat_t):
            raise ValueError(
                f"checkpoint structure mismatch loading {path}: "
                f"{len(flat_np)} leaves saved vs {len(flat_t)} expected")
        self.state = jax.tree_util.tree_unflatten(
            treedef, [jnp.asarray(x) for x in flat_np])
        self.active_sh_degree = payload["active_sh_degree"]
        self.opt_state.state, self.opt_state.iterations = \
            payload["opt_state"]
        self._postload()
        return payload["iteration"]

    def load_reference_ckpt(self, path: str):
        """Resume from a reference torch ``chkpnt<N>.pth`` (train.py:396,
        gaussians.capture tuple). Deform weights are NOT in the
        reference checkpoint (its restore omits them too) — bring those
        via a snapshot deform.pth + tools.import_torch if needed."""
        from ..tools.import_torch import import_chkpnt_pth

        params, aux, opt, meta = import_chkpnt_pth(path)
        self.state = self.state._replace(params=params, aux=aux, opt=opt)
        self.active_sh_degree = int(meta["active_sh_degree"])
        self._smooth_dirty = True
        self._postload()
        return meta["iteration"]

    def _postload(self):
        """Hook for subclasses that must re-place state after a load."""
        self._n_alive_cache = int(G.num_alive(self.state.aux))
