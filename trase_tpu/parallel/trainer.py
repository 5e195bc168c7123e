"""Mesh-aware training loop: the full reference trainer (train.py:76-398)
running SPMD over a ``jax.sharding.Mesh``.

``ShardedTrainer`` subclasses the single-device ``engine.loop.Trainer``
and swaps every device-side step for its sharded counterpart from
``parallel.sharded``: gaussian-parallel projection + tile-parallel
compositing for both phases, sharded densify/clone/split/prune,
sharded opacity reset, and a sharded eval render. All host-side
orchestration (OPT_STATE machine, viewpoint sampling, mask prefetch,
densify schedule, checkpointing, TB logging) is inherited unchanged —
the reference's training semantics live there, and they are identical
whether the state lives on one chip or eight.

The gaussian capacity is rounded up to a multiple of the mesh size at
construction (fixed-capacity state makes sharding a construction-time
choice); capacity growth doubles, preserving divisibility.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding
from jax.sharding import PartitionSpec as P

from ..engine import trainer as T
from ..engine.loop import Trainer
from ..models import gaussians as G
from ..ops.knn import build_feature_smooth_map
from ..ops.rasterize import RasterConfig
from .sharded import (
    AXIS,
    interleave_rows,
    make_mesh,
    make_sharded_densify,
    make_sharded_feature_step,
    make_sharded_gaussian_step,
    make_sharded_reset_opacity,
    shard_train_state,
    sharded_eval_render_fn,
)


class ShardedTrainer(Trainer):
    """Multi-device trainer: ``Trainer`` semantics over an ICI mesh.

    mesh_devices: number of devices to use (defaults to all).
    backend: "pallas" (span-roll kernels per tile-row slab; default on
    TPU meshes) or "dense" (the XLA compositor; default elsewhere).
    interleave_slots: round-robin permute slot rows so alive/free slots
    balance across shards (the per-shard free-slot allocation of the
    sharded densify needs this for fresh states, whose alive rows are
    packed at the front). Disable only for row-aligned parity tests.
    """

    def __init__(self, dataset_args, opt_args, pipe_args, scene,
                 raster_cfg: Optional[RasterConfig] = None,
                 max_new_per_densify: int = 8192,
                 seed: int = 0,
                 mesh_devices: Optional[int] = None,
                 backend: Optional[str] = None,
                 interleave_slots: bool = True):
        super().__init__(dataset_args, opt_args, pipe_args, scene,
                         raster_cfg=raster_cfg,
                         max_new_per_densify=max_new_per_densify,
                         seed=seed)
        self.mesh = make_mesh(mesh_devices)
        self.n_shards = self.mesh.shape[AXIS]
        self.backend = backend
        self.interleave_slots = interleave_slots

        # capacity (and the per-densify budget) must divide the mesh
        capacity = self.state.params.xyz.shape[0]
        if capacity % self.n_shards:
            new_cap = -(-capacity // self.n_shards) * self.n_shards
            p, a, o = G.grow_capacity(
                self.state.params, self.state.aux, self.state.opt, new_cap)
            self.state = self.state._replace(params=p, aux=a, opt=o)
        self.max_new_per_shard = -(-self.max_new // self.n_shards)

        if self.interleave_slots:
            self.state = interleave_rows(self.state, self.n_shards)
        self.state = shard_train_state(self.mesh, self.state)
        self._sharded_cache: dict = {}

    # ------------------------------------------------------------ steps

    def _cached(self, key, build):
        # raster_cfg is part of every key: pair-budget auto-escalation
        # (engine/loop.py) replaces self.raster_cfg mid-run and the
        # rebuilt steps must not be served from the old-K cache
        key = key + (self.raster_cfg,)
        fn = self._sharded_cache.get(key)
        if fn is None:
            fn = build()
            self._sharded_cache[key] = fn
        return fn

    def _capacity(self) -> int:
        return self.state.params.xyz.shape[0]

    def _gaussian_step(self, cam, iteration):
        use_deform = iteration >= self.opt.warm_up
        ast = self.ast_noise_fn(self.np_rng, iteration)
        rc = cam.to_render_camera()
        key = ("gauss", rc.image_height, rc.image_width,
               self.active_sh_degree, use_deform, self._capacity())
        step = self._cached(key, lambda: make_sharded_gaussian_step(
            self.mesh, self.deform_net, rc.image_height, rc.image_width,
            self.active_sh_degree, use_deform=use_deform,
            is_6dof=self.args.is_6dof,
            lambda_dssim=self.opt.lambda_dssim,
            lambda_reg_deform=self.opt.lambda_reg_deform,
            raster_cfg=self.raster_cfg, backend=self.backend,
        )(self.state))
        new_state, metrics = step(
            self.state, rc.buffers, self._gt_image(cam),
            jnp.float32(cam.fid), jnp.float32(ast),
            self.lr_at(iteration), self.bg_color)
        self.state = new_state
        return metrics

    def _feature_step(self, cam, iteration):
        entry = self._masks_for(cam)
        if entry is None:
            return None
        masks, valid = entry
        self.rng, step_rng = jax.random.split(self.rng)
        use_deform = iteration >= self.opt.warm_up
        use_smoothing = self.opt.smooth_K != 1
        rc = cam.to_render_camera()
        key = ("feat", rc.image_height, rc.image_width,
               self.active_sh_degree, use_deform, use_smoothing,
               self._capacity())
        step = self._cached(key, lambda: make_sharded_feature_step(
            self.mesh, self.deform_net, rc.image_height, rc.image_width,
            self.active_sh_degree, use_deform=use_deform,
            is_6dof=self.args.is_6dof,
            contrastive_mode=self.opt.contrastive_mode,
            rfn=self.opt.rfn,
            positive_th=self.opt.hard_positive_th,
            negative_th=self.opt.hard_negative_th,
            num_sampled_pixels=self.opt.num_sampled_pixels,
            num_sampled_masks=self.opt.num_sampled_masks,
            mask_hw=self._mask_hw,
            use_smoothing=use_smoothing,
            smooth_dropout=0.5,
            raster_cfg=self.raster_cfg, backend=self.backend,
        )(self.state))
        smooth_map = (self._get_smooth_map() if use_smoothing else
                      jnp.zeros((self._capacity(), 1), jnp.int32))
        new_state, metrics = step(
            self.state, rc.buffers, masks, valid,
            jnp.float32(cam.fid), step_rng, self.lr_at(iteration),
            self.bg_color, smooth_map)
        self.state = new_state
        return metrics

    def _get_smooth_map(self):
        if self._smooth_dirty or self._smooth_map is None:
            k = max(int(self.opt.smooth_K), 1)
            self._smooth_map = jax.jit(
                build_feature_smooth_map, static_argnames=("k",),
                out_shardings=NamedSharding(self.mesh, P(AXIS)),
            )(self.state.params.xyz, k=k)
            self._smooth_dirty = False
        return self._smooth_map

    def _densify(self, iteration):
        size_threshold = (20.0 if iteration > self.opt.opacity_reset_interval
                          else 0.0)
        self.rng, d_rng = jax.random.split(self.rng)
        cfg = G.DensifyConfig(
            grad_threshold=self.opt.densify_grad_threshold,
            percent_dense=self.opt.percent_dense,
            min_opacity=0.005,
        )
        n_alive = int(G.num_alive(self.state.aux))
        capacity = self._capacity()
        budget = self.max_new_per_shard * self.n_shards
        if n_alive + 2 * budget > capacity:
            p, a, o = G.grow_capacity(
                self.state.params, self.state.aux, self.state.opt,
                capacity * 2)
            grown = self.state._replace(params=p, aux=a, opt=o)
            if self.interleave_slots:
                # growth appends dead rows at the end; re-balance so the
                # new free slots land on every shard
                grown = interleave_rows(grown, self.n_shards)
            self.state = shard_train_state(self.mesh, grown)
            print(f"[densify] capacity {capacity} -> {capacity * 2}")
        key = ("densify", cfg, self._capacity())
        step = self._cached(key, lambda: make_sharded_densify(
            self.mesh, cfg=cfg,
            max_new_per_shard=self.max_new_per_shard)(self.state))
        new_state, stats = step(
            self.state, d_rng, jnp.float32(self.scene.cameras_extent),
            jnp.float32(size_threshold))
        self.state = new_state
        self._smooth_dirty = True
        return stats

    def _reset_opacity(self):
        key = ("reset", self._capacity())
        step = self._cached(
            key, lambda: make_sharded_reset_opacity(self.mesh)(self.state))
        self.state = step(self.state)

    # ------------------------------------------------------------- eval

    def render_view(self, cam, d_zero: bool = False):
        rc = cam.to_render_camera()
        key = ("eval", rc.image_height, rc.image_width,
               self.active_sh_degree, d_zero)
        if d_zero:
            from .sharded import sharded_render_fn

            fn = self._cached(key, lambda: sharded_render_fn(
                self.mesh, rc.image_height, rc.image_width,
                self.active_sh_degree, raster_cfg=self.raster_cfg,
                backend=self.backend))
            return fn(self.state.params, self.state.aux.alive,
                      rc.buffers, self.bg_color)
        fn = self._cached(key, lambda: sharded_eval_render_fn(
            self.mesh, self.deform_net, rc.image_height, rc.image_width,
            self.active_sh_degree, is_6dof=self.args.is_6dof,
            raster_cfg=self.raster_cfg, backend=self.backend,
        )(self.state.deform_vars))
        return fn(self.state.params, self.state.aux.alive,
                  self.state.deform_vars, jnp.float32(cam.fid),
                  rc.buffers, self.bg_color)

    # ------------------------------------------------------------- save

    def _postload(self):
        super()._postload()
        capacity = self.state.params.xyz.shape[0]
        if capacity % self.n_shards:
            new_cap = -(-capacity // self.n_shards) * self.n_shards
            p, a, o = G.grow_capacity(
                self.state.params, self.state.aux, self.state.opt, new_cap)
            self.state = self.state._replace(params=p, aux=a, opt=o)
        self.state = shard_train_state(self.mesh, self.state)
        self._sharded_cache.clear()

    def load_reference_ckpt(self, path: str):
        it = super().load_reference_ckpt(path)
        if self.interleave_slots:
            # imported captures pack alive rows first; re-balance them
            self.state = shard_train_state(
                self.mesh, interleave_rows(self.state, self.n_shards))
        return it
