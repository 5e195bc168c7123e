"""Multi-device execution: gaussian-parallel + tile-parallel SPMD.

The reference is strictly single-GPU (SURVEY.md §2.4) — this module is
the capability the TPU build adds: the gaussian set is sharded across
the ICI mesh, projection/deformation run gaussian-parallel, the
projected splats are all-gathered (they are ~45 floats/gaussian, far
smaller than parameters+optimizer state), and alpha compositing runs
tile-parallel with each device owning a slice of the image tiles. The
loss is computed on the gathered image identically on all devices; in
the backward pass XLA transposes the all-gathers into reduce-scatters
and the deform-MLP gradient is explicitly psum'd.

Axis name: "gauss". Capacity must be divisible by the mesh size (the
fixed-capacity state makes that a construction-time choice).
"""
from __future__ import annotations

import functools
from typing import Any

import jax
import jax.numpy as jnp
import numpy as np
from jax import shard_map
from jax.sharding import Mesh, NamedSharding
from jax.sharding import PartitionSpec as P

from ..engine.optim import adam_update, adam_update_tree
from ..losses.image_losses import l1_loss
from ..models import gaussians as G
from ..models.deform import DeformNetwork, deform_step
from ..ops import rasterize as RT
from ..ops import rasterize_pallas as RP
from ..ops.projection import CameraBuffers, compute_cov3d, project_gaussians
from ..ops.ssim import ssim
from ..engine import trainer as T

AXIS = "gauss"


def make_mesh(n_devices: int | None = None, devices=None) -> Mesh:
    if devices is None:
        devices = jax.devices()
    if n_devices is not None:
        devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (AXIS,))


def _row_spec(x):
    if hasattr(x, "ndim") and x.ndim >= 1:
        return P(AXIS)
    return P()


def interleave_rows(state, n_shards: int):
    """Round-robin permute the slot rows (params/aux/opt; deform
    untouched) so alive and free slots distribute evenly across shards.

    Fresh / compacted / imported states pack alive rows at the front of
    the capacity buffer; under block sharding the leading shards then
    hold no free slots and the per-shard free-slot allocation in the
    sharded densify (make_sharded_densify) starves while trailing
    shards sit empty. Slot order is an implementation detail (the
    reference's cat-based growth renumbers slots too), so a permutation
    is semantics-free.
    """
    c = state.params.xyz.shape[0]
    if c % n_shards:
        raise ValueError(f"capacity {c} not divisible by {n_shards}")
    perm = np.arange(c).reshape(c // n_shards, n_shards).T.reshape(-1)

    def permute(x):
        if hasattr(x, "ndim") and x.ndim >= 1 and x.shape[0] == c:
            return x[perm]
        return x

    tm = jax.tree_util.tree_map
    return state._replace(
        params=tm(permute, state.params),
        aux=tm(permute, state.aux),
        opt=tm(permute, state.opt),
    )


def shard_train_state(mesh: Mesh, state):
    """Place a TrainState (or any pytree whose per-gaussian arrays have
    the capacity as leading dim) on the mesh: per-row arrays sharded on
    AXIS, scalars and the deform MLP replicated."""

    def place(x, spec):
        return jax.device_put(x, NamedSharding(mesh, spec))

    def shard_leaf(x):
        if hasattr(x, "ndim") and x.ndim >= 1:
            return place(x, P(AXIS))
        return place(x, P())

    sharded = state._replace(
        params=jax.tree_util.tree_map(shard_leaf, state.params),
        aux=jax.tree_util.tree_map(shard_leaf, state.aux),
        opt=jax.tree_util.tree_map(shard_leaf, state.opt),
        deform_vars=jax.tree_util.tree_map(
            lambda x: place(x, P()), state.deform_vars),
        deform_opt=jax.tree_util.tree_map(
            lambda x: place(x, P()), state.deform_opt),
    )
    return sharded


def _gathered_projection(params_shard, alive_shard, d_xyz, d_rot, d_scale,
                         cam: CameraBuffers, H, W, sh_degree,
                         mean2d_offset_shard, is_6dof: bool = False):
    """Project the local gaussian shard, then all-gather the (small)
    projected representation so every device can composite any tile."""
    from ..renderer import apply_deformation

    means3d, scales, rots = apply_deformation(
        params_shard, d_xyz, d_rot, d_scale, is_6dof=is_6dof
    )
    opacity = G.get_opacity(params_shard)[:, 0]
    opacity = jnp.where(alive_shard, opacity, 0.0)
    cov3d = compute_cov3d(scales, rots, 1.0)
    proj = project_gaussians(
        means3d, cov3d, opacity, cam, H, W,
        sh_coeffs=G.get_features(params_shard), sh_degree=sh_degree,
    )
    if mean2d_offset_shard is not None:
        proj = proj._replace(mean2d=proj.mean2d + mean2d_offset_shard)
    # all-gather each small per-gaussian array along the shard axis
    return jax.tree_util.tree_map(
        lambda x: jax.lax.all_gather(x, AXIS, axis=0, tiled=True), proj
    )


def _composite_my_tiles(proj, extra, bg_color, H, W, cfg: RT.RasterConfig,
                        n_shards: int, with_color: bool = True):
    """Tile-parallel compositing: this device composites its slice of
    tile batches, then tiles are all-gathered into the full image."""
    th, tw = RT._tile_grid(H, W)
    num_tiles = th * tw
    sorted_gauss, tile_start, overflow = RT.build_tile_lists(
        proj, H, W, cfg)

    opacity = jnp.where(proj.valid, proj.opacity, 0.0)
    chans = [proj.color] if with_color else []
    if extra is not None:
        chans.append(extra)
    if with_color:
        chans.append(proj.depth[:, None])
    gdata = jnp.concatenate(chans, axis=1)
    C = gdata.shape[1]

    tb = cfg.tile_batch
    # pad so the batch count divides the mesh size
    n_batches = -(-num_tiles // tb)
    n_batches = -(-n_batches // n_shards) * n_shards
    pad_tiles = n_batches * tb
    my = jax.lax.axis_index(AXIS)
    per_dev = n_batches // n_shards
    batch0 = my * per_dev
    tiles = (batch0 * tb) + jnp.arange(per_dev * tb, dtype=jnp.int32)
    tiles = jnp.minimum(tiles, num_tiles - 1).reshape(per_dev, tb)

    composite = functools.partial(
        RT._composite_tiles,
        sorted_gauss=sorted_gauss, tile_start=tile_start, gdata=gdata,
        mean2d=proj.mean2d, conic=proj.conic, opacity=opacity,
        tw=tw, K=cfg.max_per_tile,
    )
    composite = jax.checkpoint(composite)
    out, acc = jax.lax.map(composite, tiles)  # (per_dev, tb, C, 256)
    out = out.reshape(per_dev * tb, C, RT.TILE, RT.TILE)
    acc = acc.reshape(per_dev * tb, RT.TILE, RT.TILE)

    # gather the tile slices -> full tile array on every device
    out = jax.lax.all_gather(out, AXIS, axis=0, tiled=True)[:num_tiles]
    acc = jax.lax.all_gather(acc, AXIS, axis=0, tiled=True)[:num_tiles]

    out = out.reshape(th, tw, C, RT.TILE, RT.TILE)
    out = out.transpose(2, 0, 3, 1, 4).reshape(C, th * RT.TILE, tw * RT.TILE)
    out = out[:, :H, :W]
    acc = acc.reshape(th, tw, RT.TILE, RT.TILE)
    acc = acc.transpose(0, 2, 1, 3).reshape(th * RT.TILE, tw * RT.TILE)
    acc = acc[:H, :W]

    result = {"alpha": acc[None],
              "overflow": overflow,
              # K//2 would-drop prediction exists only on the pallas
              # path; -1 disables the trainer's de-escalation here
              "overflow_half": jnp.float32(-1.0)}
    if with_color:
        rgb = out[:3] + (1.0 - acc)[None] * bg_color[:, None, None]
        result["render"] = rgb
        result["depth"] = out[-1:]
    if extra is not None:
        fh = out[3:-1] if with_color else out
        result["feats"] = fh
        # CHW here (this compositor's native layout); consumers that
        # want channels-last pay the transpose only when they read it
        result["feats_hwc"] = fh.transpose(1, 2, 0)
    return result


def _composite_my_rows_pallas(proj, extra, bg_color, H, W,
                              cfg: RT.RasterConfig, n_shards: int,
                              with_color: bool = True):
    """Tile-ROW-parallel Pallas compositing, fully differentiable:
    each device renders its slab of tile rows with the span-roll
    forward kernel (the binning / payload stages run replicated on the
    gathered projection — they are ~5 ms vs the compositor's per-slab
    cost and keep the layout bit-identical everywhere), then slabs are
    all-gathered into the image. Under jax.grad, each device runs the
    reverse-pass gradient kernel over ITS slab's windows only; the
    resulting partial per-gaussian payload gradients sum exactly
    across the mesh through the transpose of the projection
    all-gather (a psum-scatter XLA inserts automatically). Image
    height is padded so the tile-row count divides the mesh; the
    padded rows are empty and sliced away."""
    th, tw = RT._tile_grid(H, W)
    _, gxn = RP.group_geometry(tw)
    rows_pad = -(-th // n_shards) * n_shards
    h_pad = rows_pad * RP.TILE
    sorted_pid, slot_of_sorted, layout, overflow = RP.build_window_layout(
        proj, h_pad, W, cfg)
    payload, n_val = RP.build_payload(proj, extra, with_color)
    n_packed = 0
    if (cfg.pack_features and extra is not None
            and extra.shape[1] % 2 == 0):
        n_packed = extra.shape[1] // 2
    rows_local = rows_pad // n_shards
    my = jax.lax.axis_index(AXIS)
    g_lo = my * rows_local * gxn
    interp = not jax.default_backend().startswith("tpu")
    slab = RP.pallas_composite(
        (rows_pad * tw, tw, n_val, interp, rows_local, n_packed,
         with_color),
        payload, sorted_pid, slot_of_sorted, layout, g_lo)
    full = jax.lax.all_gather(slab, AXIS, axis=0, tiled=True)
    gxt = full.shape[2] * RP.TILE
    hwc = full.reshape(rows_pad * RP.TILE, gxt, n_val + 1)[:H, :W]
    acc = hwc[..., 0]
    result = {"alpha": acc[None],
              "overflow": overflow[0],
              "overflow_half": overflow[1]}
    if with_color:
        rgb = (hwc[..., 1:4]
               + (1.0 - acc)[..., None] * bg_color[None, None, :])
        result["render"] = rgb.transpose(2, 0, 1)
        result["depth"] = hwc[..., -1][None]
    if extra is not None:
        fh = hwc[..., 4:-1] if with_color else hwc[..., 1:]
        result["feats"] = fh.transpose(2, 0, 1)
        result["feats_hwc"] = fh
    return result


def sharded_render_fn(mesh: Mesh, H: int, W: int, sh_degree: int,
                      raster_cfg: RT.RasterConfig = RT.RasterConfig(),
                      backend: str | None = None):
    """Jitted multi-device render: params sharded on AXIS, image
    replicated out. Deformation deltas are scalars (canonical render).

    backend: "pallas" (tile-row slabs through the span-roll kernel;
    default on TPU meshes), "dense" (the XLA compositor; default
    elsewhere — also what CPU-mesh CI exercises compiled rather than
    interpreted)."""
    n_shards = mesh.shape[AXIS]
    if backend is None:
        backend = ("pallas"
                   if jax.default_backend().startswith("tpu") else "dense")
    params_specs = G.GaussianParams(
        *[P(AXIS)] * len(G.GaussianParams._fields))
    cam_specs = CameraBuffers(*[P()] * len(CameraBuffers._fields))

    def _render(params_shard, alive_shard, cam: CameraBuffers, bg_color):
        proj = _gathered_projection(
            params_shard, alive_shard, 0.0, 0.0, 0.0, cam, H, W,
            sh_degree, None)
        if backend == "pallas":
            out = _composite_my_rows_pallas(
                proj, None, bg_color, H, W, raster_cfg, n_shards)
        else:
            out = _composite_my_tiles(
                proj, None, bg_color, H, W, raster_cfg, n_shards)
        return out["render"]

    return jax.jit(shard_map(
        _render, mesh=mesh,
        in_specs=(params_specs, P(AXIS), cam_specs, P()),
        out_specs=P(),
        check_vma=False,
    ))


def sharded_eval_render_fn(mesh: Mesh, deform_net, H: int, W: int,
                           sh_degree: int, *,
                           is_6dof: bool = False,
                           raster_cfg: RT.RasterConfig = RT.RasterConfig(),
                           backend: str | None = None):
    """Jitted multi-device render WITH the deform MLP applied at time
    ``fid`` — the eval/`render_view` path of the mesh trainer. Params
    sharded on AXIS, deform vars replicated, image replicated out."""
    from ..engine.trainer import _apply_deform

    n_shards = mesh.shape[AXIS]
    if backend is None:
        backend = ("pallas"
                   if jax.default_backend().startswith("tpu") else "dense")
    compositor = (_composite_my_rows_pallas if backend == "pallas"
                  else _composite_my_tiles)
    params_specs = G.GaussianParams(
        *[P(AXIS)] * len(G.GaussianParams._fields))
    cam_specs = CameraBuffers(*[P()] * len(CameraBuffers._fields))

    def _render(params_shard, alive_shard, deform_vars, fid,
                cam: CameraBuffers, bg_color):
        d_xyz, d_rot, d_scale = _apply_deform(
            deform_net, deform_vars, params_shard.xyz, fid, 0.0,
            True, stop_grad_deform=True,
            gaussian_features=params_shard.gaussian_features)
        proj = _gathered_projection(
            params_shard, alive_shard, d_xyz, d_rot, d_scale, cam,
            H, W, sh_degree, None, is_6dof=is_6dof)
        out = compositor(proj, None, bg_color, H, W, raster_cfg, n_shards)
        return out["render"]

    def _specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def build(deform_vars_template):
        fn = shard_map(
            _render, mesh=mesh,
            in_specs=(params_specs, P(AXIS),
                      _specs_like(deform_vars_template, P()), P(),
                      cam_specs, P()),
            out_specs=P(),
            check_vma=False,
        )
        return jax.jit(fn)

    return build


def make_sharded_gaussian_step(
    mesh: Mesh,
    deform_net: DeformNetwork,
    H: int,
    W: int,
    sh_degree: int,
    *,
    use_deform: bool = True,
    is_6dof: bool = False,
    lambda_dssim: float = 0.2,
    lambda_reg_deform: float = 0.0,
    raster_cfg: RT.RasterConfig = RT.RasterConfig(),
    backend: str | None = None,
):
    """Multi-device GAUSSIAN-phase training step (full fwd+bwd+Adam).

    State sharding: per-gaussian arrays split on AXIS; deform MLP
    replicated (its gradient is psum'd across the mesh). Loss/metrics
    come out replicated. backend: "pallas" (slab fwd + reverse-pass
    gradient kernel per device; default on TPU) or "dense" (the XLA
    compositor with remat; default elsewhere)."""
    from ..engine.trainer import LearningRates, TrainState

    n_shards = mesh.shape[AXIS]
    if backend is None:
        backend = ("pallas"
                   if jax.default_backend().startswith("tpu") else "dense")
    compositor = (_composite_my_rows_pallas if backend == "pallas"
                  else _composite_my_tiles)

    def _specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def body(state: TrainState, cam: CameraBuffers, gt_image, fid,
             ast_noise, lrs: LearningRates, bg_color):
        p, aux = state.params, state.aux
        local_c = p.xyz.shape[0]
        off = jnp.zeros((local_c, 2))

        def loss_fn(params_shard, deform_vars, off_shard):
            from ..engine.trainer import _apply_deform

            d_xyz, d_rot, d_scale = _apply_deform(
                deform_net, deform_vars, params_shard.xyz, fid,
                ast_noise, use_deform, stop_grad_deform=False,
                gaussian_features=params_shard.gaussian_features)
            proj = _gathered_projection(
                params_shard, aux.alive, d_xyz, d_rot, d_scale,
                cam, H, W, sh_degree, off_shard, is_6dof=is_6dof)
            out = compositor(
                proj, None, bg_color, H, W, raster_cfg, n_shards)
            image = out["render"]
            ll1 = l1_loss(image, gt_image)
            loss = (1 - lambda_dssim) * ll1 + lambda_dssim * (
                1 - ssim(image, gt_image))
            if use_deform and lambda_reg_deform > 0:
                # global |d_xyz| mean: psum of local sums keeps the loss
                # replicated AND routes the exact gradient to each shard
                # (the VJP of psum is the identity broadcast)
                n_elem = d_xyz.size * n_shards
                reg = jax.lax.psum(jnp.abs(d_xyz).sum(), AXIS) / n_elem
                loss = loss + lambda_reg_deform * reg
            return loss, (ll1, out["overflow"], out["overflow_half"],
                          proj.radius)

        (loss, (ll1, overflow, overflow_half, radii_full)), grads = \
            jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(p, state.deform_vars, off)
        gp, gdeform, goff = grads
        # the local backward only accounts for this device's gaussians;
        # the replicated deform MLP needs the cross-shard sum
        gdeform = jax.lax.psum(gdeform, AXIS)

        alive = aux.alive
        new_fields, new_opt_fields = {}, {}
        for name, lr in (
            ("xyz", lrs.xyz), ("features_dc", lrs.features_dc),
            ("features_rest", lrs.features_rest),
            ("opacity", lrs.opacity), ("scaling", lrs.scaling),
            ("rotation", lrs.rotation),
        ):
            np_, ns_ = adam_update(
                getattr(p, name), getattr(gp, name),
                getattr(state.opt, name), lr, row_mask=alive)
            new_fields[name] = np_
            new_opt_fields[name] = ns_
        new_params = p._replace(**new_fields)
        new_opt = state.opt._replace(**new_opt_fields)

        if use_deform:
            new_deform, new_deform_opt = adam_update_tree(
                state.deform_vars, gdeform, state.deform_opt, lrs.deform)
        else:
            new_deform, new_deform_opt = (state.deform_vars,
                                          state.deform_opt)

        # densification stats on the local shard: slice this device's
        # rows back out of the gathered radii
        my = jax.lax.axis_index(AXIS)
        radii_local = jax.lax.dynamic_slice_in_dim(
            jax.lax.stop_gradient(radii_full), my * local_c, local_c)
        vis_local = radii_local > 0
        new_aux = G.add_densification_stats(
            aux, goff, vis_local & alive, radii_local, H, W)

        # Gate the COMMIT on the post-update state's finiteness (see
        # trainer._all_finite: catches backward-only NaNs AND Adam
        # nu overflow from finite-but-huge grads). The flag must be
        # globally consistent — most new leaves are shard-local, and a
        # shard-local skip would diverge the replicated deform vars.
        from ..engine.trainer import _all_finite
        finite = jnp.isfinite(loss) & _all_finite(
            new_params, new_opt, new_aux, new_deform, new_deform_opt)
        finite = jax.lax.pmin(finite.astype(jnp.int32), AXIS).astype(bool)
        cond = lambda n, o: jnp.where(finite, n, o)  # noqa: E731
        tm = jax.tree_util.tree_map
        new_state = TrainState(
            params=tm(cond, new_params, p),
            aux=tm(cond, new_aux, aux),
            opt=tm(cond, new_opt, state.opt),
            deform_vars=tm(cond, new_deform, state.deform_vars),
            deform_opt=tm(cond, new_deform_opt, state.deform_opt),
        )
        metrics = {"loss": loss, "l1": ll1, "finite": finite,
                   "overflow": overflow,
                   "overflow_half": overflow_half}
        metrics["packed"] = T.pack_metrics(metrics)
        return new_state, metrics

    def specs_for_state(state: TrainState) -> TrainState:
        return TrainState(
            params=_specs_like(state.params, P(AXIS)),
            aux=_specs_like(state.aux, P(AXIS)),
            opt=jax.tree_util.tree_map(
                lambda x: P(AXIS) if getattr(x, "ndim", 0) >= 1 else P(),
                state.opt),
            deform_vars=_specs_like(state.deform_vars, P()),
            deform_opt=_specs_like(state.deform_opt, P()),
        )

    def build(state_template: TrainState):
        in_state_specs = specs_for_state(state_template)
        lr_specs = LearningRates(*[P()] * len(LearningRates._fields))
        cam_specs = CameraBuffers(*[P()] * len(CameraBuffers._fields))
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(in_state_specs, cam_specs, P(), P(), P(),
                      lr_specs, P()),
            out_specs=(in_state_specs,
                       {"loss": P(), "l1": P(), "finite": P(),
                        "overflow": P(), "overflow_half": P(),
                        "packed": P()}),
            check_vma=False,
        )
        return jax.jit(fn)

    return build


def make_sharded_densify(mesh: Mesh, *, cfg, max_new_per_shard: int):
    """Multi-device densify/clone/split/prune (scene/gaussian_model.py:
    563-635, sharded).

    densify_and_prune is row-local except free-slot allocation, so each
    device densifies its own shard rows into its own shard's free
    slots — semantically equivalent to the reference up to slot
    placement (slot order is an implementation detail; the reference's
    cat-based growth likewise renumbers). Per-device RNG = fold_in of
    the replicated key with the device index (split children must not
    be identical across shards); counters psum to global stats.
    """
    from ..engine.trainer import TrainState

    def _specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def body(state: TrainState, rng, scene_extent, max_screen_size):
        my = jax.lax.axis_index(AXIS)
        rng_local = jax.random.fold_in(rng, my)
        p, aux, opt, stats = G.densify_and_prune(
            state.params, state.aux, state.opt, cfg,
            scene_extent, max_screen_size, rng_local, max_new_per_shard)
        stats = {k: jax.lax.psum(v, AXIS) for k, v in stats.items()}
        return state._replace(params=p, aux=aux, opt=opt), stats

    def build(state_template: TrainState):
        in_state_specs = TrainState(
            params=_specs_like(state_template.params, P(AXIS)),
            aux=_specs_like(state_template.aux, P(AXIS)),
            opt=jax.tree_util.tree_map(
                lambda x: P(AXIS) if getattr(x, "ndim", 0) >= 1 else P(),
                state_template.opt),
            deform_vars=_specs_like(state_template.deform_vars, P()),
            deform_opt=_specs_like(state_template.deform_opt, P()),
        )
        stat_specs = {k: P() for k in
                      ("n_clone", "n_split", "n_pruned", "n_alive",
                       "dropped")}
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(in_state_specs, P(), P(), P()),
            out_specs=(in_state_specs, stat_specs),
            check_vma=False,
        )
        return jax.jit(fn)

    return build


def make_sharded_reset_opacity(mesh: Mesh):
    """Sharded opacity clamp + Adam-state reset (elementwise — the
    shard_map exists only to keep the state resident in place)."""
    from ..engine.trainer import TrainState

    def body(state: TrainState):
        p, opt = G.reset_opacity(state.params, state.aux, state.opt)
        return state._replace(params=p, opt=opt)

    def build(state_template: TrainState):
        in_state_specs = TrainState(
            params=jax.tree_util.tree_map(
                lambda _: P(AXIS), state_template.params),
            aux=jax.tree_util.tree_map(
                lambda _: P(AXIS), state_template.aux),
            opt=jax.tree_util.tree_map(
                lambda x: P(AXIS) if getattr(x, "ndim", 0) >= 1 else P(),
                state_template.opt),
            deform_vars=jax.tree_util.tree_map(
                lambda _: P(), state_template.deform_vars),
            deform_opt=jax.tree_util.tree_map(
                lambda _: P(), state_template.deform_opt),
        )
        fn = shard_map(body, mesh=mesh, in_specs=(in_state_specs,),
                       out_specs=in_state_specs, check_vma=False)
        return jax.jit(fn)

    return build


def make_sharded_feature_step(
    mesh: Mesh,
    deform_net: DeformNetwork,
    H: int,
    W: int,
    sh_degree: int,
    *,
    use_deform: bool = True,
    is_6dof: bool = False,
    contrastive_mode: str = "soft",
    rfn: float = 1.0,
    positive_th: float = 0.75,
    negative_th: float = 0.5,
    num_sampled_pixels: int = 256,
    num_sampled_masks: int = 8,
    mask_hw: tuple = None,
    use_pixel_weights: bool = True,
    use_smoothing: bool = False,
    smooth_dropout: float = 0.5,
    raster_cfg: RT.RasterConfig = RT.RasterConfig(),
    backend: str | None = None,
):
    """Multi-device FEATURE-phase training step.

    The quadratic contrastive stage (SURVEY §3.1's memory hot spot)
    runs replicated on the gathered feature image — its cost is
    (P x P) over sampled pixels, independent of N — while the
    per-gaussian work (deform, projection, the 32-channel feature
    normalization, Adam on `gaussian_features`) is gaussian-parallel
    and compositing is tile-parallel, like the GAUSSIAN step. Masks
    and the PRNG key are replicated so sampling is identical on every
    device. Semantics mirror engine.trainer.feature_phase_step.

    With use_smoothing the KNN feature smoothing
    (scene/gaussian_model.py:79-104) runs sharded: local rows
    normalize, the normalized table is all-gathered, each device
    averages its rows' (global-index) neighbors with the reference's
    shared dropout permutation (replicated rng), and the smoothed
    rows are gathered again for compositing. The step then takes an
    extra (local_c, K) smooth_map operand sharded on AXIS.
    """
    from ..engine.trainer import LearningRates, TrainState
    from ..losses.contrastive import (
        negative_pixel_pair_loss,
        pixel_mask_correspondence_matrix,
        pixel_weights,
        positive_pixel_pair_loss,
        sample_pixels_and_masks,
    )

    n_shards = mesh.shape[AXIS]
    if backend is None:
        backend = ("pallas"
                   if jax.default_backend().startswith("tpu") else "dense")
    compositor = (_composite_my_rows_pallas if backend == "pallas"
                  else _composite_my_tiles)

    def _specs_like(tree, spec):
        return jax.tree_util.tree_map(lambda _: spec, tree)

    def body(state: TrainState, cam: CameraBuffers, sam_masks, mask_valid,
             fid, rng, lrs: LearningRates, bg_color, smooth_map):
        p, aux = state.params, state.aux
        local_c = p.xyz.shape[0]
        off = jnp.zeros((local_c, 2))

        # identical split to feature_phase_step
        rng_sample, rng_smooth = jax.random.split(rng)
        sample = sample_pixels_and_masks(
            rng_sample, sam_masks, mask_valid, num_sampled_pixels,
            num_sampled_masks)
        C = pixel_mask_correspondence_matrix(sam_masks, sample)
        weights = (pixel_weights(sam_masks, sample)
                   if use_pixel_weights else None)

        from ..engine.trainer import _apply_deform

        d_xyz, d_rot, d_scale = _apply_deform(
            deform_net, state.deform_vars, p.xyz, fid, 0.0,
            use_deform, stop_grad_deform=True,
            gaussian_features=p.gaussian_features)

        def loss_fn(feat_shard, off_shard):
            params = p._replace(gaussian_features=feat_shard)
            proj = _gathered_projection(
                params, aux.alive, d_xyz, d_rot, d_scale,
                cam, H, W, sh_degree, off_shard, is_6dof=is_6dof)
            flat = feat_shard.reshape(local_c, -1)
            normed = flat / jnp.sqrt(
                jnp.sum(flat * flat, axis=-1, keepdims=True) + 1e-12)
            if use_smoothing:
                # shared dropout permutation (replicated rng), global
                # neighbor indices into the gathered normalized table —
                # exact ops.knn.smooth_features semantics
                normed_full = jax.lax.all_gather(
                    normed, AXIS, axis=0, tiled=True)
                k = smooth_map.shape[1]
                n_sel = max(int(k * smooth_dropout), 1)
                if 0.0 < smooth_dropout < 1.0:
                    perm = jax.random.permutation(rng_smooth, k)[:n_sel]
                    sel = smooth_map[:, perm]
                else:
                    sel = smooth_map
                local_rows = normed_full[sel].mean(axis=1)
            else:
                local_rows = normed
            extra_full = jax.lax.all_gather(local_rows, AXIS, axis=0,
                                            tiled=True)
            out = compositor(
                proj, extra_full, bg_color, H, W, raster_cfg, n_shards,
                with_color=False)  # FEATURE fast path: rgb/depth carry
            # zero cotangent here; dropping them is gradient-exact
            # (tests/test_rasterize_pallas.py::TestFeaturesOnly)
            # kernel-native channels-last layout: the (F, H, W)
            # transpose costs ~170 MB each way at 1K/32ch
            feats = out["feats_hwc"]  # (H, W, F), replicated
            norm_per_px = jnp.sqrt(
                jnp.sum(feats * feats, axis=-1) + 1e-12)
            rf_norm = norm_per_px.mean()
            rfn_reg = (1.0 - rf_norm) ** 2

            hm, wm = mask_hw
            if feats.shape[:2] != (hm, wm):
                # sampled 4-tap gather == resize-then-index (see
                # engine/trainer.py FEATURE step); skips the dense
                # full-image resize fwd + VJP on every shard
                from ..losses.contrastive import _cosine_gram
                from ..utils.image import bilinear_sample_flat

                sampled = bilinear_sample_flat(feats, sample.pixel_idx,
                                               hm, wm)
                C_F = _cosine_gram(sampled)
            else:
                from ..losses.contrastive import (
                    features_correspondence_matrix_hwc,
                )

                C_F = features_correspondence_matrix_hwc(feats, sample)
            pos = positive_pixel_pair_loss[contrastive_mode](
                C, C_F, sample, positive_th=positive_th, weights=weights)
            neg = negative_pixel_pair_loss[contrastive_mode](
                C, C_F, sample, negative_th=negative_th, weights=weights)
            loss = pos + neg + rfn * rfn_reg
            return loss, (proj.radius, rf_norm, out["overflow"],
                          out["overflow_half"])

        (loss, (radii_full, rf_norm, overflow, overflow_half)), grads = (
            jax.value_and_grad(loss_fn, argnums=(0, 1), has_aux=True)(
                p.gaussian_features, off))
        gfeat, goff = grads

        new_feat, new_feat_opt = adam_update(
            p.gaussian_features, gfeat, state.opt.gaussian_features,
            lrs.gaussian_features, row_mask=aux.alive)
        new_params = p._replace(gaussian_features=new_feat)
        new_opt = state.opt._replace(gaussian_features=new_feat_opt)

        my = jax.lax.axis_index(AXIS)
        radii_local = jax.lax.dynamic_slice_in_dim(
            jax.lax.stop_gradient(radii_full), my * local_c, local_c)
        vis_local = radii_local > 0
        new_aux = G.add_densification_stats(
            aux, goff, vis_local & aux.alive, radii_local, H, W)

        # commit gate on post-update finiteness, globally agreed (see
        # the gaussian step above / trainer._all_finite)
        from ..engine.trainer import _all_finite
        finite = jnp.isfinite(loss) & _all_finite(
            new_params, new_opt, new_aux)
        finite = jax.lax.pmin(finite.astype(jnp.int32), AXIS).astype(bool)
        cond = lambda n, o: jnp.where(finite, n, o)  # noqa: E731
        tm = jax.tree_util.tree_map
        new_state = TrainState(
            params=tm(cond, new_params, p),
            aux=tm(cond, new_aux, aux),
            opt=tm(cond, new_opt, state.opt),
            deform_vars=state.deform_vars,
            deform_opt=state.deform_opt,
        )
        metrics = {"loss": loss, "finite": finite, "rfn": rf_norm,
                   "overflow": overflow,
                   "overflow_half": overflow_half}
        metrics["packed"] = T.pack_metrics(metrics)
        return new_state, metrics

    def specs_for_state(state: TrainState) -> TrainState:
        return TrainState(
            params=_specs_like(state.params, P(AXIS)),
            aux=_specs_like(state.aux, P(AXIS)),
            opt=jax.tree_util.tree_map(
                lambda x: P(AXIS) if getattr(x, "ndim", 0) >= 1 else P(),
                state.opt),
            deform_vars=_specs_like(state.deform_vars, P()),
            deform_opt=_specs_like(state.deform_opt, P()),
        )

    def build(state_template: TrainState):
        in_state_specs = specs_for_state(state_template)
        lr_specs = LearningRates(*[P()] * len(LearningRates._fields))
        cam_specs = CameraBuffers(*[P()] * len(CameraBuffers._fields))
        fn = shard_map(
            body, mesh=mesh,
            in_specs=(in_state_specs, cam_specs, P(), P(), P(), P(),
                      lr_specs, P(), P(AXIS)),
            out_specs=(in_state_specs,
                       {"loss": P(), "finite": P(), "rfn": P(),
                        "overflow": P(), "overflow_half": P(),
                        "packed": P()}),
            check_vma=False,
        )
        return jax.jit(fn)

    return build
