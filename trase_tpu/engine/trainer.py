"""Two-phase training engine (GAUSSIAN / FEATURE), fully jitted steps.

Behavioral contract: train.py in the reference —
- OPT_STATE machine (train.py:51-73): starts GAUSSIAN; before
  `warm_up_3d_features` iterations nothing switches; afterwards the
  phase toggles every `iterative_opt_interval` non-NaN steps.
- GAUSSIAN phase (train.py:209-243): render RGB, loss =
  (1-λ)L1 + λ(1-SSIM) (+ λ_reg |d_xyz| after deform warm-up); updates
  xyz/f_dc/f_rest/opacity/scaling/rotation AND the deform MLP.
- FEATURE phase (train.py:244-296): sample pixels/masks from SAM
  masks, render 32-dim features, bilinear-resize to mask resolution,
  contrastive pos/neg pixel-pair losses + rfn·(1-‖F‖)²; updates only
  `gaussian_features`.
- Densification stats accumulate in BOTH phases from the screen-space
  position gradient (train.py:361-373); densify/prune every
  `densification_interval` in [densify_from_iter, densify_until_iter),
  opacity reset every `opacity_reset_interval`.
- AST time jitter: scalar gaussian noise * (1/num_frames) *
  linear-decay(iteration) added to the deform time input, not for
  blender scenes (train.py:198).
- Deform is active from iteration >= warm_up; its Adam steps only in
  GAUSSIAN phase; LR schedules per gaussian_model.py:290-301 and
  deform_model.py:45-48.

TPU design: phase = two separately-jitted pure step functions over the
fixed-capacity state; the NaN guard is a `where` on the whole update
tree; feature smoothing uses a cached KNN map, recomputed only when
xyz can have changed (phase switch into FEATURE / densify) — exact,
since xyz is frozen during a FEATURE block.
"""
from __future__ import annotations

import functools
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..losses.contrastive import (
    _cosine_gram,
    features_correspondence_matrix_hwc,
    negative_pixel_pair_loss,
    pixel_mask_correspondence_matrix,
    pixel_weights,
    positive_pixel_pair_loss,
    sample_pixels_and_masks,
)
from ..losses.image_losses import l1_loss
from ..models import gaussians as G
from ..models.deform import DeformNetwork, deform_step
from ..ops import rasterize as RT
from ..ops.ssim import ssim
from ..ops.projection import CameraBuffers
from ..renderer import RenderCamera, render
from ..utils.schedules import expon_lr_func, linear_noise_func
from .optim import AdamState, adam_init, adam_update, adam_update_tree

GAUSSIAN = "GAUSSIAN"
FEATURE = "FEATURE"


class OptState:
    """The reference's OPT_STATE machine (train.py:51-73)."""

    def __init__(self, max_iterations: int):
        self.state = GAUSSIAN
        self.iterations = 0
        self.max_iterations = max_iterations

    def step(self):
        self.iterations += 1

    def switch(self) -> bool:
        if self.iterations > self.max_iterations:
            self.state = FEATURE if self.state == GAUSSIAN else GAUSSIAN
            self.iterations = 0
            return True
        return False


class TrainState(NamedTuple):
    params: G.GaussianParams
    aux: G.GaussianAux
    opt: G.GaussianOptState
    deform_vars: Any
    deform_opt: Any  # pytree of AdamState


class LearningRates(NamedTuple):
    """Per-field LRs, host-scheduled, passed as scalars (no recompiles)."""

    xyz: jnp.ndarray
    features_dc: jnp.ndarray
    features_rest: jnp.ndarray
    opacity: jnp.ndarray
    scaling: jnp.ndarray
    rotation: jnp.ndarray
    gaussian_features: jnp.ndarray
    deform: jnp.ndarray


def make_learning_rate_schedules(opt_args, spatial_lr_scale: float = 5.0):
    """xyz + deform exponential schedules (gaussian_model.py:290-293,
    deform_model.py:45-48).

    Returns HOST floats, not device scalars: through the remote-device
    tunnel every per-iteration ``jnp.float32`` is its own transfer RPC;
    the train loop packs these into one scalar array per step
    (pack_step_scalars) and jit args trace python floats identically.
    """
    xyz_sched = expon_lr_func(
        lr_init=opt_args.position_lr_init * spatial_lr_scale,
        lr_final=opt_args.position_lr_final * spatial_lr_scale,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=opt_args.position_lr_max_steps,
    )
    deform_sched = expon_lr_func(
        lr_init=opt_args.position_lr_init * spatial_lr_scale,
        lr_final=opt_args.position_lr_final,
        lr_delay_mult=opt_args.position_lr_delay_mult,
        max_steps=opt_args.deform_lr_max_steps,
    )

    def at(iteration: int) -> LearningRates:
        return LearningRates(
            xyz=float(xyz_sched(iteration)),
            features_dc=float(opt_args.feature_lr),
            features_rest=float(opt_args.feature_lr / 20.0),
            opacity=float(opt_args.opacity_lr),
            scaling=float(opt_args.scaling_lr),
            rotation=float(opt_args.rotation_lr),
            gaussian_features=float(opt_args.feature_lr),
            deform=float(deform_sched(iteration)),
        )

    return at


# Fixed slot layout of the per-step packed metrics vector. One small
# device array per step means the host fetches ONE buffer per iteration
# (batched across iterations by the loop's metrics pipeline) instead of
# one round trip per metric — through the tunnel each fetch is a
# 50-200 ms RPC (BASELINE.md round-4 measurement caveat).
METRIC_KEYS = ("loss", "finite", "overflow", "overflow_half",
               "l1", "rfn", "pos_sim", "neg_sim")


def pack_metrics(metrics: dict) -> jnp.ndarray:
    """(8,) f32 of METRIC_KEYS (missing keys -> 0). In-graph, free."""
    return jnp.stack([
        jnp.asarray(metrics.get(k, 0.0), jnp.float32).reshape(())
        for k in METRIC_KEYS
    ])


# Per-step scalar pack: [fid, ast_noise, iteration, 8 x LearningRates].
# One (11,) host->device transfer per iteration replaces ~10 individual
# scalar transfers (each its own RPC through the tunnel).
N_STEP_SCALARS = 11


def pack_step_scalars(fid: float, ast_noise: float, iteration: int,
                      lrs: LearningRates) -> np.ndarray:
    return np.array([fid, ast_noise, float(iteration), *lrs], np.float32)


def _unpack_step_scalars(scal):
    lrs = LearningRates(*(scal[i] for i in range(3, 11)))
    return scal[0], scal[1], scal[2].astype(jnp.int32), lrs


def _all_finite(*trees) -> jnp.ndarray:
    """Scalar bool: every float leaf of every tree is finite.

    Applied to the POST-update state (params, optimizer moments,
    densify accumulators), not just the loss or the gradients. The
    reference's NaN guard checks only the loss (train.py:298-301);
    that is insufficient twice over: (a) a backward-only NaN (finite
    loss, NaN gradients) flows into the shared deform-MLP weights and
    silently blanks every subsequent render while the loss stays
    finite against the background, and (b) finite-but-huge gradients
    (|g| > ~2e19) overflow f32 when SQUARED in Adam's second moment —
    nu becomes inf, never decays (b2 * inf = inf), and permanently
    freezes or NaNs the row. Gating the state COMMIT on the new
    state's finiteness converts every such failure into one skipped,
    logged step.
    """
    flags = [
        jnp.all(jnp.isfinite(x))
        for t in trees
        for x in jax.tree_util.tree_leaves(t)
        if jnp.issubdtype(jnp.asarray(x).dtype, jnp.floating)
    ]
    return jnp.stack(flags).all() if flags else jnp.bool_(True)


def _where_tree(cond, new_tree, old_tree):
    return jax.tree_util.tree_map(
        lambda n, o: jnp.where(cond, n, o), new_tree, old_tree
    )


def _apply_deform(deform_net, deform_vars, xyz, fid, ast_noise, use_deform,
                  stop_grad_deform, bf16=True, gaussian_features=None):
    """d_xyz/d_rot/d_scale for the step; use_deform/stop_grad are static.

    bf16=True runs the MLP hidden stack in bf16 during TRAINING too
    (params, output heads, and Adam state stay f32 — mixed precision;
    measured 17.9 -> ~6 ms fwd+bwd at 131k gaussians on v5e). The
    reference trains this MLP in f32 torch; the f32 path stays
    available for parity checks via bf16=False.

    For the DeformSemanticNetwork variant (feature_dim > 0) the raw
    (C,1,32) gaussian_features feed the MLP input, matching the
    reference's forward contract (utils/time_utils.py:338-345 — raw
    features, torch.cat into the embedding; reference train.py never
    actually plumbs them, so its semantic variant cannot train — ours
    can). Features are stop-gradient'd: in GAUSSIAN phase they are not
    an optimization target, and in FEATURE phase the reference's
    step() call sites likewise treat the deform input as frozen.
    """
    if not use_deform:
        return 0.0, 0.0, 0.0
    n = xyz.shape[0]
    t = jnp.full((n, 1), 0.0) + fid + ast_noise
    vars_ = (jax.lax.stop_gradient(deform_vars) if stop_grad_deform
             else deform_vars)
    dtype = jnp.bfloat16 if bf16 else None
    feats = None
    if getattr(deform_net, "feature_dim", 0):
        feats = jax.lax.stop_gradient(
            gaussian_features.reshape(n, -1))
    return deform_step(deform_net, vars_, jax.lax.stop_gradient(xyz), t,
                       features=feats, dtype=dtype)


_GAUSSIAN_STATICS = (
    "deform_net", "image_height", "image_width", "sh_degree",
    "use_deform", "is_6dof", "lambda_dssim", "lambda_reg_deform",
    "raster_cfg",
)


def _gaussian_phase_body(
    state: TrainState,
    cam_buffers: CameraBuffers,
    gt_image: jnp.ndarray,  # (3, H, W)
    fid: jnp.ndarray,  # scalar
    ast_noise: jnp.ndarray,  # scalar
    lrs: LearningRates,
    bg_color: jnp.ndarray,
    *,
    deform_net: DeformNetwork,
    image_height: int,
    image_width: int,
    sh_degree: int,
    use_deform: bool,
    is_6dof: bool,
    lambda_dssim: float,
    lambda_reg_deform: float,
    raster_cfg: RT.RasterConfig,
):
    """One GAUSSIAN-phase step: photometric loss, grads, Adam on the
    gaussian group + deform MLP, densification-stat accumulation."""
    camera = RenderCamera(cam_buffers, image_height, image_width)
    p, aux = state.params, state.aux
    capacity = p.xyz.shape[0]
    off = jnp.zeros((capacity, 2))

    def loss_fn(params, deform_vars, off):
        d_xyz, d_rot, d_scale = _apply_deform(
            deform_net, deform_vars, params.xyz, fid, ast_noise,
            use_deform, stop_grad_deform=False,
            gaussian_features=params.gaussian_features,
        )
        out = render(
            camera, params, aux.alive, bg_color,
            d_xyz, d_rot, d_scale, is_6dof=is_6dof, sh_degree=sh_degree,
            mean2d_offset=off, with_features=False, raster_cfg=raster_cfg,
        )
        image = out["render"]
        ll1 = l1_loss(image, gt_image)
        loss = (1.0 - lambda_dssim) * ll1 + lambda_dssim * (
            1.0 - ssim(image, gt_image)
        )
        if use_deform and lambda_reg_deform > 0:
            loss = loss + lambda_reg_deform * jnp.abs(d_xyz).mean()
        return loss, (ll1, out["radii"], out["visibility_filter"],
                      out["overflow"], out["overflow_half"])

    (loss, (ll1, radii, visibility, overflow, overflow_half)), grads = \
        jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2), has_aux=True
        )(p, state.deform_vars, off)
    gp, gdeform, goff = grads

    alive = aux.alive

    new_fields = {}
    new_opt_fields = {}
    for name, lr in (
        ("xyz", lrs.xyz),
        ("features_dc", lrs.features_dc),
        ("features_rest", lrs.features_rest),
        ("opacity", lrs.opacity),
        ("scaling", lrs.scaling),
        ("rotation", lrs.rotation),
    ):
        np_, ns_ = adam_update(
            getattr(p, name), getattr(gp, name), getattr(state.opt, name),
            lr, row_mask=alive,
        )
        new_fields[name] = np_
        new_opt_fields[name] = ns_
    new_params = p._replace(**new_fields)
    new_opt = state.opt._replace(**new_opt_fields)

    if use_deform:
        new_deform, new_deform_opt = adam_update_tree(
            state.deform_vars, gdeform, state.deform_opt, lrs.deform
        )
    else:
        new_deform, new_deform_opt = state.deform_vars, state.deform_opt

    # densification stats from the screen-space gradient
    new_aux = G.add_densification_stats(
        aux, goff, visibility & alive, radii,
        camera.image_height, camera.image_width,
    )

    finite = jnp.isfinite(loss) & _all_finite(
        new_params, new_opt, new_aux, new_deform, new_deform_opt)
    new_state = TrainState(
        params=_where_tree(finite, new_params, p),
        aux=_where_tree(finite, new_aux, aux),
        opt=_where_tree(finite, new_opt, state.opt),
        deform_vars=_where_tree(finite, new_deform, state.deform_vars),
        deform_opt=_where_tree(finite, new_deform_opt, state.deform_opt),
    )
    metrics = {"loss": loss, "l1": ll1, "finite": finite,
               "overflow": overflow, "overflow_half": overflow_half}
    metrics["packed"] = pack_metrics(metrics)
    return new_state, metrics


# public entry, same signature as the body
gaussian_phase_step = functools.partial(
    jax.jit, static_argnames=_GAUSSIAN_STATICS)(_gaussian_phase_body)


@functools.partial(jax.jit, static_argnames=_GAUSSIAN_STATICS)
def gaussian_phase_step_packed(
    state: TrainState,
    cam_buffers: CameraBuffers,
    gt_image: jnp.ndarray,
    scal: jnp.ndarray,  # (N_STEP_SCALARS,) from pack_step_scalars
    bg_color: jnp.ndarray,
    *,
    deform_net: DeformNetwork,
    image_height: int,
    image_width: int,
    sh_degree: int,
    use_deform: bool,
    is_6dof: bool,
    lambda_dssim: float,
    lambda_reg_deform: float,
    raster_cfg: RT.RasterConfig,
):
    """gaussian_phase_step with all per-iteration scalars packed into
    one (11,) array: one host->device transfer per step instead of ~10
    individual scalar RPCs through the remote-device tunnel."""
    fid, ast_noise, _, lrs = _unpack_step_scalars(scal)
    return _gaussian_phase_body(
        state, cam_buffers, gt_image, fid, ast_noise, lrs, bg_color,
        deform_net=deform_net, image_height=image_height,
        image_width=image_width, sh_degree=sh_degree,
        use_deform=use_deform, is_6dof=is_6dof,
        lambda_dssim=lambda_dssim, lambda_reg_deform=lambda_reg_deform,
        raster_cfg=raster_cfg,
    )


_FEATURE_STATICS = (
    "deform_net", "image_height", "image_width", "sh_degree",
    "use_deform", "is_6dof", "contrastive_mode", "rfn",
    "positive_th", "negative_th",
    "num_sampled_pixels", "num_sampled_masks", "use_smoothing",
    "smooth_dropout", "mask_hw", "raster_cfg", "use_pixel_weights",
    "with_densify_stats",
)


def _feature_phase_body(
    state: TrainState,
    cam_buffers: CameraBuffers,
    sam_masks: jnp.ndarray,  # (M, Hm, Wm) float32, zero-padded
    mask_valid: jnp.ndarray,  # (M,) bool
    fid: jnp.ndarray,
    rng: jax.Array,
    lrs: LearningRates,
    bg_color: jnp.ndarray,
    smooth_map: jnp.ndarray,  # (C, K) int32 neighbor map
    *,
    deform_net: DeformNetwork,
    image_height: int,
    image_width: int,
    sh_degree: int,
    use_deform: bool,
    is_6dof: bool,
    contrastive_mode: str,
    rfn: float,
    positive_th: float,
    negative_th: float,
    num_sampled_pixels: int,
    num_sampled_masks: int,
    use_smoothing: bool,
    smooth_dropout: float,
    mask_hw: tuple,
    raster_cfg: RT.RasterConfig,
    use_pixel_weights: bool = True,
    with_densify_stats: bool = True,
):
    """One FEATURE-phase step: contrastive losses on rendered features;
    updates only `gaussian_features` (train.py:244-296).

    with_densify_stats=False (the post-densification schedule — the
    reference gates add_densification_stats on iteration <
    densify_until_iter, train.py:362-366): skips the screen-space
    offset gradient and the stats update entirely, which lets the
    Pallas backward run in values-only mode (no alpha-chain matmuls —
    the step differentiates nothing but `gaussian_features`)."""
    camera = RenderCamera(cam_buffers, image_height, image_width)
    p, aux = state.params, state.aux
    capacity = p.xyz.shape[0]
    off = jnp.zeros((capacity, 2))
    rng_sample, rng_smooth = jax.random.split(rng)

    sample = sample_pixels_and_masks(
        rng_sample, sam_masks, mask_valid,
        num_sampled_pixels, num_sampled_masks,
    )
    C = pixel_mask_correspondence_matrix(sam_masks, sample)
    weights = pixel_weights(sam_masks, sample) if use_pixel_weights else None

    d_xyz, d_rot, d_scale = _apply_deform(
        deform_net, state.deform_vars, p.xyz, fid, 0.0,
        use_deform, stop_grad_deform=True,
        gaussian_features=p.gaussian_features,
    )

    def loss_fn(feat32, off):
        params = p._replace(gaussian_features=feat32)
        # with_color=False: composite ONLY the 32 feature channels —
        # rgb/depth carry zero cotangent in this loss (the reference
        # renders them anyway and lets autograd zero them,
        # train.py:244-296); dropping them is gradient-exact
        # (tests/test_rasterize_pallas.py::TestFeaturesOnly) and cuts
        # the payload stream and both kernels' value matmuls
        out = render(
            camera, params, aux.alive, bg_color,
            d_xyz, d_rot, d_scale, is_6dof=is_6dof, sh_degree=sh_degree,
            mean2d_offset=off, with_features=True, with_color=False,
            grad_values_only=not with_densify_stats,
            norm_gaussian_features=True,
            smooth_map=smooth_map if use_smoothing else None,
            smooth_rng=rng_smooth if use_smoothing else None,
            smooth_dropout=smooth_dropout,
            raster_cfg=raster_cfg,
        )
        # channels-last feature image: the kernel-native layout — the
        # (F,H,W) transpose costs ~170 MB each way at 1K/32ch and this
        # path only ever samples pixels
        hm, wm = mask_hw
        featsA = out.get("render_gaussian_features_acc_hwc")
        if featsA is not None:
            # pallas fast path: (H, W, 1 + F) with the alpha
            # accumulator in column 0, UNSLICED — |feats|^2 per pixel
            # is rowsum(featsA^2) - acc^2, so the ~350 MB channel-
            # slice copy (+ its VJP pad) never materializes
            sq = (jnp.sum(featsA * featsA, axis=-1)
                  - featsA[..., 0] * featsA[..., 0])
            norm_per_px = jnp.sqrt(jnp.maximum(sq, 0.0) + 1e-12)
            rendered_feature_norm = norm_per_px.mean()
            rfn_reg = (1.0 - rendered_feature_norm) ** 2
            if featsA.shape[:2] != (hm, wm):
                # matmul-form resize (reference train.py:284's
                # interpolate): dense VJP — the point-tap sampler's
                # scatter VJP made XLA insert two ~5 ms while-loop
                # layout conversions at this shape (r5 device trace)
                from ..utils.image import bilinear_resize_mm

                resized = bilinear_resize_mm(featsA, hm, wm)
                sampled = resized.reshape(
                    -1, resized.shape[-1])[sample.pixel_idx][:, 1:]
            else:
                sampled = featsA.reshape(
                    -1, featsA.shape[-1])[sample.pixel_idx][:, 1:]
            C_F = _cosine_gram(sampled)
        else:
            feats = out["render_gaussian_features_hwc"]  # (H, W, F)
            # safe norm: background pixels composite to exactly 0,
            # where linalg.norm's gradient is NaN
            norm_per_px = jnp.sqrt(
                jnp.sum(feats * feats, axis=-1) + 1e-12)
            rendered_feature_norm = norm_per_px.mean()
            rfn_reg = (1.0 - rendered_feature_norm) ** 2
            if feats.shape[:2] != (hm, wm):
                # torch-interpolate-equivalent bilinear
                # (align_corners=False, NO antialias), matching
                # reference train.py:284 — but only at the P sampled
                # pixels: the loss never reads the rest of the resized
                # image, and the 4-tap gather is value- and
                # association-identical to resize-then-index while
                # skipping the full-image resize fwd AND its dense VJP
                from ..utils.image import bilinear_sample_flat

                sampled = bilinear_sample_flat(feats, sample.pixel_idx,
                                               hm, wm)
                C_F = _cosine_gram(sampled)
            else:
                C_F = features_correspondence_matrix_hwc(feats, sample)
        pos = positive_pixel_pair_loss[contrastive_mode](
            C, C_F, sample, positive_th=positive_th, weights=weights
        )
        neg = negative_pixel_pair_loss[contrastive_mode](
            C, C_F, sample, negative_th=negative_th, weights=weights
        )
        loss = pos + neg + rfn * rfn_reg

        pair = (sample.pixel_valid[:, None] & sample.pixel_valid[None, :])
        pos_sim = jnp.where(pair & (C == 1), C_F, 0.0).sum() / jnp.maximum(
            (pair & (C == 1)).sum(), 1)
        neg_sim = jnp.where(pair & (C == 0), C_F, 0.0).sum() / jnp.maximum(
            (pair & (C == 0)).sum(), 1)
        return loss, (out["radii"], out["visibility_filter"],
                      rendered_feature_norm, pos_sim, neg_sim,
                      out["overflow"], out["overflow_half"])

    argnums = (0, 1) if with_densify_stats else (0,)
    (loss, (radii, visibility, rf_norm, pos_sim, neg_sim, overflow,
            overflow_half)), grads = (
        jax.value_and_grad(loss_fn, argnums=argnums, has_aux=True)(
            p.gaussian_features, off
        )
    )
    gfeat = grads[0]
    goff = grads[1] if with_densify_stats else None

    new_feat, new_feat_opt = adam_update(
        p.gaussian_features, gfeat, state.opt.gaussian_features,
        lrs.gaussian_features, row_mask=aux.alive,
    )
    new_params = p._replace(gaussian_features=new_feat)
    new_opt = state.opt._replace(gaussian_features=new_feat_opt)

    if with_densify_stats:
        new_aux = G.add_densification_stats(
            aux, goff, visibility & aux.alive, radii,
            camera.image_height, camera.image_width,
        )
    else:
        new_aux = aux

    finite = jnp.isfinite(loss) & _all_finite(new_params, new_opt, new_aux)
    new_state = TrainState(
        params=_where_tree(finite, new_params, p),
        aux=_where_tree(finite, new_aux, aux),
        opt=_where_tree(finite, new_opt, state.opt),
        deform_vars=state.deform_vars,
        deform_opt=state.deform_opt,
    )
    metrics = {"loss": loss, "finite": finite, "rfn": rf_norm,
               "pos_sim": pos_sim, "neg_sim": neg_sim,
               "overflow": overflow, "overflow_half": overflow_half}
    metrics["packed"] = pack_metrics(metrics)
    return new_state, metrics


feature_phase_step = functools.partial(
    jax.jit, static_argnames=_FEATURE_STATICS)(_feature_phase_body)


@functools.partial(jax.jit, static_argnames=_FEATURE_STATICS)
def feature_phase_step_packed(
    state: TrainState,
    cam_buffers: CameraBuffers,
    sam_masks: jnp.ndarray,
    mask_valid: jnp.ndarray,
    scal: jnp.ndarray,  # (N_STEP_SCALARS,) from pack_step_scalars
    base_rng: jax.Array,  # device-resident, constant across the run
    bg_color: jnp.ndarray,
    smooth_map: jnp.ndarray,
    *,
    deform_net: DeformNetwork,
    image_height: int,
    image_width: int,
    sh_degree: int,
    use_deform: bool,
    is_6dof: bool,
    contrastive_mode: str,
    rfn: float,
    positive_th: float,
    negative_th: float,
    num_sampled_pixels: int,
    num_sampled_masks: int,
    use_smoothing: bool,
    smooth_dropout: float,
    mask_hw: tuple,
    raster_cfg: RT.RasterConfig,
    use_pixel_weights: bool = True,
    with_densify_stats: bool = True,
):
    """feature_phase_step with packed per-iteration scalars and the
    step RNG derived IN-GRAPH as fold_in(base_rng, iteration) — the
    host-side jax.random.split is itself a per-iteration device
    dispatch through the tunnel."""
    fid, _, it, lrs = _unpack_step_scalars(scal)
    rng = jax.random.fold_in(base_rng, it)
    return _feature_phase_body(
        state, cam_buffers, sam_masks, mask_valid, fid, rng, lrs,
        bg_color, smooth_map,
        deform_net=deform_net, image_height=image_height,
        image_width=image_width, sh_degree=sh_degree,
        use_deform=use_deform, is_6dof=is_6dof,
        contrastive_mode=contrastive_mode, rfn=rfn,
        positive_th=positive_th, negative_th=negative_th,
        num_sampled_pixels=num_sampled_pixels,
        num_sampled_masks=num_sampled_masks,
        use_smoothing=use_smoothing, smooth_dropout=smooth_dropout,
        mask_hw=mask_hw, raster_cfg=raster_cfg,
        use_pixel_weights=use_pixel_weights,
        with_densify_stats=with_densify_stats,
    )


@functools.partial(jax.jit, static_argnames=("cfg", "max_new"))
def densify_step(state: TrainState, rng, scene_extent, max_screen_size,
                 *, cfg: G.DensifyConfig, max_new: int):
    p, aux, opt, stats = G.densify_and_prune(
        state.params, state.aux, state.opt, cfg,
        scene_extent, max_screen_size, rng, max_new,
    )
    return state._replace(params=p, aux=aux, opt=opt), stats


@jax.jit
def reset_opacity_step(state: TrainState):
    p, opt = G.reset_opacity(state.params, state.aux, state.opt)
    return state._replace(params=p, opt=opt)


def _strong_typed(tree):
    """Strip weak types from every leaf. A weak-typed leaf in the
    initial TrainState (e.g. jnp.full with a python scalar) makes the
    jitted step RETRACE on iteration 2 — the step's outputs are
    strong-typed, so the avals differ — costing a silent ~60 s TPU
    recompile. Canonicalizing here protects every entry path
    (fresh init, checkpoint import, converters)."""
    return jax.tree_util.tree_map(
        lambda x: jax.lax.convert_element_type(x, x.dtype)
        if getattr(x, "weak_type", False) else x, tree)


def init_train_state(params, aux, deform_vars) -> TrainState:
    return _strong_typed(TrainState(
        params=params,
        aux=aux,
        opt=G.init_opt_state(params),
        deform_vars=deform_vars,
        deform_opt=jax.tree_util.tree_map(adam_init, deform_vars),
    ))


def make_ast_noise_fn(num_frames: int, is_blender: bool):
    """AST time-jitter amplitude (train.py:154,198): scalar
    N(0,1) * (1/num_frames) * linear_decay(iteration)."""
    smooth_term = linear_noise_func(
        lr_init=0.1, lr_final=1e-15, lr_delay_mult=0.01, max_steps=20000
    )
    time_interval = 1.0 / max(num_frames, 1)

    def fn(np_rng: np.random.Generator, iteration: int) -> float:
        if is_blender:
            return 0.0
        return float(
            np_rng.standard_normal() * time_interval * smooth_term(iteration)
        )

    return fn


@functools.partial(
    jax.jit,
    static_argnames=(
        "deform_net", "vgg_ext", "image_height", "image_width",
        "sh_degree", "use_deform", "is_6dof", "fx_key", "raster_cfg",
    ),
)
def style_phase_step(
    state: TrainState,
    cam_buffers,
    ref_vgg_feats: jnp.ndarray,  # (C, Nref) flattened style features
    style_mask: jnp.ndarray,  # (C,) bool — gaussians allowed to change
    fid: jnp.ndarray,
    lrs: LearningRates,
    bg_color: jnp.ndarray,
    *,
    deform_net: DeformNetwork,
    vgg_ext,
    image_height: int,
    image_width: int,
    sh_degree: int,
    use_deform: bool,
    is_6dof: bool,
    fx_key: str,
    raster_cfg: RT.RasterConfig,
):
    """One NNFM style-transfer step (train_style_transfer_nnfm.py:180-290):
    render RGB, VGG features of the render, NNFM loss against the
    reference style features; update ONLY features_dc / features_rest,
    with gradients zeroed outside the selected object
    (set_background_zero_grad, gaussian_model.py:155-157)."""
    from ..losses.style import loss_nnfm_style

    camera = RenderCamera(cam_buffers, image_height, image_width)
    p, aux = state.params, state.aux
    capacity = p.xyz.shape[0]
    off = jnp.zeros((capacity, 2))

    d_xyz, d_rot, d_scale = _apply_deform(
        deform_net, state.deform_vars, p.xyz, fid, 0.0,
        use_deform, stop_grad_deform=True,
        gaussian_features=p.gaussian_features,
    )

    def loss_fn(f_dc, f_rest, off):
        params = p._replace(features_dc=f_dc, features_rest=f_rest)
        out = render(
            camera, params, aux.alive, bg_color,
            d_xyz, d_rot, d_scale, is_6dof=is_6dof, sh_degree=sh_degree,
            mean2d_offset=off, with_features=False, raster_cfg=raster_cfg,
        )
        image = jnp.clip(out["render"], 0.0, 1.0)
        # double normalization (external + internal) matches the
        # reference pipeline exactly — see models/vgg.py normalize()
        feats = vgg_ext(vgg_ext.normalize(image))[fx_key][0]  # (C, h, w)
        loss = loss_nnfm_style(
            feats.reshape(feats.shape[0], -1), ref_vgg_feats
        )
        return loss, (out["radii"], out["visibility_filter"])

    (loss, (radii, visibility)), grads = jax.value_and_grad(
        loss_fn, argnums=(0, 1, 2), has_aux=True
    )(p.features_dc, p.features_rest, off)
    g_dc, g_rest, goff = grads

    row_mask = aux.alive & style_mask
    new_dc, opt_dc = adam_update(
        p.features_dc, g_dc, state.opt.features_dc,
        lrs.features_dc, row_mask=row_mask)
    new_rest, opt_rest = adam_update(
        p.features_rest, g_rest, state.opt.features_rest,
        lrs.features_rest, row_mask=row_mask)
    new_params = p._replace(features_dc=new_dc, features_rest=new_rest)
    new_opt = state.opt._replace(features_dc=opt_dc,
                                 features_rest=opt_rest)

    new_aux = G.add_densification_stats(
        aux, goff, visibility & aux.alive, radii,
        camera.image_height, camera.image_width,
    )
    finite = jnp.isfinite(loss) & _all_finite(new_params, new_opt, new_aux)
    new_state = state._replace(
        params=_where_tree(finite, new_params, p),
        aux=_where_tree(finite, new_aux, aux),
        opt=_where_tree(finite, new_opt, state.opt),
    )
    metrics = {"loss": loss, "finite": finite}
    metrics["packed"] = pack_metrics(metrics)
    return new_state, metrics
