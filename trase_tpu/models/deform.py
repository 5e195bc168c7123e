"""Deformation field MLPs (flax.linen).

Behavioral contract: utils/time_utils.py in the reference — frequency
positional encoding (include_input + sin/cos per octave), an 8x256 MLP
with a skip connection at depth D/2, heads for d_xyz (or a 6-DoF screw
axis), d_rotation (4) and d_scaling (3); the `is_blender` variant feeds
time through a small "timenet" (t_emb -> 256 -> 30). Variants
(Static/Dynamic/Semantic) differ only in the time-encoding octaves and
an optional 32-dim feature input, and are selected by the same registry
names. The whole deformation step is one fused stack of matmuls on the
MXU via a single jitted apply over all N gaussians.
"""
from __future__ import annotations

from typing import Any, Callable

import flax.linen as nn
import jax
import jax.numpy as jnp

from ..utils.rigid import exp_se3


def frequency_embed(x: jnp.ndarray, num_freqs: int) -> jnp.ndarray:
    """[x | sin(2^0 x)..sin(2^(F-1) x) | cos(2^0 x)..cos(2^(F-1) x)].

    Same feature SET as the reference embedder (utils/time_utils.py:
    9-57) but in BLOCK order instead of the reference's per-frequency
    sin/cos interleave: the interleave is a pure lane relayout on TPU
    (~1 ms at 131k points) that the first Dense layer absorbs for
    free. Since weights are learned, the order is an internal
    convention; importing a reference deform checkpoint requires
    permuting the first Dense's rows: reference row 1*D + (2k+j)*D + d
    (j=0 sin, j=1 cos) -> ours D + j*F*D + k*D + d.
    """
    if num_freqs <= 0:
        return x
    freqs = 2.0 ** jnp.arange(num_freqs, dtype=x.dtype)
    xs = (x[..., None, :] * freqs[:, None]).reshape(*x.shape[:-1], -1)
    return jnp.concatenate([x, jnp.sin(xs), jnp.cos(xs)], axis=-1)


def embed_dim(input_dim: int, num_freqs: int) -> int:
    return input_dim * (1 + 2 * num_freqs)


class DeformNetwork(nn.Module):
    """Canonical-space deformation MLP: (xyz, t) -> (d_xyz, d_rot, d_scale)."""

    depth: int = 8
    width: int = 256
    multires: int = 10
    t_multires: int = 10  # 6 when is_blender
    is_blender: bool = False
    is_6dof: bool = False
    feature_dim: int = 0  # 32 for the Semantic variant
    # Computation dtype for the hidden stack (e.g. jnp.bfloat16 for
    # inference: ~2.5x faster on the MXU, <0.5% relative output error).
    # Params stay float32, so checkpoints are dtype-agnostic; the
    # frequency embedding stays float32 too (sin(2^9 x) needs the
    # mantissa), as do the output heads.
    dtype: Any = None

    @nn.compact
    def __call__(self, xyz: jnp.ndarray, t: jnp.ndarray,
                 features: jnp.ndarray | None = None):
        t_emb = frequency_embed(t, self.t_multires)
        if self.is_blender:
            t_emb = nn.Dense(256, dtype=self.dtype)(t_emb)
            t_emb = nn.relu(t_emb)
            t_emb = nn.Dense(30, dtype=self.dtype)(t_emb)
        x_emb = frequency_embed(xyz, self.multires)

        parts = [x_emb, t_emb.astype(x_emb.dtype)]
        if self.feature_dim:
            parts.append(features)
        inp = jnp.concatenate(parts, axis=-1)

        skip_at = self.depth // 2
        h = inp
        for i in range(self.depth):
            h = nn.Dense(self.width, dtype=self.dtype)(h)
            h = nn.relu(h)
            if i == skip_at:
                h = jnp.concatenate([inp.astype(h.dtype), h], axis=-1)

        h = h.astype(jnp.float32)
        if self.is_6dof:
            w = nn.Dense(3)(h)
            v = nn.Dense(3)(h)
            theta = jnp.linalg.norm(w, axis=-1, keepdims=True)
            w = w / theta + 1e-5
            v = v / theta + 1e-5
            screw_axis = jnp.concatenate([w, v], axis=-1)
            d_xyz = exp_se3(screw_axis, theta)
        else:
            d_xyz = nn.Dense(3)(h)
        d_rotation = nn.Dense(4)(h)
        d_scaling = nn.Dense(3)(h)
        return d_xyz, d_rotation, d_scaling


def make_deform_network(model_type: str = "DeformNetwork",
                        is_blender: bool = False,
                        is_6dof: bool = False) -> DeformNetwork:
    """Registry matching the reference's DeformModelType names
    (utils/time_utils.py:398-403); variants differ in time octaves and
    the optional 32-dim feature input."""
    if model_type == "DeformNetwork":
        return DeformNetwork(t_multires=6 if is_blender else 10,
                             is_blender=is_blender, is_6dof=is_6dof)
    if model_type == "DeformStaticNetwork":
        return DeformNetwork(t_multires=2, is_blender=is_blender,
                             is_6dof=is_6dof)
    if model_type == "DeformDynamicNetwork":
        return DeformNetwork(t_multires=32, is_blender=is_blender,
                             is_6dof=is_6dof)
    if model_type == "DeformSemanticNetwork":
        return DeformNetwork(t_multires=6 if is_blender else 10,
                             is_blender=is_blender, is_6dof=is_6dof,
                             feature_dim=32)
    raise ValueError(f"Unknown deform model type: {model_type}")


def init_deform(rng, model: DeformNetwork, n: int = 4):
    xyz = jnp.zeros((n, 3))
    t = jnp.zeros((n, 1))
    feats = jnp.zeros((n, 32)) if model.feature_dim else None
    if model.feature_dim:
        return model.init(rng, xyz, t, feats)
    return model.init(rng, xyz, t)


def deform_step(model: DeformNetwork, variables, xyz, t, features=None,
                dtype=None, fused=False):
    """Functional `DeformModel.step` (scene/deform_model.py:34-35).

    `dtype=jnp.bfloat16` runs the hidden stack in bf16 (inference /
    viewer path); params and outputs stay float32. `fused=True` routes
    the standard architecture through the VMEM-resident Pallas MLP
    kernel (ops/mlp_pallas.py) — inference only; falls back to the
    flax apply for variants the kernel doesn't cover.
    """
    if fused and features is None:
        from ..ops.mlp_pallas import fused_available, fused_deform_mlp

        if fused_available(model):
            emb = jnp.concatenate(
                [frequency_embed(xyz, model.multires),
                 frequency_embed(t, model.t_multires)], axis=-1)
            interp = not jax.default_backend().startswith("tpu")
            return fused_deform_mlp(variables["params"], emb,
                                    interpret=interp)
    if dtype is not None and dtype != model.dtype:
        model = model.clone(dtype=dtype)
    if model.feature_dim:
        return model.apply(variables, xyz, t, features)
    return model.apply(variables, xyz, t)


def farthest_point_sample(rng, xyz: jnp.ndarray, npoint: int) -> jnp.ndarray:
    """FPS over (N,3) -> (npoint,) indices (utils/time_utils.py:375-396,
    single batch)."""
    n = xyz.shape[0]

    def body(carry, _):
        distance, farthest = carry
        centroid = xyz[farthest]
        dist = jnp.sum((xyz - centroid) ** 2, axis=-1)
        distance = jnp.minimum(distance, dist)
        nxt = jnp.argmax(distance)
        return (distance, nxt), farthest

    first = jax.random.randint(rng, (), 0, n)
    (_, _), idx = jax.lax.scan(
        body, (jnp.full((n,), 1e10), first), None, length=npoint
    )
    return idx
