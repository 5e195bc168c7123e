"""Fused Pallas inference kernel for the deformation MLP.

The reference evaluates an 8x256 MLP per gaussian per frame
(utils/time_utils.py:60-131); under XLA each Dense+relu round-trips
the (N, 256) activations through HBM (~67 MB per layer at N=131k).
This kernel keeps the whole stack VMEM-resident: weights load once
(~2 MB, cached across grid steps by their constant index maps) and
each grid step streams one row-tile of embeddings through all eight
layers plus the packed heads — one HBM read of the input and one
write of the 10 output channels.

The skip connection (reference time_utils.py:87: h = [inp, h] at
depth/2) is folded away by splitting the post-skip Dense's kernel
rows into an input part and a hidden part: concat(a, b) @ W ==
a @ W_top + b @ W_bottom — no ragged lane concat in-kernel.

Covers the inference fast path (standard DeformNetwork: no 6-DoF
head, no 32-dim feature input, no blender timenet); `fused_available`
gates callers, which fall back to the flax apply otherwise. Training
uses the flax path (autodiff).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

ROW_TILE = 2048
OUT_COLS = 16  # d_xyz(3) + d_rot(4) + d_scale(3), padded


def fused_available(model) -> bool:
    return (not model.is_6dof and not model.is_blender
            and model.feature_dim == 0 and model.depth == 8
            and model.width == 256)


def _kernel(emb_ref, w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, ws_in,
            ws_h, b5, w6, b6, w7, b7, wh, bh, out_ref):
    # bf16 hidden stack on the MXU (weights arrive pre-cast); biases /
    # relu / accumulation in f32, final head output f32 — mirrors the
    # flax `dtype=bfloat16` inference path.
    inp = emb_ref[...].astype(jnp.bfloat16)

    def matmul(h, w):
        # explicit DEFAULT precision: the implicit fp32 contract
        # precision is rejected by Mosaic for bf16 operands
        return jax.lax.dot_general(
            h, w[...], (((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.DEFAULT,
            preferred_element_type=jnp.float32)

    def dense(h, w, b):
        return jnp.maximum(matmul(h, w) + b[...],
                           0.0).astype(jnp.bfloat16)

    h = dense(inp, w0, b0)
    h = dense(h, w1, b1)
    h = dense(h, w2, b2)
    h = dense(h, w3, b3)
    h = dense(h, w4, b4)
    # skip: concat(inp, h) @ W5 == inp @ Ws_in + h @ Ws_h
    y = matmul(inp, ws_in) + matmul(h, ws_h) + b5[...]
    h = jnp.maximum(y, 0.0).astype(jnp.bfloat16)
    h = dense(h, w6, b6)
    h = dense(h, w7, b7)
    # head matmul in f32 (wh arrives uncast; flax heads are
    # dtype=float32 in the bf16 inference path)
    out_ref[...] = matmul(h.astype(jnp.float32), wh) + bh[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def fused_deform_mlp(params, emb, interpret=False):
    """params: flax `variables['params']` of a standard DeformNetwork;
    emb: (N, 84) concatenated [x_emb | t_emb]. Returns
    (d_xyz (N,3), d_rot (N,4), d_scale (N,3)) in float32.
    """
    n, in_dim = emb.shape
    p = params

    def kb(i):
        d = p[f"Dense_{i}"]
        return d["kernel"], d["bias"][None, :]

    w0, b0 = kb(0)
    w1, b1 = kb(1)
    w2, b2 = kb(2)
    w3, b3 = kb(3)
    w4, b4 = kb(4)
    w5, b5 = kb(5)
    ws_in, ws_h = w5[:in_dim], w5[in_dim:]
    w6, b6 = kb(6)
    w7, b7 = kb(7)
    heads = [p["Dense_8"], p["Dense_9"], p["Dense_10"]]
    wh = jnp.concatenate([h["kernel"] for h in heads], axis=1)
    bh = jnp.concatenate([h["bias"] for h in heads])
    wh = jnp.pad(wh, ((0, 0), (0, OUT_COLS - wh.shape[1])))
    bh = jnp.pad(bh, (0, OUT_COLS - bh.shape[0]))[None, :]

    n_pad = -(-n // ROW_TILE) * ROW_TILE
    # pad the embedding dim to a lane multiple: bf16 MXU operands want
    # tile-aligned contraction dims (K=84 fails with "Bad lhs type")
    in_p = -(-in_dim // 128) * 128
    emb_p = jnp.pad(emb, ((0, n_pad - n), (0, in_p - in_dim)))
    w0 = jnp.pad(w0, ((0, in_p - in_dim), (0, 0)))
    ws_in = jnp.pad(ws_in, ((0, in_p - in_dim), (0, 0)))
    in_dim = in_p
    weights = [w0, b0, w1, b1, w2, b2, w3, b3, w4, b4, ws_in, ws_h, b5,
               w6, b6, w7, b7, wh, bh]
    # hidden-layer kernels stream through the MXU in bf16; biases stay
    # f32 (accumulation is f32 throughout), and so does the packed
    # output-head kernel wh — matching the flax bf16 inference path,
    # whose heads are explicitly dtype=float32 (models/deform.py)
    weights = [w.astype(jnp.bfloat16) if (w.shape[0] > 1 and w is not wh)
               else w for w in weights]

    full = lambda shape: pl.BlockSpec(shape, lambda i: (0,) * len(shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        _kernel,
        grid=(n_pad // ROW_TILE,),
        in_specs=[pl.BlockSpec((ROW_TILE, in_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [full(w.shape) for w in weights],
        out_specs=pl.BlockSpec((ROW_TILE, OUT_COLS), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((n_pad, OUT_COLS), jnp.float32),
        interpret=interpret,
    )(emb_p, *weights)
    out = out[:n]
    return out[:, 0:3], out[:, 3:7], out[:, 7:10]
