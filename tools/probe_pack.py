#!/usr/bin/env python
"""Probe: Mosaic-supported in-kernel packs of a (f_pad, 128) gradient
block into a (f_pad, 128) buffer whose flat bytes are the row-major
(128, f_pad) transpose. Dev tool."""
import functools
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

F = int(sys.argv[1]) if len(sys.argv) > 1 else 16
Q = 128 // F  # lanes of obuf per X row-group


def want(gmat):
    # flat bytes of gmat^T (128, F) viewed as (F, 128)
    return gmat.T.reshape(F, 128)


def pack_strided(gmat):
    eye = jnp.eye(128, dtype=jnp.float32)
    x = jax.lax.dot_general(eye, gmat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.concatenate([x[q::Q] for q in range(Q)], axis=1)


def pack_matmul(gmat):
    eye = jnp.eye(128, dtype=jnp.float32)
    x = jax.lax.dot_general(eye, gmat, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    # S_q selects rows q::Q of x -> (F,F); E_q places at lanes [F*q, F*q+F)
    outs = []
    for q in range(Q):
        s = np.zeros((F, 128), np.float32)
        s[np.arange(F), np.arange(F) * Q + q] = 1.0
        e = np.zeros((F, 128), np.float32)
        e[np.arange(F), np.arange(F) + F * q] = 1.0
        t = jax.lax.dot_general(jnp.asarray(s), x, (((1,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
        outs.append(jax.lax.dot_general(t, jnp.asarray(e),
                                        (((1,), (0,)), ((), ())),
                                        preferred_element_type=jnp.float32))
    o = outs[0]
    for t in outs[1:]:
        o = o + t
    return o


def mk(pack):
    def kernel(x_ref, o_ref):
        o_ref[...] = pack(x_ref[...])
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec((F, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec((F, 128), lambda: (0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((F, 128), jnp.float32),
    )


rng = np.random.default_rng(0)
g = jnp.asarray(rng.normal(size=(F, 128)).astype(np.float32))
ref = np.asarray(want(g))

for name, pack in [("strided", pack_strided), ("matmul", pack_matmul)]:
    try:
        f = jax.jit(mk(pack))
        out = np.asarray(f(g))
        ok = np.allclose(out, ref)
        # crude timing: loop it inside a bigger kernel? just report compile ok
        print(f"{name}: compiles={True} correct={ok}")
    except Exception as e:  # noqa
        print(f"{name}: FAIL {type(e).__name__}: {str(e)[:300]}")
