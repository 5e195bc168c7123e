"""Row-masked Adam with torch-compatible semantics.

The reference holds two torch.optim.Adam instances (GAUSSIAN/FEATURE,
scene/gaussian_model.py:286-289, eps=1e-15) and performs optimizer-state
surgery on densify/prune (:457-635). Here optimizer state is just
arrays shaped like the fixed-capacity parameters, so "surgery" reduces
to masked writes handled by the densification ops — no special casing.

Update rule matches torch.optim.Adam exactly:
    m <- b1 m + (1-b1) g;  v <- b2 v + (1-b2) g^2
    p <- p - lr * (m / (1-b1^t)) / (sqrt(v / (1-b2^t)) + eps)
with one step count per tensor (new rows inherit it, as torch's
cat-based surgery does).
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    mu: jnp.ndarray
    nu: jnp.ndarray
    step: jnp.ndarray  # scalar int32


def adam_init(param: jnp.ndarray) -> AdamState:
    return AdamState(
        mu=jnp.zeros_like(param),
        nu=jnp.zeros_like(param),
        step=jnp.zeros((), jnp.int32),
    )


def adam_update(
    param: jnp.ndarray,
    grad: jnp.ndarray,
    state: AdamState,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
    row_mask: jnp.ndarray | None = None,
):
    """One Adam step. `row_mask` (bool, leading dim) freezes masked-out rows
    entirely (their m/v/params are untouched), the fixed-capacity
    equivalent of rows not being in the torch optimizer."""
    if row_mask is not None:
        m = row_mask.reshape((-1,) + (1,) * (grad.ndim - 1))
        grad = jnp.where(m, grad, 0.0)
    step = state.step + 1
    mu = b1 * state.mu + (1 - b1) * grad
    nu = b2 * state.nu + (1 - b2) * grad * grad
    t = step.astype(param.dtype)
    mu_hat = mu / (1 - b1**t)
    nu_hat = nu / (1 - b2**t)
    update = lr * mu_hat / (jnp.sqrt(nu_hat) + eps)
    if row_mask is not None:
        m = row_mask.reshape((-1,) + (1,) * (param.ndim - 1))
        new_param = jnp.where(m, param - update, param)
        mu = jnp.where(m, mu, state.mu)
        nu = jnp.where(m, nu, state.nu)
    else:
        new_param = param - update
    return new_param, AdamState(mu=mu, nu=nu, step=step)


def adam_update_tree(params, grads, states, lr, eps: float = 1e-15):
    """Adam over a pytree with a shared scalar lr (used for the deform MLP)."""
    flat_p, treedef = jax.tree_util.tree_flatten(params)
    flat_g = treedef.flatten_up_to(grads)
    flat_s = treedef.flatten_up_to(states)
    new_p, new_s = [], []
    for p, g, s in zip(flat_p, flat_g, flat_s):
        np_, ns_ = adam_update(p, g, s, lr, eps=eps)
        new_p.append(np_)
        new_s.append(ns_)
    return treedef.unflatten(new_p), treedef.unflatten(new_s)
