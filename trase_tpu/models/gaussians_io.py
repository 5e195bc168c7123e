"""Gaussian snapshot I/O: the reference's PLY layout + checkpoints.

PLY layout contract (scene/gaussian_model.py:317-376, load:388-455):
properties x,y,z, nx,ny,nz (zeros), f_dc_{0..2}, f_rest_{0..3*R-1}
(channel-major: all coeffs of channel 0, then channel 1, ...), opacity,
scale_{0..2}, rot_{0..3}, gaussian_feats_{0..31}, optional cls.
Values are RAW (pre-activation) parameters.
"""
from __future__ import annotations

import os
import pickle

import jax.numpy as jnp
import numpy as np

from ..data.ply import read_ply, write_ply
from . import gaussians as G


def save_gaussian_ply(
    path: str,
    params: G.GaussianParams,
    alive: np.ndarray | jnp.ndarray,
    mask: np.ndarray | None = None,
    smoothed_features: np.ndarray | None = None,
    with_cluster_ids: bool = False,
):
    """Write alive (optionally masked) gaussians in the reference layout."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    keep = np.asarray(alive)
    if mask is not None:
        keep = keep & np.asarray(mask)

    xyz = np.asarray(params.xyz)[keep]
    n = xyz.shape[0]
    f_dc = np.asarray(params.features_dc)[keep]  # (n, 1, 3)
    f_rest = np.asarray(params.features_rest)[keep]  # (n, R, 3)
    opacity = np.asarray(params.opacity)[keep]
    scale = np.asarray(params.scaling)[keep]
    rot = np.asarray(params.rotation)[keep]
    if smoothed_features is not None:
        feats = np.asarray(smoothed_features)[keep]
    else:
        feats = np.asarray(params.gaussian_features)[keep]

    props: dict[str, np.ndarray] = {
        "x": xyz[:, 0], "y": xyz[:, 1], "z": xyz[:, 2],
        "nx": np.zeros(n, np.float32),
        "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    # channel-major: transpose (n, R, 3) -> (n, 3, R) then flatten
    dc_t = f_dc.transpose(0, 2, 1).reshape(n, -1)
    for i in range(dc_t.shape[1]):
        props[f"f_dc_{i}"] = dc_t[:, i]
    rest_t = f_rest.transpose(0, 2, 1).reshape(n, -1)
    for i in range(rest_t.shape[1]):
        props[f"f_rest_{i}"] = rest_t[:, i]
    props["opacity"] = opacity[:, 0]
    for i in range(3):
        props[f"scale_{i}"] = scale[:, i]
    for i in range(4):
        props[f"rot_{i}"] = rot[:, i]
    for i in range(feats.shape[1]):
        props[f"gaussian_feats_{i}"] = feats[:, i]
    if with_cluster_ids:
        props["cls"] = np.asarray(params.cluster_id)[keep][:, 0]
    write_ply(path, {k: np.asarray(v, np.float32) if k != "cls" else v
                     for k, v in props.items()})


def load_gaussian_ply(path: str, sh_degree: int = 3,
                      capacity: int | None = None,
                      feature_dim: int = G.FEATURE_DIM):
    """Load a snapshot into a fresh fixed-capacity field. Also accepts
    gaussian-grouping style `obj_dc_*` feature names and missing features
    (random init), like the reference loader (:429-443).

    Returns (params, aux, n, has_cluster_ids).
    """
    props = read_ply(path)
    n = len(props["x"])
    xyz = np.stack([props["x"], props["y"], props["z"]], axis=1)

    f_dc = np.stack([props[f"f_dc_{i}"] for i in range(3)], axis=1)  # (n,3)
    rest_names = sorted(
        (k for k in props if k.startswith("f_rest_")),
        key=lambda s: int(s.split("_")[-1]),
    )
    # infer the actual SH degree from the file (a snapshot trained at a
    # lower degree is still loadable; callers get the real degree back)
    r_file = len(rest_names) // 3
    deg_file = int(round(np.sqrt(r_file + 1))) - 1
    if (deg_file + 1) ** 2 - 1 == r_file and deg_file != sh_degree:
        sh_degree = deg_file
    r = (sh_degree + 1) ** 2 - 1
    assert len(rest_names) == 3 * r, (len(rest_names), r)
    rest = np.stack([props[k] for k in rest_names], axis=1)  # (n, 3r)
    rest = rest.reshape(n, 3, r).transpose(0, 2, 1)  # (n, r, 3)

    scales = np.stack([props[f"scale_{i}"] for i in range(3)], axis=1)
    rots = np.stack([props[f"rot_{i}"] for i in range(4)], axis=1)
    opacity = props["opacity"][:, None]

    feats = np.zeros((n, feature_dim), np.float32)
    got = False
    for prefix in ("gaussian_feats_", "obj_dc_"):
        if f"{prefix}0" in props:
            for i in range(feature_dim):
                key = f"{prefix}{i}"
                if key in props:
                    feats[:, i] = props[key]
            got = True
            break
    if not got:
        feats = np.random.randn(n, feature_dim).astype(np.float32)

    has_cls = "cls" in props

    if capacity is None:
        capacity = max(int(2 ** np.ceil(np.log2(max(n * 2, 1024)))), 1024)
    params = G.empty_params(capacity, sh_degree)
    aux = G.empty_aux(capacity)
    params = params._replace(
        xyz=params.xyz.at[:n].set(jnp.asarray(xyz, jnp.float32)),
        features_dc=params.features_dc.at[:n].set(
            jnp.asarray(f_dc[:, None, :], jnp.float32)
        ),
        features_rest=params.features_rest.at[:n].set(
            jnp.asarray(rest, jnp.float32)
        ),
        scaling=params.scaling.at[:n].set(jnp.asarray(scales, jnp.float32)),
        rotation=params.rotation.at[:n].set(jnp.asarray(rots, jnp.float32)),
        opacity=params.opacity.at[:n].set(jnp.asarray(opacity, jnp.float32)),
        gaussian_features=params.gaussian_features.at[:n].set(
            jnp.asarray(feats, jnp.float32)
        ),
    )
    if has_cls:
        params = params._replace(
            cluster_id=params.cluster_id.at[:n].set(
                jnp.asarray(props["cls"][:, None], jnp.float32)
            )
        )
    aux = aux._replace(alive=aux.alive.at[:n].set(True))
    return params, aux, n, has_cls


def save_checkpoint(path: str, payload: dict):
    """Full training checkpoint (params + optimizer + deform + step), the
    analogue of chkpntN.pth via capture() (scene/gaussian_model.py:106-121).
    Stored as a pickle of numpy pytrees."""
    import jax

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    np_payload = jax.tree_util.tree_map(
        lambda x: np.asarray(x) if hasattr(x, "shape") else x, payload
    )
    with open(path, "wb") as f:
        pickle.dump(np_payload, f)


def load_checkpoint(path: str) -> dict:
    with open(path, "rb") as f:
        return pickle.load(f)
