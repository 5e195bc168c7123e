"""Import reference PyTorch deformation checkpoints (`deform.pth`).

The reference saves `torch.save(deform.deform.state_dict(), ...)` at
`deform/iteration_N/deform.pth` (scene/deform_model.py:50-57); a user
switching from the reference brings those weights along. This maps the
state_dict onto our flax DeformNetwork (trase_tpu/models/deform.py):

- torch `nn.Linear` stores weight (out, in); flax kernel is (in, out)
  -> transpose.
- The reference's frequency embedding interleaves sin/cos per octave
  ([x | sin(f0)D | cos(f0)D | sin(f1)D | ...], utils/time_utils.py:
  44-52); ours is block-ordered ([x | all sins | all coses], a pure
  lane-relayout saving on TPU). The first Dense of the stack (and the
  skip Dense's input rows, and the blender timenet's first Dense)
  absorb the difference by a row permutation of their kernels.
- Layer name map (reference utils/time_utils.py:60-132 -> flax
  Dense_i in trace order): blender timenet.0/.2 come first when
  present, then linear.0..D-1, then gaussian_warp (or branch_w /
  branch_v when is_6dof), gaussian_rotation, gaussian_scaling.

Covers the standard DeformNetwork family (plain / blender / 6-DoF /
semantic feature input). torch is only needed to unpickle the .pth;
tensors are converted to numpy immediately.
"""
from __future__ import annotations

import numpy as np


def _embed_perm(d: int, f: int) -> np.ndarray:
    """perm[our_pos] = ref_pos for one frequency embedding block."""
    perm = np.zeros(d * (1 + 2 * f), np.int64)
    perm[:d] = np.arange(d)
    for k in range(f):
        for c in range(2):  # 0 = sin, 1 = cos
            for dd in range(d):
                ref = d + k * 2 * d + c * d + dd
                ours = d + c * f * d + k * d + dd
                perm[ours] = ref
    return perm


def _input_perm(multires: int, t_multires: int, is_blender: bool,
                feature_dim: int) -> np.ndarray:
    """Row permutation of the full MLP input [x_emb | t | (features)]."""
    px = _embed_perm(3, multires)
    parts = [px]
    off = len(px)
    if is_blender:
        parts.append(off + np.arange(30))  # timenet output: identity
        off += 30
    else:
        pt = _embed_perm(1, t_multires)
        parts.append(off + pt)
        off += len(pt)
    if feature_dim:
        parts.append(off + np.arange(feature_dim))
    return np.concatenate(parts)


def import_deform_state_dict(sd: dict, *, multires: int = 10,
                             t_multires: int = 10, depth: int = 8,
                             is_blender: bool = False,
                             is_6dof: bool = False,
                             feature_dim: int = 0) -> dict:
    """Reference DeformNetwork state_dict -> flax `{"params": ...}`."""
    def arr(k):
        v = sd[k]
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    def linear(prefix, row_perm=None):
        w = arr(f"{prefix}.weight").T  # (in, out)
        if row_perm is not None:
            w = w[row_perm]
        return {"kernel": w, "bias": arr(f"{prefix}.bias")}

    inp_perm = _input_perm(multires, t_multires, is_blender, feature_dim)
    in_ch = len(inp_perm)
    params = {}
    i = 0
    if is_blender:
        params[f"Dense_{i}"] = linear("timenet.0",
                                      _embed_perm(1, t_multires))
        i += 1
        params[f"Dense_{i}"] = linear("timenet.2")
        i += 1
    skip_at = depth // 2
    for layer in range(depth):
        name = f"linear.{layer}"
        if layer == 0:
            params[f"Dense_{i}"] = linear(name, inp_perm)
        elif layer == skip_at + 1:
            # skip layer input = [inp | h]: permute only the inp rows
            w = arr(f"{name}.weight").T
            perm = np.concatenate(
                [inp_perm, in_ch + np.arange(w.shape[0] - in_ch)])
            params[f"Dense_{i}"] = {"kernel": w[perm],
                                    "bias": arr(f"{name}.bias")}
        else:
            params[f"Dense_{i}"] = linear(name)
        i += 1
    heads = (["branch_w", "branch_v"] if is_6dof else ["gaussian_warp"])
    heads += ["gaussian_rotation", "gaussian_scaling"]
    for h in heads:
        params[f"Dense_{i}"] = linear(h)
        i += 1
    return {"params": params}


def import_deform_pth(path: str, *, model_type: str = "DeformNetwork",
                      is_blender: bool = False,
                      is_6dof: bool = False) -> dict:
    """Load a reference deform.pth -> payload for our deform.pkl."""
    import torch

    sd = torch.load(path, map_location="cpu", weights_only=True)
    t_multires = {"DeformNetwork": 6 if is_blender else 10,
                  "DeformStaticNetwork": 2,
                  "DeformDynamicNetwork": 32,
                  "DeformSemanticNetwork": 6 if is_blender else 10}[
                      model_type]
    feature_dim = 32 if model_type == "DeformSemanticNetwork" else 0
    variables = import_deform_state_dict(
        sd, t_multires=t_multires, is_blender=is_blender,
        is_6dof=is_6dof, feature_dim=feature_dim)
    return {"vars": variables, "type": model_type}


def _adam_state_for(opt_sd: dict | None, group_name: str, param,
                    n_expected: int):
    """torch.optim.Adam state_dict -> our AdamState(mu, nu, step) for
    the named param group; zeros when the state is absent (a param the
    reference never stepped has no entry)."""
    import jax.numpy as jnp

    from ..engine.optim import AdamState, adam_init

    if opt_sd is None:
        return adam_init(jnp.asarray(param))
    # param_groups[i]["params"] are integer ids into state{}
    for g in opt_sd.get("param_groups", []):
        if g.get("name") != group_name:
            continue
        for pid in g["params"]:
            st = opt_sd.get("state", {}).get(pid)
            if st is None:
                break

            def to_np(v):
                return np.asarray(v.detach().cpu().numpy()
                                  if hasattr(v, "detach") else v,
                                  np.float32)

            mu = to_np(st["exp_avg"])
            nu = to_np(st["exp_avg_sq"])
            if mu.shape[0] != n_expected:
                break
            # our layout may differ from torch's (gaussian_features is
            # (n,32) here vs the reference's (n,1,32) param) — momenta
            # must match the param shape exactly or adam_update
            # broadcasts (n,1,32)x(n,32) into (n,n,32)
            shape = np.asarray(param).shape
            if mu.size != int(np.prod(shape)):
                break
            mu = mu.reshape(shape)
            nu = nu.reshape(shape)
            step = st.get("step", 0)
            step = int(step.item() if hasattr(step, "item") else step)
            return AdamState(mu=jnp.asarray(mu), nu=jnp.asarray(nu),
                             step=jnp.asarray(step, jnp.int32))
    return adam_init(jnp.asarray(param))


def import_gaussian_capture(model_args, *, capacity: int | None = None):
    """Reference ``gaussians.capture()`` 13-tuple -> (params, aux, opt,
    meta) in our fixed-capacity layout (scene/gaussian_model.py:106-140).

    The reference's own ``capture`` predates its dual-optimizer refactor
    (``self.optimizer`` is a {"GAUSSIAN","FEATURE"} dict at
    scene/gaussian_model.py:286-289, so ``.state_dict()`` raises) — we
    accept all three shapes that exist in the wild: a single torch Adam
    state_dict (upstream Deformable-3DGS checkpoints), a dict of two
    state_dicts, or None.
    """
    import jax.numpy as jnp

    from ..models import gaussians as G

    (active_sh_degree, xyz, f_dc, f_rest, scaling, rotation, opacity,
     gaussian_features, max_radii2d, xyz_grad_accum, denom, opt_sd,
     spatial_lr_scale) = model_args

    def to_np(v):
        return np.asarray(v.detach().cpu().numpy()
                          if hasattr(v, "detach") else v, np.float32)

    xyz = to_np(xyz)
    n = xyz.shape[0]
    feats = to_np(gaussian_features).reshape(n, -1)
    params = G.GaussianParams(
        xyz=jnp.asarray(xyz),
        features_dc=jnp.asarray(to_np(f_dc)),
        features_rest=jnp.asarray(to_np(f_rest)),
        scaling=jnp.asarray(to_np(scaling)),
        rotation=jnp.asarray(to_np(rotation)),
        opacity=jnp.asarray(to_np(opacity)),
        gaussian_features=jnp.asarray(feats),
        cluster_id=jnp.full((n, 1), -1.0, jnp.float32),
    )
    aux = G.GaussianAux(
        alive=jnp.ones((n,), bool),
        max_radii2d=jnp.asarray(to_np(max_radii2d).reshape(n)),
        xyz_gradient_accum=jnp.asarray(to_np(xyz_grad_accum).reshape(n)),
        denom=jnp.asarray(to_np(denom).reshape(n)),
    )
    # normalize the three optimizer shapes to {group_name: state_dict}
    g_sd = f_sd = None
    if isinstance(opt_sd, dict):
        if "GAUSSIAN" in opt_sd or "FEATURE" in opt_sd:
            g_sd, f_sd = opt_sd.get("GAUSSIAN"), opt_sd.get("FEATURE")
        elif "param_groups" in opt_sd:
            g_sd = f_sd = opt_sd
    opt = G.GaussianOptState(
        xyz=_adam_state_for(g_sd, "xyz", params.xyz, n),
        features_dc=_adam_state_for(g_sd, "f_dc", params.features_dc, n),
        features_rest=_adam_state_for(g_sd, "f_rest",
                                      params.features_rest, n),
        scaling=_adam_state_for(g_sd, "scaling", params.scaling, n),
        rotation=_adam_state_for(g_sd, "rotation", params.rotation, n),
        opacity=_adam_state_for(g_sd, "opacity", params.opacity, n),
        gaussian_features=_adam_state_for(
            f_sd, "gaussian_feats", params.gaussian_features, n),
    )
    if capacity is None:
        capacity = max(int(2 ** np.ceil(np.log2(max(n * 2, 1024)))), 1024)
    if capacity > n:
        params, aux, opt = G.grow_capacity(params, aux, opt, capacity)
    meta = {
        "active_sh_degree": int(active_sh_degree),
        "spatial_lr_scale": float(spatial_lr_scale),
        "n_alive": n,
    }
    return params, aux, opt, meta


def import_chkpnt_pth(path: str, *, capacity: int | None = None):
    """Load a reference ``chkpnt<N>.pth`` — ``torch.save((capture(),
    iteration), ...)`` at train.py:396 — into our state layout."""
    import torch

    payload = torch.load(path, map_location="cpu", weights_only=False)
    model_args, iteration = payload
    params, aux, opt, meta = import_gaussian_capture(
        model_args, capacity=capacity)
    meta["iteration"] = int(iteration)
    return params, aux, opt, meta


def main(argv=None):
    import argparse
    import os
    import pickle

    ap = argparse.ArgumentParser(
        description="Convert reference torch checkpoints "
                    "(deform.pth / chkpntN.pth) to our formats")
    ap.add_argument("--input", "-i", required=True)
    ap.add_argument("--output", "-o", required=True)
    ap.add_argument("--kind", choices=["deform", "chkpnt"],
                    default="deform")
    ap.add_argument("--model_type", default="DeformNetwork")
    ap.add_argument("--is_blender", action="store_true")
    ap.add_argument("--is_6dof", action="store_true")
    args = ap.parse_args(argv)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    if args.kind == "chkpnt":
        params, aux, opt, meta = import_chkpnt_pth(args.input)
        with open(args.output, "wb") as f:
            pickle.dump({"params": params, "aux": aux, "opt": opt,
                         "meta": meta}, f)
        print(f"{args.input} -> {args.output} "
              f"(iteration {meta['iteration']}, {meta['n_alive']} "
              f"gaussians, sh_degree {meta['active_sh_degree']})")
        return
    payload = import_deform_pth(args.input, model_type=args.model_type,
                                is_blender=args.is_blender,
                                is_6dof=args.is_6dof)
    with open(args.output, "wb") as f:
        pickle.dump(payload, f)
    n = sum(v.size for p in payload["vars"]["params"].values()
            for v in p.values())
    print(f"{args.input} -> {args.output} ({n} params)")


if __name__ == "__main__":
    main()
