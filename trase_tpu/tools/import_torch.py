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


def main(argv=None):
    import argparse
    import os
    import pickle

    ap = argparse.ArgumentParser(
        description="Convert a reference deform.pth to deform.pkl")
    ap.add_argument("--input", "-i", required=True)
    ap.add_argument("--output", "-o", required=True)
    ap.add_argument("--model_type", default="DeformNetwork")
    ap.add_argument("--is_blender", action="store_true")
    ap.add_argument("--is_6dof", action="store_true")
    args = ap.parse_args(argv)
    payload = import_deform_pth(args.input, model_type=args.model_type,
                                is_blender=args.is_blender,
                                is_6dof=args.is_6dof)
    os.makedirs(os.path.dirname(args.output) or ".", exist_ok=True)
    with open(args.output, "wb") as f:
        pickle.dump(payload, f)
    n = sum(v.size for p in payload["vars"]["params"].values()
            for v in p.values())
    print(f"{args.input} -> {args.output} ({n} params)")


if __name__ == "__main__":
    main()
