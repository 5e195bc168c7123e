#!/usr/bin/env python
"""Headless interactive viewer CLI — the GUI replacement.

The reference ships dearpygui apps (gui.py / gui_standalone.py); this
environment has no display, so the same capabilities are exposed as a
REPL over trase_tpu.viewer.HeadlessViewer (standalone: only needs
point_cloud.ply + deform.pkl, like gui_standalone.py).

Commands:
  render [mode]          render current view; writes frame to --out dir
  mode <name>            Render | Rendered Features | Gaussian Features
                         | Gaussian Clusters | Segmentation
                         | Point Cloud | Depth
  orbit <dx> <dy>        rotate (pixels of drag, gui sensitivity)
  zoom <delta>           radius *= 1.1^-delta
  pan <dx> <dy>          pan the target point
  time <fid>             set the normalized timestamp [0, 1]
  cluster [kmeans [K]]   run HDBSCAN (or k-means) and save clusters.pt
  click <px> <py>        select the cluster under a pixel
  text <prompt>          Grounded-SAM text selection (when available)
  textmask <png>         text selection from a precomputed 2D mask
  threshold <t>          cosine score threshold for selection
  clear                  clear selection
  remove                 render with the selected object removed
  save_object [path]     write point_cloud_object.ply of the selection
  save_rest [path]       write point_cloud_wo_object.ply
  load_object <ply>      load an extracted object for composition
  compose [s dx dy dz rx ry rz]
                         composite the object (rescale/translate/rotate)
                         with this model in one rasterization
  fps                    print last frame time / FPS
  trajectory [T [M]]     toggle the gaussian-motion overlay: track M
                         FPS-sampled gaussians over the last T frames
                         (reference 'Visualize Trajectory',
                         gui.py:1154-1191)
  quit
"""
from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main(argv=None):
    from trase_tpu.viewer import MODES, HeadlessViewer
    from trase_tpu.viz import save_image

    ap = argparse.ArgumentParser()
    ap.add_argument("--model_path", "-m", required=True)
    ap.add_argument("--iteration", type=int, default=-1)
    ap.add_argument("--model_type", default="DeformNetwork")
    ap.add_argument("--is_blender", action="store_true")
    ap.add_argument("--is_6dof", action="store_true")
    ap.add_argument("--sh_degree", type=int, default=3)
    ap.add_argument("--W", type=int, default=800)
    ap.add_argument("--H", type=int, default=800)
    ap.add_argument("--radius", type=float, default=2.0)
    ap.add_argument("--white_background", action="store_true")
    ap.add_argument("--out", default=None,
                    help="frame output dir (default <model>/viewer)")
    ap.add_argument("--script", default=None,
                    help="file of commands to run instead of stdin")
    ap.add_argument("--serve", type=int, default=None, metavar="PORT",
                    help="serve the browser GUI on this port instead of "
                         "the REPL (see trase_tpu/viewer_web.py)")
    ap.add_argument("--host", default="127.0.0.1")
    args = ap.parse_args(argv)

    v = HeadlessViewer.from_model_path(
        args.model_path, iteration=args.iteration,
        model_type=args.model_type, is_blender=args.is_blender,
        is_6dof=args.is_6dof, sh_degree=args.sh_degree, W=args.W, H=args.H,
        radius=args.radius, white_background=args.white_background)

    if args.serve is not None:
        from trase_tpu.viewer_web import ViewerServer

        ViewerServer(v).serve(port=args.serve, host=args.host)
        return
    out_dir = args.out or os.path.join(args.model_path, "viewer")
    os.makedirs(out_dir, exist_ok=True)
    frame_idx = 0

    def do_render(mode=None, removal=False):
        nonlocal frame_idx
        img = v.render_frame(mode, apply_selection_removal=removal)
        path = os.path.join(out_dir, f"frame_{frame_idx:04d}.png")
        save_image(path, img)
        frame_idx += 1
        print(f"{v.last_frame_ms:.1f} ms ({v.fps:.1f} FPS) -> {path}")

    if args.script:
        lines = open(args.script).read().splitlines()
    else:
        print(f"loaded iteration {v.loaded_iter}; modes: {', '.join(MODES)}")
        lines = None

    def input_iter():
        if lines is not None:
            yield from lines
        else:
            while True:
                try:
                    yield input("viewer> ")
                except EOFError:
                    return

    for line in input_iter():
        toks = line.strip().split()
        if not toks or toks[0].startswith("#"):
            continue
        cmd, rest = toks[0], toks[1:]
        try:
            if cmd == "quit":
                break
            elif cmd == "render":
                do_render(" ".join(rest) if rest else None)
            elif cmd == "mode":
                v.mode = " ".join(rest)
            elif cmd == "orbit":
                v.cam.orbit(float(rest[0]), float(rest[1]))
            elif cmd == "zoom":
                v.cam.scale(float(rest[0]))
            elif cmd == "pan":
                v.cam.pan(float(rest[0]), float(rest[1]))
            elif cmd == "time":
                v.fid = float(rest[0])
            elif cmd == "cluster":
                use_km = rest and rest[0] == "kmeans"
                k = int(rest[1]) if len(rest) > 1 else 64
                n = v.cluster(kmeans=use_km, k=k)
                print(f"{n} clusters")
            elif cmd == "click":
                cid = v.click_select(float(rest[0]), float(rest[1]))
                print(f"selected cluster {cid}; "
                      f"selection = {v.selected_clusters}")
            elif cmd == "text":
                print("clusters:", v.text_select(" ".join(rest)))
            elif cmd == "textmask":
                from PIL import Image

                with Image.open(rest[0]) as im:
                    m = np.asarray(im.convert("L")) > 127
                print("clusters:", v.text_select(mask2d=m))
            elif cmd == "threshold":
                v.score_threshold = float(rest[0])
                v._recompute_mask()
            elif cmd == "clear":
                v.clear_selection()
            elif cmd == "remove":
                do_render(removal=True)
            elif cmd == "save_object":
                print("->", v.save_object(rest[0] if rest else None))
            elif cmd == "save_rest":
                print("->", v.save_without_object(rest[0] if rest else None))
            elif cmd == "load_object":
                print(f"{v.load_object(rest[0])} gaussians loaded")
            elif cmd == "compose":
                vals = [float(x) for x in rest] + [0.0] * 7
                img = v.render_composite_frame(
                    scales_bias=vals[0] if rest else 1.0,
                    motion_bias=tuple(vals[1:4]),
                    rotation_bias=tuple(vals[4:7]))
                nonlocal_path = os.path.join(out_dir,
                                             f"frame_{frame_idx:04d}.png")
                save_image(nonlocal_path, img)
                frame_idx += 1
                print(f"{v.last_frame_ms:.1f} ms -> {nonlocal_path}")
            elif cmd == "fps":
                print(f"{v.last_frame_ms:.1f} ms ({v.fps:.1f} FPS)")
            elif cmd == "trajectory":
                on = v.toggle_trajectory(
                    samp_num=int(rest[0]) if rest else 32,
                    gs_num=int(rest[1]) if len(rest) > 1 else 512)
                print(f"trajectory overlay {'on' if on else 'off'}")
            else:
                print(f"unknown command {cmd!r}")
        except Exception as e:  # noqa: BLE001 — REPL resilience
            print(f"error: {e}")


if __name__ == "__main__":
    main()
