"""SLAM map observability: live follower + offline playback.

Headless rewrite of the reference's interactive open3d viewer
(/root/reference/visualizer.py:31-102 + src/tools/visualizer_util.py:26-230).
TPU hosts have no display, so instead of a GUI process fed by an mp.Queue
this renders third-person views (native z-buffer rasterizer — no GL) in
three modes:

  playback     (default) post-hoc turntable over the run's trajectory with
               the final mesh.
  --incremental  playback where each frame shows the mesh snapshot that
               existed at that point of the run (map evolution; requires
               `mapping.mesh_freq` snapshots).
  --live       follow a RUNNING run: poll `<output>/live.json` (written by
               the runtime every frame) and render the newest mesh +
               trajectory as they grow, like the reference's live viewer.
  --web        serve an INTERACTIVE WebGL viewer over HTTP (orbit camera,
               live mesh + trajectory + camera-frustum actors, snapshot
               scrubber) — the full GUI equivalent, usable from any
               browser via an SSH port-forward. See utils/webviewer.py.

Usage: python visualizer.py configs/Replica/room0.yaml [--output ...]
       [--every 10] [--mp4] [--incremental | --live [--poll 2.0]
        | --web [--port 8090]]
"""

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    parser = argparse.ArgumentParser(description="SLAM playback / live view.")
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--every", type=int, default=10,
                        help="render every N-th frame")
    parser.add_argument("--mp4", action="store_true")
    parser.add_argument("--incremental", action="store_true",
                        help="playback with per-frame mesh snapshots")
    parser.add_argument("--live", action="store_true",
                        help="follow a running run via live.json")
    parser.add_argument("--poll", type=float, default=2.0,
                        help="--live poll interval (s)")
    parser.add_argument("--web", action="store_true",
                        help="serve the interactive WebGL viewer over HTTP")
    parser.add_argument("--port", type=int, default=8090)
    parser.add_argument("--host", type=str, default="127.0.0.1")
    args = parser.parse_args()

    from unislam_tpu.config import load_config
    from unislam_tpu.utils import playback
    from unislam_tpu.utils.logger import latest_checkpoint, load_checkpoint
    from unislam_tpu.utils.mesh_io import read_ply

    cfg = load_config(args.config, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "configs/UNISLAM.yaml"))
    output = args.output or cfg["data"]["output"]
    mesh_dir = os.path.join(output, "mesh")

    if args.web:
        from unislam_tpu.utils import webviewer
        webviewer.serve(output, port=args.port, host=args.host)
        return

    if args.live:
        pngs = playback.follow_live(output, poll_s=args.poll)
        print(f"live view ended: {len(pngs)} frames under "
              f"{output}/live_view")
        _maybe_mp4(args, os.path.join(output, "live_view"), pngs)
        return

    ckpt_path = latest_checkpoint(os.path.join(output, "ckpts"))
    if ckpt_path is None:
        print(f"no checkpoint under {output}/ckpts")
        return
    ckpt = load_checkpoint(ckpt_path)
    est = ckpt["est_c2w"]
    gt = ckpt["gt_c2w"]

    final_mesh = playback.newest_mesh(mesh_dir)
    if final_mesh is None:
        print(f"no meshes under {mesh_dir}")
        return
    verts, faces, _ = read_ply(final_mesh)
    print(f"playback: {len(est)} frames, mesh {final_mesh} "
          f"({len(verts)} verts)"
          + (" [incremental snapshots]" if args.incremental else ""))

    vis_dir = os.path.join(output, "playback")
    os.makedirs(vis_dir, exist_ok=True)
    frames_out = []
    n = len(est)
    cur_mesh = final_mesh
    for k, i in enumerate(range(0, n, args.every)):
        if args.incremental:
            snap = playback.mesh_snapshot_for_frame(mesh_dir, i)
            if snap and snap != cur_mesh:
                verts, faces, _ = read_ply(snap)
                cur_mesh = snap
        th = 2 * np.pi * k / max(1, (n // args.every)) * 0.25 + 0.6
        out_png = os.path.join(vis_dir, f"{i:05d}.png")
        playback.render_view(out_png, verts, faces, est[:i + 1, :3, 3],
                             gt[:i + 1, :3, 3], est[i], i, n, theta=th)
        frames_out.append(out_png)

    print(f"wrote {len(frames_out)} playback frames to {vis_dir}")
    _maybe_mp4(args, vis_dir, frames_out)


def _maybe_mp4(args, vis_dir, frames_out):
    if args.mp4 and frames_out:
        try:
            import imageio.v2 as imageio
            with imageio.get_writer(os.path.join(vis_dir, "playback.mp4"),
                                    fps=10) as w:
                for p in frames_out:
                    w.append_data(imageio.imread(p))
            print(f"wrote {vis_dir}/playback.mp4")
        except Exception as e:
            print(f"mp4 export unavailable ({e}); PNG frames kept")


if __name__ == "__main__":
    main()
