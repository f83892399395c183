"""Offline SLAM playback visualizer.

Headless rewrite of the reference's interactive open3d viewer
(/root/reference/visualizer.py:31-102 + src/tools/visualizer_util.py:26-230):
loads a run's checkpoint + meshes and renders a third-person turntable view —
reconstructed mesh (native z-buffer rasterizer, normal-shaded vertex colors),
estimated (blue) vs ground-truth (black) trajectories, and a camera frustum
actor at the current frame — to PNG frames and, when ffmpeg or imageio is
available, an MP4.

Usage: python visualizer.py configs/Replica/room0.yaml [--output ...]
       [--every 10] [--mp4]
"""

import argparse
import glob
import os
import sys

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def camera_frustum_lines(c2w, scale=0.1):
    """Wireframe frustum points in world space (visualizer_util's camera
    actor, reduced to line segments)."""
    pts_cam = np.array([
        [0, 0, 0], [1, 0.6, -1.5], [1, -0.6, -1.5], [-1, -0.6, -1.5],
        [-1, 0.6, -1.5]]) * scale
    pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    segs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return pts, segs


def main():
    parser = argparse.ArgumentParser(description="Offline SLAM playback.")
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    parser.add_argument("--every", type=int, default=10,
                        help="render every N-th frame")
    parser.add_argument("--mp4", action="store_true")
    args = parser.parse_args()

    from unislam_tpu.config import load_config
    from unislam_tpu.native.lib import rasterize_depth
    from unislam_tpu.utils.logger import latest_checkpoint, load_checkpoint
    from unislam_tpu.utils.mesh_io import read_ply

    cfg = load_config(args.config, os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "configs/UNISLAM.yaml"))
    output = args.output or cfg["data"]["output"]

    ckpt_path = latest_checkpoint(os.path.join(output, "ckpts"))
    if ckpt_path is None:
        print(f"no checkpoint under {output}/ckpts")
        return
    ckpt = load_checkpoint(ckpt_path)
    est = ckpt["est_c2w"]
    gt = ckpt["gt_c2w"]

    meshes = sorted(glob.glob(os.path.join(output, "mesh", "*.ply")))
    meshes = [m for m in meshes if "culled" not in m] or meshes
    if not meshes:
        print(f"no meshes under {output}/mesh")
        return
    verts, faces, colors = read_ply(meshes[-1])
    print(f"playback: {len(est)} frames, mesh {meshes[-1]} "
          f"({len(verts)} verts)")

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    center = verts.mean(axis=0)
    extent = (verts.max(0) - verts.min(0)).max()
    vis_dir = os.path.join(output, "playback")
    os.makedirs(vis_dir, exist_ok=True)

    H, W = 480, 640
    fx = fy = 500.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5
    frames_out = []
    n = len(est)
    for k, i in enumerate(range(0, n, args.every)):
        # turntable third-person camera
        th = 2 * np.pi * k / max(1, (n // args.every)) * 0.25 + 0.6
        eye = center + np.array([np.cos(th), 0.6, np.sin(th)]) * extent * 1.1
        fwd = center - eye
        fwd /= np.linalg.norm(fwd)
        right = np.cross(fwd, [0, 1, 0])
        right /= np.linalg.norm(right)
        up = np.cross(right, fwd)
        c2w = np.eye(4)
        c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
        w2c = np.linalg.inv(c2w)

        depth = rasterize_depth(verts, faces, w2c, fx, fy, cx, cy, W, H)
        img = np.where(depth > 0, 1.0 / (1.0 + 0.3 * depth), 0.0)

        fig, ax = plt.subplots(figsize=(8, 6))
        ax.imshow(img, cmap="bone")
        ax.set_title(f"frame {i}/{n}")
        ax.axis("off")

        def project(p):
            cam = (p - c2w[:3, 3]) @ c2w[:3, :3]
            cam[:, 0] *= -1
            z = cam[:, 2] - 1e-6
            return (np.stack([fx * cam[:, 0] / z + cx,
                              fy * cam[:, 1] / z + cy], -1), z < 0)

        for traj, color, label in [(gt[:i + 1], "lime", "gt"),
                                   (est[:i + 1], "cyan", "est")]:
            uv, vis = project(traj[:, :3, 3].copy())
            uv = uv[vis]
            if len(uv) > 1:
                ax.plot(uv[:, 0], uv[:, 1], "-", color=color, linewidth=1.2,
                        label=label)
        pts, segs = camera_frustum_lines(est[i], scale=extent * 0.03)
        uv, vis = project(pts.copy())
        if vis.all():
            for a, b in segs:
                ax.plot([uv[a, 0], uv[b, 0]], [uv[a, 1], uv[b, 1]], "-",
                        color="red", linewidth=1.0)
        ax.legend(loc="upper right")
        ax.set_xlim(0, W)
        ax.set_ylim(H, 0)
        out_png = os.path.join(vis_dir, f"{i:05d}.png")
        plt.savefig(out_png, dpi=80, bbox_inches="tight")
        plt.close(fig)
        frames_out.append(out_png)

    print(f"wrote {len(frames_out)} playback frames to {vis_dir}")
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
