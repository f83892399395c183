"""Headless map-evolution observability: live state feed + playback renders.

The reference streams incremental meshes and camera poses from the mapper to
an interactive open3d GUI over an mp.Queue
(/root/reference/src/tools/visualizer_util.py:26-230,
/root/reference/visualizer.py:31-102). TPU hosts are headless, so the
TPU-native equivalent is file-based: the runtime appends an atomically
written `live.json` (current frame, trajectories-so-far, newest mesh
snapshot path) after every frame, and exports mesh snapshots at
`mapping.mesh_freq`; any process — `visualizer.py --live`, a notebook, a
dashboard — can poll it and render the evolving map without touching the
run. Rendering uses the native z-buffer rasterizer (no GPU/GL needed).
"""

from __future__ import annotations

import json
import os
import time

import numpy as np


# ---------------------------------------------------------------------------
# live state feed (writer side, called by the runtime)
# ---------------------------------------------------------------------------

def write_live_state(output: str, idx: int, n_img: int,
                     est_c2w: np.ndarray, gt_c2w: np.ndarray,
                     mesh_dir: str | None = None):
    """Atomically write `<output>/live.json` describing run progress.

    Kept small: trajectories are stored as (N, 3) translations plus the
    current frame's full pose (what the GUI's camera actor needs). Readers
    never see a torn file (write-to-tmp + rename).
    """
    mesh = newest_mesh(mesh_dir or os.path.join(output, "mesh"))
    state = {
        "frame": int(idx),
        "n_img": int(n_img),
        "timestamp": time.time(),
        "est_t": np.asarray(est_c2w[:idx + 1, :3, 3], np.float64
                            ).round(5).tolist(),
        "gt_t": np.asarray(gt_c2w[:idx + 1, :3, 3], np.float64
                           ).round(5).tolist(),
        "cur_c2w": np.asarray(est_c2w[idx], np.float64).tolist(),
        "mesh": mesh,
        "done": bool(idx == n_img - 1),
    }
    path = os.path.join(output, "live.json")
    tmp = path + ".tmp"
    with open(tmp, "w") as f:
        json.dump(state, f)
    os.replace(tmp, path)
    return path


def read_live_state(output: str):
    """Read `<output>/live.json`; returns None if absent/unreadable."""
    path = os.path.join(output, "live.json")
    try:
        with open(path) as f:
            return json.load(f)
    except (OSError, json.JSONDecodeError):
        return None


def newest_mesh(mesh_dir: str):
    """Most recent non-culled mesh snapshot path in `mesh_dir`, or None."""
    import glob
    if not os.path.isdir(mesh_dir):
        return None
    meshes = sorted(glob.glob(os.path.join(mesh_dir, "*.ply")))
    meshes = [m for m in meshes if "culled" not in m]
    return meshes[-1] if meshes else None


def mesh_snapshot_for_frame(mesh_dir: str, frame: int):
    """The mesh snapshot taken at the latest mapping <= `frame` (snapshots
    are named `<idx:05d>_mesh.ply` by the runtime); falls back to the
    newest mesh when none precede `frame`."""
    import glob
    best, best_idx = None, -1
    for m in sorted(glob.glob(os.path.join(mesh_dir, "*_mesh.ply"))):
        if "culled" in m:
            continue
        try:
            idx = int(os.path.basename(m).split("_")[0])
        except ValueError:
            continue
        if best_idx < idx <= frame:
            best, best_idx = m, idx
    return best or newest_mesh(mesh_dir)


# ---------------------------------------------------------------------------
# third-person render (native rasterizer + matplotlib overlay)
# ---------------------------------------------------------------------------

def camera_frustum_lines(c2w, scale=0.1):
    """Wireframe frustum points in world space (visualizer_util's camera
    actor, reduced to line segments)."""
    pts_cam = np.array([
        [0, 0, 0], [1, 0.6, -1.5], [1, -0.6, -1.5], [-1, -0.6, -1.5],
        [-1, 0.6, -1.5]]) * scale
    pts = pts_cam @ c2w[:3, :3].T + c2w[:3, 3]
    segs = [(0, 1), (0, 2), (0, 3), (0, 4), (1, 2), (2, 3), (3, 4), (4, 1)]
    return pts, segs


def third_person_pose(center, extent, theta):
    """Turntable camera c2w looking at `center` from angle `theta`."""
    eye = center + np.array([np.cos(theta), 0.6, np.sin(theta)]) * extent * 1.1
    fwd = center - eye
    fwd /= np.linalg.norm(fwd)
    right = np.cross(fwd, [0, 1, 0])
    right /= np.linalg.norm(right)
    up = np.cross(right, fwd)
    c2w = np.eye(4)
    c2w[:3, 0], c2w[:3, 1], c2w[:3, 2], c2w[:3, 3] = right, up, -fwd, eye
    return c2w


def render_view(out_png: str, verts, faces, est_traj, gt_traj, cur_c2w,
                frame: int, n_img: int, theta: float = 0.6,
                H: int = 480, W: int = 640):
    """Render one third-person view: mesh depth shading + est/gt trajectory
    polylines + current-camera frustum. Pure CPU (native rasterizer)."""
    from unislam_tpu.native.lib import rasterize_depth

    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    center = verts.mean(axis=0)
    extent = max((verts.max(0) - verts.min(0)).max(), 1e-3)
    c2w = third_person_pose(center, extent, theta)
    w2c = np.linalg.inv(c2w)
    fx = fy = 500.0
    cx, cy = W / 2 - 0.5, H / 2 - 0.5

    depth = rasterize_depth(verts.astype(np.float32),
                            faces.astype(np.int32),
                            w2c.astype(np.float32), fx, fy, cx, cy, W, H)
    img = np.where(depth > 0, 1.0 / (1.0 + 0.3 * depth), 0.0)

    fig, ax = plt.subplots(figsize=(8, 6))
    ax.imshow(img, cmap="bone")
    ax.set_title(f"frame {frame}/{n_img}  ({len(verts)} verts)")
    ax.axis("off")

    def project(p):
        cam = (p - c2w[:3, 3]) @ c2w[:3, :3]
        cam[:, 0] *= -1
        z = cam[:, 2] - 1e-6
        return (np.stack([fx * cam[:, 0] / z + cx,
                          fy * cam[:, 1] / z + cy], -1), z < 0)

    for traj, color, label in [(np.asarray(gt_traj), "lime", "gt"),
                               (np.asarray(est_traj), "cyan", "est")]:
        if len(traj) > 1:
            uv, vis = project(traj.copy())
            uv = uv[vis]
            if len(uv) > 1:
                ax.plot(uv[:, 0], uv[:, 1], "-", color=color,
                        linewidth=1.2, label=label)
    pts, segs = camera_frustum_lines(np.asarray(cur_c2w),
                                     scale=extent * 0.03)
    uv, vis = project(pts.copy())
    if vis.all():
        for a, b in segs:
            ax.plot([uv[a, 0], uv[b, 0]], [uv[a, 1], uv[b, 1]], "-",
                    color="red", linewidth=1.0)
    ax.legend(loc="upper right")
    ax.set_xlim(0, W)
    ax.set_ylim(H, 0)
    plt.savefig(out_png, dpi=80, bbox_inches="tight")
    plt.close(fig)
    return out_png


# ---------------------------------------------------------------------------
# live follower (reader side: visualizer.py --live)
# ---------------------------------------------------------------------------

def follow_live(output: str, poll_s: float = 2.0, max_wait_s: float = 600.0,
                once: bool = False):
    """Poll `<output>/live.json` and render a view per update into
    `<output>/live_view/`; returns the list of rendered PNGs. Exits when the
    run reports done (or after `max_wait_s` without updates).
    """
    from unislam_tpu.utils.mesh_io import read_ply

    vis_dir = os.path.join(output, "live_view")
    os.makedirs(vis_dir, exist_ok=True)
    rendered = []
    last_frame, last_mesh = -1, None
    verts = faces = None
    waited = 0.0
    while True:
        state = read_live_state(output)
        if state is None or state["frame"] == last_frame:
            if once or state is not None and state.get("done"):
                break
            time.sleep(poll_s)
            waited += poll_s
            if waited > max_wait_s:
                break
            continue
        waited = 0.0
        last_frame = state["frame"]
        if state["mesh"] and state["mesh"] != last_mesh:
            try:
                verts, faces, _ = read_ply(state["mesh"])
                last_mesh = state["mesh"]
            except OSError:
                pass  # snapshot mid-write; reuse previous mesh
        if verts is not None and len(verts):
            png = os.path.join(vis_dir, f"{last_frame:05d}.png")
            render_view(png, verts, faces, state["est_t"], state["gt_t"],
                        state["cur_c2w"], last_frame, state["n_img"])
            rendered.append(png)
            print(f"[live] frame {last_frame}/{state['n_img']} "
                  f"mesh={os.path.basename(last_mesh or '-')} -> {png}",
                  flush=True)
        if state.get("done") or once:
            break
        time.sleep(poll_s)
    return rendered
