"""Generate a small Replica-format dataset on disk from the synthetic room,
so the real CLI (run.py) can be driven hermetically.

Usage: python examples/make_fake_replica.py /tmp/fake_replica [n_frames]
Writes results/frame*.jpg + depth*.png + traj.txt + a ready config YAML.
"""

import os
import sys

import cv2
import numpy as np
import yaml

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from unislam_tpu.core.rays import Intrinsics
from unislam_tpu.data.synthetic import SyntheticRoom


def main():
    out = sys.argv[1] if len(sys.argv) > 1 else "/tmp/fake_replica"
    n = int(sys.argv[2]) if len(sys.argv) > 2 else 12
    intr = Intrinsics(H=120, W=160, fx=130.0, fy=130.0, cx=79.5, cy=59.5)
    ds = SyntheticRoom(n_frames=n, intr=intr, deg_per_frame=1.5)

    res_dir = os.path.join(out, "room", "results")
    os.makedirs(res_dir, exist_ok=True)
    depth_scale = 6553.5
    lines = []
    for i in range(n):
        color, depth, c2w = ds[i]
        cv2.imwrite(os.path.join(res_dir, f"frame{i:06d}.jpg"),
                    cv2.cvtColor((color * 255).astype(np.uint8),
                                 cv2.COLOR_RGB2BGR),
                    [cv2.IMWRITE_JPEG_QUALITY, 97])
        cv2.imwrite(os.path.join(res_dir, f"depth{i:06d}.png"),
                    (depth * depth_scale).astype(np.uint16))
        # undo the loader's y/z flip so it round-trips
        traj = c2w.copy()
        traj[:3, 1] *= -1
        traj[:3, 2] *= -1
        lines.append(" ".join(f"{v:.9f}" for v in traj.reshape(-1)))
    with open(os.path.join(out, "room", "traj.txt"), "w") as f:
        f.write("\n".join(lines) + "\n")

    cfg = {
        "inherit_from": "configs/Replica/replica.yaml",
        "mapping": {"bound": ds.bound, "marching_cubes_bound": ds.bound,
                    "pixels": 1000, "iters": 8, "iters_first": 25,
                    "every_frame": 2, "keyframe_every": 2,
                    "mesh_freq": 100000},
        "tracking": {"pixels": 700, "iters": 16, "ignore_edge_W": 8,
                     "ignore_edge_H": 8, "lr_T": 0.01, "lr_R": 0.004,
                     "vis_freq": 8, "vis_pose_freq": 8},
        "rendering": {"n_stratified": 16, "n_importance": 4},
        "grid": {"hash_size_sdf": 13, "hash_size_color": 13,
                 "voxel_sdf": 0.02, "voxel_color": 0.02},
        "meshing": {"resolution": 0.04, "eval_rec": False},
        "cam": {"H": intr.H, "W": intr.W, "fx": intr.fx, "fy": intr.fy,
                "cx": intr.cx, "cy": intr.cy,
                "png_depth_scale": depth_scale, "crop_edge": 0},
        "data": {"input_folder": os.path.join(out, "room"),
                 "output": os.path.join(out, "output")},
    }
    cfg_path = os.path.join(out, "fake_room.yaml")
    with open(cfg_path, "w") as f:
        yaml.safe_dump(cfg, f)
    print(f"wrote {n} frames under {out}/room and config {cfg_path}")


if __name__ == "__main__":
    main()
