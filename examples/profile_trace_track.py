"""Capture a jax.profiler trace of the fused TRACKING frame and print
per-op device wall times grouped by op-name prefix.

Round-3 motivation: after ungating the res-128 matmul-hashed level for
tracking accuracy (BENCHLOG round 3), tracking fell 1.26M -> 870k rays/s
and became the bench bottleneck; this pinpoints where the 2.3 ms/iter goes.

Usage: python examples/profile_trace_track.py [outdir] [n_fine]
"""

import sys
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_slam(track_overrides=None):
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine.slam import UniSLAM

    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    tracking = {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                "ignore_edge_H": 75}
    tracking.update(track_overrides or {})
    cfg = make_config(ds, {
        "tracking": tracking,
        "mapping": {"pixels": 4000, "iters": 15, "iters_first": 15,
                    "every_frame": 4, "keyframe_every": 4},
        "rendering": {"n_stratified": 32, "n_importance": 8, "n_fine": 12,
                      "lod_split": "hashed"},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 "encoding": "brick", "brick_levels": 3,
                 "brick_base_res": 20,
                 "brick_features": 8, "brick_hash_size": 16,
                 "brick_matmul_rows": 1024, "brick_matmul_hashed": 1},
    })
    return UniSLAM(cfg, ds, seed=0)


def main():
    outdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/trace_track"
    tov = {}
    if len(sys.argv) > 2:
        tov["n_fine"] = int(sys.argv[2])
    print("device:", jax.devices()[0])
    slam = build_slam(tov)
    slam.step_frame(0)
    slam.step_frame(1)

    from unislam_tpu.core import pose as pose_lib

    color, depth, _ = slam._frame(2)
    pose7 = pose_lib.matrix_to_cam_pose(jnp.asarray(slam.est_c2w[1])[None])[0]
    pose = {"R": pose7[:4], "T": pose7[4:]}
    opt_state = slam.track_opt.init(pose)
    it = jnp.int32(8)

    out = slam.track_frame_fn(slam.params, pose, opt_state, depth, color,
                              slam._next_key(), it)
    out[3].block_until_ready()

    n_reps = 6
    with jax.profiler.trace(outdir):
        for _ in range(n_reps):
            out = slam.track_frame_fn(slam.params, pose, opt_state, depth,
                                      color, slam._next_key(), it)
        out[3].block_until_ready()

    import glob
    paths = glob.glob(outdir + "/**/*.xplane.pb", recursive=True)
    print("trace files:", paths)
    pd = jax.profiler.ProfileData.from_serialized_xspace(
        open(sorted(paths)[-1], "rb").read())
    rows = []
    for plane in pd.planes:
        if "TPU" not in plane.name:
            continue
        for line in plane.lines:
            if line.name not in ("XLA Ops",):
                continue
            for ev in line.events:
                rows.append((ev.name, ev.duration_ns))
    total = sum(d for _, d in rows)
    n_iters = n_reps * 8
    print(f"plane total: {total/1e6:.2f} ms over {len(rows)} events "
          f"({n_reps} frames x 8 iters -> {total/1e6/n_iters:.3f} ms/iter)")
    agg = defaultdict(lambda: [0, 0])
    for name, dur in rows:
        agg[name.split(".")[0]][0] += dur
        agg[name.split(".")[0]][1] += 1
    print("\n-- by op prefix --")
    for k, (d, n) in sorted(agg.items(), key=lambda x: -x[1][0])[:25]:
        print(f"{k:40s} {d/1e6:9.3f} ms  x{n:5d}  ({100*d/total:5.1f}%)")
    print("\n-- top individual ops --")
    byname = defaultdict(lambda: [0, 0])
    for name, dur in rows:
        byname[name][0] += dur
        byname[name][1] += 1
    for k, (d, n) in sorted(byname.items(), key=lambda x: -x[1][0])[:30]:
        print(f"{k:60s} {d/1e6:9.3f} ms  x{n:5d} ({100*d/total:5.1f}%)")


if __name__ == "__main__":
    main()
