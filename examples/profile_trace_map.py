"""Capture a jax.profiler trace of the fused mapping phase + tracking frame
and print per-op device wall times (top-k), grouped by op-name prefix.

This measures REAL device-op durations (not HLO estimated cycles — round-2
lesson: estimated cycles ranked cumprod at 13% but the real win was ~1.5%).

Usage: python examples/profile_trace_map.py [outdir] [--encoding brick|hash]
"""

import argparse
import sys
import time
from collections import defaultdict

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def build_slam(encoding: str = "brick"):
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine.slam import UniSLAM

    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    grid = {"hash_size_sdf": 16, "hash_size_color": 19,
            "voxel_sdf": 0.01, "voxel_color": 0.01}
    rendering = {"n_stratified": 32, "n_importance": 8}
    if encoding == "brick":
        grid.update({"encoding": "brick", "brick_levels": 3,
                     "brick_base_res": 20,
                     "brick_features": 8, "brick_hash_size": 16,
                     "brick_matmul_rows": 1024, "brick_matmul_hashed": 0,
                     "brick_hashed_level_rows": [16384, 65536]})
        rendering.update({"n_fine": 8, "n_fine_mid": 4,
                          "lod_split": "hashed"})
    mapping = {"pixels": 4000, "iters": 15, "iters_first": 15,
               "every_frame": 4, "keyframe_every": 4}
    if encoding == "hash":
        # ~40 ms/iter hash graphs at 15 fused iters trip the TPU runtime's
        # execution watchdog (round-4 crash); chunked dispatches are
        # bit-identical via map_phase's iter0 key offset
        mapping["max_fused_iters"] = 8
    cfg = make_config(ds, {
        "tracking": {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                     "ignore_edge_H": 75},
        "mapping": mapping,
        "rendering": rendering,
        "grid": grid,
    })
    return UniSLAM(cfg, ds, seed=0)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("outdir", nargs="?", default="/tmp/trace_map")
    ap.add_argument("--encoding", choices=["brick", "hash"],
                    default="brick")
    ap.add_argument("--iters", type=int, default=None,
                    help="fused iters per dispatch (default 15 brick / "
                         "8 hash — long hash dispatches trip the watchdog)")
    args_cli = ap.parse_args()
    outdir = args_cli.outdir
    n_iters = args_cli.iters or (15 if args_cli.encoding == "brick" else 8)
    print("device:", jax.devices()[0], "encoding:", args_cli.encoding)
    slam = build_slam(args_cli.encoding)
    slam.step_frame(0)
    slam.step_frame(1)

    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.engine import selection as selection_lib

    color, depth, _ = slam._frame(2)
    count = int(slam.bank.count)
    probs, extra = selection_lib.window_probs(
        slam.max_kf, count, np.zeros(slam.max_kf, bool))
    pg = np.zeros((slam.max_kf + 1, 1), np.float32)
    opt_tree = {"scene": slam.params,
                "poses": jnp.concatenate(
                    [slam.bank.pose7,
                     pose_lib.matrix_to_cam_pose(
                         jnp.asarray(slam.est_c2w[1])[None])], axis=0)}
    mstate = slam.map_opt.init(opt_tree)
    probs_j = jnp.asarray(probs, jnp.float32)
    extra_j = jnp.asarray(extra, jnp.float32)
    pg_j = jnp.asarray(pg)
    it = jnp.int32(n_iters)
    args = (opt_tree, mstate, slam.bank, depth, color, slam.cam_rays_d,
            probs_j, extra_j, pg_j)

    ot, ms, ml = slam.map_phase(*args, slam._next_key(), it, jnp.float32(1.0))
    float(ml)

    with jax.profiler.trace(outdir):
        for _ in range(3):
            ot, ms, ml = slam.map_phase(ot, ms, slam.bank, depth, color,
                                        slam.cam_rays_d, probs_j, extra_j,
                                        pg_j, slam._next_key(), it,
                                        jnp.float32(1.0))
        float(ml)

    import glob
    import gzip
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
                dur = ev.duration_ns
                name = ev.name
                rows.append((name, dur))
    total = sum(d for _, d in rows)
    print(f"plane total: {total/1e6:.2f} ms over {len(rows)} events "
          f"(3 phases x {n_iters} iters) -> "
          f"{total/1e6/3/n_iters:.2f} ms/iter")
    agg = defaultdict(lambda: [0, 0])
    for name, dur in rows:
        key = name.split(".")[0]
        agg[key][0] += dur
        agg[key][1] += 1
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
