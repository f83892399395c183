"""Benchmark: rays/s per chip on the combined map+track workload.

Replica-room0 workload shape (BASELINE.md): tracking 2000 rays x 8 iters per
frame, mapping 4200 rays x 15 iters every 4th frame, 40 samples/ray,
hash 16 (SDF) / 19 (color). Both phases run their real jitted optimization
steps (forward + backward + Adam) on synthetic in-memory frames, so the
number is the end-to-end training-step throughput, not a forward-only
kernel number.

Baseline: the reference never measured throughput (dead timers,
/root/reference/src/Tracker.py:343). BASELINE.md's north star is >=2x an
A100 running the reference; from the reference's workload shape and typical
tcnn-SLAM frame times we estimate the A100 reference at ~4e5 rays/s, so the
target (and `vs_baseline` denominator) is 8e5 rays/s.
`vs_baseline >= 1.0` means the 2x-A100 target is met.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import time

import numpy as np

BASELINE_RAYS_PER_S = 8.0e5  # 2x estimated A100 reference throughput


REPLICA_METRIC = "rays_per_s_per_chip_map_track"


def _extract_vs_baseline(rec, metric: str = REPLICA_METRIC) -> float:
    """vs_baseline from a BENCH record: either this script's raw JSON line
    or the driver's wrapper ({"cmd", "rc", "tail": <stdout>}). Records
    carrying a DIFFERENT metric name (tum/scannet preset runs) are ignored
    so a fast preset can never inflate the replica regression floor."""
    if rec.get("metric", metric) != metric:
        return 0.0
    if "vs_baseline" in rec:
        return float(rec["vs_baseline"])
    best = 0.0
    for line in str(rec.get("tail", "")).splitlines():
        line = line.strip()
        if line.startswith("{"):
            try:
                inner = json.loads(line)
                if inner.get("metric", metric) != metric:
                    continue
                best = max(best, float(inner.get("vs_baseline", 0.0)))
            except Exception:
                pass
    return best


def best_recorded_vs_baseline(repo_dir: str,
                              metric: str = REPLICA_METRIC) -> float:
    """Best vs_baseline across the committed BENCH_r*.json history
    (restricted to records of `metric`)."""
    import glob
    import os
    best = 0.0
    for p in sorted(glob.glob(os.path.join(repo_dir, "BENCH_r*.json"))):
        try:
            with open(p) as f:
                best = max(best, _extract_vs_baseline(json.load(f), metric))
        except Exception:
            pass
    return best


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--assert-floor", type=float, default=None, nargs="?",
                    const=1.0, metavar="MIN_VS_BASELINE",
                    help="exit 1 if vs_baseline falls below MIN (default "
                         "1.0) OR below 0.95x the best committed "
                         "BENCH_r*.json — the regression guard VERDICT r3 "
                         "#4 asked for")
    ap.add_argument("--preset", choices=["replica", "tum", "scannet"],
                    default="replica",
                    help="workload shape. replica (default) is the "
                         "headline bench; tum/scannet re-run the same "
                         "brick pipeline at the OTHER reference workload "
                         "shapes (640x480, 48+8 samples, their ray/iter "
                         "counts — configs/TUM_RGBD/tum.yaml, "
                         "configs/ScanNet/scannet.yaml) to prove no "
                         "compile/watchdog/OOM cliff off the Replica "
                         "shape (VERDICT r4 #5)")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    import jax.numpy as jnp

    from unislam_tpu.core.rays import Intrinsics, camera_ray_dirs
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine.slam import UniSLAM

    # workload shapes per dataset family (BASELINE.md "Workload shape");
    # all run the same TPU-native brick pipeline
    SHAPES = {
        # H, W, track(px, it), map(px, it, every), strat+imp
        "replica": (680, 1200, (2000, 8), (4000, 15, 4), (32, 8)),
        "tum": (480, 640, (5000, 20), (5000, 30, 2), (48, 8)),
        "scannet": (480, 640, (2000, 20), (4000, 20, 5), (48, 8)),
    }
    H, W, (t_px, t_it), (m_px, m_it, every), (n_strat, n_imp) = \
        SHAPES[args.preset]
    intr = Intrinsics(H=H, W=W, fx=W / 2.0, fy=W / 2.0, cx=(W - 1) / 2,
                      cy=(H - 1) / 2)
    ds = SyntheticRoom(n_frames=24, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    edge = 20 if args.preset == "tum" else 75   # reference ignore_edge
    overrides = {
        "tracking": {"pixels": t_px, "iters": t_it, "ignore_edge_W": edge,
                     "ignore_edge_H": edge, "lod_split": "coarse2"},
        "mapping": {"pixels": m_px, "iters": m_it, "iters_first": m_it,
                    "every_frame": every, "keyframe_every": every},
        # mapping band-gates ALL hashed levels ("cost" == "hashed" here since
        # no level is matmul-hashed); tracking reads the mid level everywhere
        # (coarse2) — the per-phase split that fixed the room0-scale tracked
        # ATE to 2.03 cm (beats hash parity 2.68), BENCHLOG.md round 3
        "rendering": {"n_stratified": n_strat, "n_importance": n_imp,
                      "n_fine": 8, "n_fine_mid": 4, "lod_split": "cost"},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 # TPU-native brick encoding: one gather row per point/level;
                 # 3-level ladder [20, 128, 816] — the round-1 4-level ladder
                 # [16, 20, 128, 816] carried a redundant res-16 level whose
                 # per-row gather/scatter work cost ~1.5 ms/iter for no
                 # measurable quality (BENCHLOG.md round 2)
                 # mid level (res 128) served by XLA gather with 16384 rows:
                 # gather cost is table-size-independent (~6 ns/row), and
                 # 14:1 collisions (vs 55:1 at the matmul-budget 4096 rows)
                 # is what keeps tracked ATE at 2.03 cm once mapping
                 # band-gates the level (BENCHLOG.md round 3)
                 "encoding": "brick", "brick_levels": 3,
                 "brick_base_res": 20,
                 "brick_features": 8, "brick_hash_size": 16,
                 "brick_matmul_rows": 1024, "brick_matmul_hashed": 0,
                 "brick_hashed_level_rows": [16384, 65536]},
    }
    # experiment hook: JSON dict of config-section overrides, e.g.
    # UNISLAM_BENCH_GRID='{"brick_levels": 4}'
    import os
    for sec in ("grid", "rendering", "mapping", "tracking"):
        env = os.environ.get(f"UNISLAM_BENCH_{sec.upper()}")
        if env:
            overrides[sec].update(json.loads(env))
    cfg = make_config(ds, overrides)

    # pre-render the procedural frames AND pre-stage them on device, so
    # the e2e frame-loop timing below measures the SLAM system (tracking,
    # mapping cadence, selection, keyframe maintenance, host logic, the
    # per-frame trigger sync), not this environment's transport: the axon
    # relay moves ~11 MB/s host->device (a 13 MB frame costs ~1.2 s to
    # upload; a real host's PCIe is ~1000x that), which would otherwise
    # swamp the number. The reference's DataLoader reads pre-existing
    # JPEGs with pinned-memory uploads; pre-staged device frames are the
    # closest equivalent this relay allows.
    class _ListDataset:
        def __init__(self, frames):
            self._frames = frames

        def __len__(self):
            return len(self._frames)

        def __getitem__(self, i):
            return self._frames[i]

    ds_mem = _ListDataset([
        (jnp.asarray(c, jnp.float32), jnp.asarray(d, jnp.float32), g)
        for c, d, g in (ds[i] for i in range(len(ds)))])
    slam = UniSLAM(cfg, ds_mem, seed=0)

    n_samples = n_strat + n_imp
    track_rays = t_px
    map_rays = m_px + 200

    # ---- warmup: trigger all compiles via two real frames ----
    t0 = time.time()
    slam.step_frame(0)
    slam.step_frame(1)
    compile_s = time.time() - t0

    # ---- end-to-end frame loop: the reference's headline claim is
    # REAL-TIME SLAM (/root/reference/README.md:7-22), so report frames/s
    # too — full step_frame including tracking, mapping cadence, window
    # selection, keyframe bank maintenance, and host-driver overhead.
    # MUST run before the phase timings below: map_phase donates its
    # opt_tree, so the first hand-built map_phase call below consumes
    # slam.params' buffers ----
    # frames 2..9 are unmetered warmup: they trigger the remaining
    # compiles — doubling continuation, keyframe add, and the selection
    # graph, which first fires once the bank holds >2 keyframes (frame 8
    # at the Replica cadence) — so no remote compile (~1.5-40 s on the
    # axon relay) lands inside the timed region
    for i in range(2, 10):
        slam.step_frame(i)
    # the doubling-continuation dispatch (carry != None) is a DISTINCT jit
    # trace that warmup frames only compile if an activated-mapping trigger
    # happens to fire in 2..9; force-compile it here so a first trigger
    # inside the timed region never pays a remote compile there
    from unislam_tpu.core import pose as pose_lib
    _c, _d, _ = slam._frame(9)
    _p7 = pose_lib.matrix_to_cam_pose(jnp.asarray(slam.est_c2w[9])[None])[0]
    _pose = {"R": _p7[:4], "T": _p7[4:]}
    _st = slam.track_frame_fn(slam.params, _pose, slam.track_opt.init(_pose),
                              _d, _c, slam._next_key(),
                              jnp.int32(slam.tc.iters), jnp.int32(0), None)
    slam.track_frame_fn(slam.params, _st[0], _st[1], _d, _c,
                        slam._next_key(), jnp.int32(slam.tc.iters),
                        jnp.int32(slam.tc.iters),
                        _st[2:])[3].block_until_ready()
    e2e_first, e2e_last = 10, len(ds_mem) - 1
    n_e2e = e2e_last - e2e_first + 1
    t0 = time.time()
    for i in range(e2e_first, e2e_last + 1):
        slam.step_frame(i)
    e2e_time = time.time() - t0
    frames_per_s = n_e2e / e2e_time

    # ---- timed region: the reference's per-4-frame cadence ----
    # 3 tracked frames (8 iters each) + 1 mapped frame (15 iters), repeated.
    color, depth, _ = slam._frame(2)
    t_iters, m_iters = t_it, m_it
    reps = 6

    # tracking phase timing (fused whole-frame dispatch)
    from unislam_tpu.core import pose as pose_lib
    pose7 = pose_lib.matrix_to_cam_pose(jnp.asarray(slam.est_c2w[1])[None])[0]
    pose = {"R": pose7[:4], "T": pose7[4:]}
    opt_state = slam.track_opt.init(pose)
    iters_j = jnp.int32(t_iters)
    out = slam.track_frame_fn(slam.params, pose, opt_state, depth, color,
                              slam._next_key(), iters_j)
    out[3].block_until_ready()  # warm
    t0 = time.time()
    for _ in range(reps * 3):
        out = slam.track_frame_fn(slam.params, pose, opt_state, depth, color,
                                  slam._next_key(), iters_j)
    out[3].block_until_ready()
    track_time = time.time() - t0
    track_ray_count = reps * 3 * t_iters * track_rays

    # mapping phase timing (fused whole-phase dispatch)
    import numpy as _np
    from unislam_tpu.engine import selection as selection_lib
    count = int(slam.bank.count)
    probs, extra = selection_lib.window_probs(
        slam.max_kf, count, _np.zeros(slam.max_kf, bool))
    pg = _np.zeros((slam.max_kf + 1, 1), _np.float32)
    opt_tree = {"scene": slam.params,
                "poses": jnp.concatenate(
                    [slam.bank.pose7,
                     pose_lib.matrix_to_cam_pose(
                         jnp.asarray(slam.est_c2w[1])[None])], axis=0)}
    mstate = slam.map_opt.init(opt_tree)
    probs_j = jnp.asarray(probs, jnp.float32)
    extra_j = jnp.asarray(extra, jnp.float32)
    pg_j = jnp.asarray(pg)
    m_iters_j = jnp.int32(m_iters)
    lr1 = jnp.float32(1.0)
    ot, ms, ml = slam.map_phase(opt_tree, mstate, slam.bank, depth, color,
                                slam.cam_rays_d, probs_j, extra_j, pg_j,
                                slam._next_key(), m_iters_j, lr1)
    ml.block_until_ready()
    t0 = time.time()
    for _ in range(reps):
        ot, ms, ml = slam.map_phase(ot, ms, slam.bank, depth, color,
                                    slam.cam_rays_d, probs_j, extra_j, pg_j,
                                    slam._next_key(), m_iters_j, lr1)
    ml.block_until_ready()
    map_time = time.time() - t0
    map_ray_count = reps * m_iters * map_rays

    total_rays = track_ray_count + map_ray_count
    total_time = track_time + map_time
    rays_per_s = total_rays / total_time

    # dispatch-only FPS (no host overhead): per cadence group of
    # `every` frames, every frame tracked + 1 mapping phase
    track_dispatch_s = track_time / (reps * 3)
    map_dispatch_s = map_time / reps
    fps_dispatch = every / (every * track_dispatch_s + map_dispatch_s)

    result = {
        "metric": ("rays_per_s_per_chip_map_track" if
                   args.preset == "replica" else
                   f"rays_per_s_per_chip_map_track_{args.preset}"),
        "value": round(rays_per_s, 1),
        "unit": "rays/s",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 3),
        "frames_per_s": round(frames_per_s, 2),
    }
    print(json.dumps(result))
    # diagnostics on stderr-ish second line (driver reads line 1)
    import sys
    print(json.dumps({
        "track_rays_per_s": round(track_ray_count / track_time, 1),
        "map_rays_per_s": round(map_ray_count / map_time, 1),
        "points_per_s": round(rays_per_s * n_samples, 1),
        "frames_per_s_e2e": round(frames_per_s, 2),
        "frames_per_s_dispatch_only": round(fps_dispatch, 2),
        "tracked_frame_ms": round(track_dispatch_s * 1e3, 2),
        "mapping_phase_ms": round(map_dispatch_s * 1e3, 2),
        "e2e_frames": n_e2e,
        "e2e_note": ("each host sync traverses the axon network relay "
                     "(~33 ms RT) in this environment; on a local host "
                     "e2e approaches the dispatch-only FPS"),
        "compile_s": round(compile_s, 1),
        "device": str(jax.devices()[0]),
    }), file=sys.stderr)

    if args.assert_floor is not None and args.preset != "replica":
        # the floor (explicit min AND committed history) is defined in
        # replica-workload units; comparing a different workload shape
        # against it would fail spuriously or mask a real regression
        print(f"bench floor skipped: --assert-floor guards the replica "
              f"preset only (got --preset {args.preset})", file=sys.stderr)
    elif args.assert_floor is not None:
        repo = os.path.dirname(os.path.abspath(__file__))
        hist = best_recorded_vs_baseline(repo)
        floor = max(args.assert_floor, 0.95 * hist)
        if result["vs_baseline"] < floor:
            print(f"BENCH FLOOR VIOLATION: vs_baseline "
                  f"{result['vs_baseline']} < floor {floor:.3f} "
                  f"(min {args.assert_floor}, 0.95 x best history {hist})",
                  file=sys.stderr)
            sys.exit(1)
        print(f"bench floor ok: {result['vs_baseline']} >= {floor:.3f}",
              file=sys.stderr)


if __name__ == "__main__":
    main()
