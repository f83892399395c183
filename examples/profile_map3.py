"""Profile the REAL mapping/tracking steps stage by stage on TPU.

Builds the exact bench.py workload and times: loss forward, value_and_grad,
+optimizer update, full fused phase per-iter; same for tracking. The gap
between stages localizes unaccounted time.

Usage: python examples/profile_map3.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.asarray(leaves[0]).reshape(-1)[0])


def timeit(fn, *args, reps=10, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps, out


def main():
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine import selection as selection_lib
    from unislam_tpu.engine.slam import UniSLAM

    print("device:", jax.devices()[0])
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    cfg = make_config(ds, {
        "tracking": {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                     "ignore_edge_H": 75},
        "mapping": {"pixels": 4000, "iters": 15, "iters_first": 15,
                    "every_frame": 4, "keyframe_every": 4},
        "rendering": {"n_stratified": 32, "n_importance": 8},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 "encoding": "brick", "brick_levels": 4,
                 "brick_features": 8, "brick_hash_size": 16},
    })
    slam = UniSLAM(cfg, ds, seed=0)
    slam.step_frame(0)
    slam.step_frame(1)

    color, depth, _ = slam._frame(2)
    count = int(slam.bank.count)
    probs, extra = selection_lib.window_probs(
        slam.max_kf, count, np.zeros(slam.max_kf, bool))
    pg = np.zeros((slam.max_kf + 1, 1), np.float32)
    pg[[0, slam.max_kf], 0] = 1.0  # exercise BA pose grads
    opt_tree = {"scene": slam.params,
                "poses": jnp.concatenate(
                    [slam.bank.pose7,
                     pose_lib.matrix_to_cam_pose(
                         jnp.asarray(slam.est_c2w[1])[None])], axis=0)}
    probs_j = jnp.asarray(probs, jnp.float32)
    extra_j = jnp.asarray(extra, jnp.float32)
    pg_j = jnp.asarray(pg)
    key = jax.random.PRNGKey(42)

    # rebuild the internal pieces of the mapping step for staged timing
    from unislam_tpu.engine import mapper as mapper_lib
    step, opt, phase = mapper_lib.make_mapping_step(
        slam.sc, slam.rc, slam.mc, slam.intr, slam.max_kf, slam.bank_size)

    # (a) single step (1 dispatch per iter)
    mstate = opt.init(opt_tree)
    t, _ = timeit(step, opt_tree, mstate, slam.bank, depth, color,
                  slam.cam_rays_d, probs_j, extra_j, pg_j, key, jnp.float32(1.0))
    print(f"map single step          {t * 1e3:8.2f} ms")

    # (b) fused phase, n=1
    t, _ = timeit(phase, opt_tree, mstate, slam.bank, depth, color,
                  slam.cam_rays_d, probs_j, extra_j, pg_j, key, jnp.int32(1), jnp.float32(1.0))
    print(f"map phase n=1            {t * 1e3:8.2f} ms")

    # (c) fused phase, n=15 (per-iter)
    t, _ = timeit(phase, opt_tree, mstate, slam.bank, depth, color,
                  slam.cam_rays_d, probs_j, extra_j, pg_j, key, jnp.int32(15), jnp.float32(1.0),reps=4)
    print(f"map phase n=15 per-iter  {t / 15 * 1e3:8.2f} ms")

    # (d) no-BA variant: pose grads off
    pg0 = jnp.zeros_like(pg_j)
    t, _ = timeit(phase, opt_tree, mstate, slam.bank, depth, color,
                  slam.cam_rays_d, probs_j, extra_j, pg0, key, jnp.int32(15), jnp.float32(1.0),reps=4)
    print(f"map phase no-BA per-iter {t / 15 * 1e3:8.2f} ms")

    # (e) tracking per-iter
    pose7 = pose_lib.matrix_to_cam_pose(jnp.asarray(slam.est_c2w[1])[None])[0]
    pose = {"R": pose7[:4], "T": pose7[4:]}
    tstate = slam.track_opt.init(pose)
    t, _ = timeit(slam.track_frame_fn, slam.params, pose, tstate, depth,
                  color, key, jnp.int32(8), reps=6)
    print(f"track frame n=8 per-iter {t / 8 * 1e3:8.2f} ms")

    t, _ = timeit(slam.track_step, slam.params, pose, tstate, depth, color,
                  key)
    print(f"track single step        {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
