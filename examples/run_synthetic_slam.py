"""Full SLAM drive on a procedural RGB-D scene: tracker + mapper over a
generated orbit trajectory, printing per-frame pose error and the final ATE.

Hermetic (no dataset downloads); runs in ~1 min on CPU. This is the
end-to-end convergence probe referenced by .claude/skills/verify.

Usage: python examples/run_synthetic_slam.py [--frames 12] [--platform cpu]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=12)
    ap.add_argument("--platform", default="cpu", choices=["cpu", "tpu", ""])
    ap.add_argument("--encoding", default="hash", choices=["hash", "brick"])
    args = ap.parse_args()

    import jax
    if args.platform:
        jax.config.update("jax_platforms", args.platform)
    import numpy as np

    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine.slam import UniSLAM
    from unislam_tpu.tools import eval_ate

    intr = Intrinsics(H=96, W=128, fx=110.0, fy=110.0, cx=63.5, cy=47.5)
    ds = SyntheticRoom(n_frames=args.frames, intr=intr,
                       deg_per_frame=1.5)
    # tracking LRs scaled up vs the Replica defaults: the synthetic orbit
    # moves much faster between frames than a 30fps sensor
    overrides = {
        "tracking": {"pixels": 800, "iters": 16, "ignore_edge_W": 6,
                     "ignore_edge_H": 6, "lr_T": 0.01, "lr_R": 0.004},
        "mapping": {"pixels": 1000, "iters": 10, "iters_first": 25,
                    "every_frame": 2, "keyframe_every": 2},
        "profiling": {"enabled": True},
    }
    if args.encoding == "brick":
        overrides["grid"] = {"encoding": "brick", "brick_levels": 3,
                             "brick_features": 8, "brick_hash_size": 12}
        overrides["rendering"] = {"n_stratified": 24, "n_importance": 8,
                                  "n_fine": 10}
    cfg = make_config(ds, overrides)
    slam = UniSLAM(cfg, ds, seed=0)

    for i in range(args.frames):
        slam.step_frame(i)
        err = np.linalg.norm(slam.est_c2w[i][:3, 3] - slam.gt_c2w[i][:3, 3])
        print(f"frame {i:3d}  trans err {err * 100:6.2f} cm")

    _, results = eval_ate.pose_evaluation(slam.gt_c2w, slam.est_c2w)
    ate_cm = results["error.rmse"]
    print(f"\nATE-RMSE: {ate_cm:.2f} cm over {args.frames} frames")
    print(slam.stats.summary())
    ok = ate_cm < 3.0
    print("SLAM OK" if ok else "SLAM DEGRADED (ATE above 3 cm)")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
