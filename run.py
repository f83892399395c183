"""CLI entry: python run.py configs/Replica/room0.yaml [--input_folder ...]
[--output ...] [--resume].

Mirrors the reference entry point (/root/reference/run.py:25-41), plus
`--resume` (restores from the latest checkpoint — a capability the reference
lacks) and `--n_frames` for quick partial runs.
"""

import argparse
import os
import shutil
import sys

import yaml


def main():
    parser = argparse.ArgumentParser(
        description="Arguments for running Uni-SLAM-TPU.")
    parser.add_argument("config", type=str, help="Path to config file.")
    parser.add_argument("--input_folder", type=str, default=None,
                        help="input folder, overrides the config")
    parser.add_argument("--output", type=str, default=None,
                        help="output folder, overrides the config")
    parser.add_argument("--resume", action="store_true",
                        help="resume from the latest checkpoint")
    parser.add_argument("--n_frames", type=int, default=None,
                        help="only process the first N frames")
    parser.add_argument("--platform", type=str, default=None,
                        help="force a jax platform (e.g. cpu, tpu)")
    args = parser.parse_args()

    if args.platform:
        import jax
        jax.config.update("jax_platforms", args.platform)

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from unislam_tpu.config import load_config
    from unislam_tpu.runtime import SLAMRuntime

    cfg = load_config(args.config,
                      os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                   "configs", "UNISLAM.yaml"))
    output = args.output or cfg["data"]["output"]
    os.makedirs(output, exist_ok=True)
    # reproducibility: dump the merged config AND a source snapshot of the
    # framework package into the output dir (reference UNISLAM.py:146-158
    # copies src/; we copy unislam_tpu/ + the entry script)
    with open(os.path.join(output, "config.yaml"), "w") as f:
        yaml.safe_dump(cfg, f)
    repo = os.path.dirname(os.path.abspath(__file__))
    snap = os.path.join(output, "src_snapshot")
    if args.resume and os.path.isdir(snap):
        # keep the snapshot of the code that produced the earlier frames;
        # overwriting it on --resume would defeat its reproducibility
        # purpose (ADVICE r4)
        print(f"--resume: keeping existing source snapshot {snap}")
    else:
        if os.path.isdir(snap):
            shutil.rmtree(snap)
        shutil.copytree(os.path.join(repo, "unislam_tpu"),
                        os.path.join(snap, "unislam_tpu"),
                        ignore=shutil.ignore_patterns("__pycache__", "*.pyc",
                                                      "*.so"))
        shutil.copy2(os.path.abspath(__file__), snap)

    runtime = SLAMRuntime(cfg, input_folder=args.input_folder, output=output,
                          n_frames=args.n_frames)
    if args.resume:
        runtime.resume()
    runtime.run()


if __name__ == "__main__":
    main()
