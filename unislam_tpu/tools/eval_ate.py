"""Absolute trajectory error (ATE) evaluation + trajectory/velocity plots.

Rewrite of /root/reference/src/tools/eval_ate.py (itself derived from the
public TUM RGB-D benchmark script): Horn closed-form alignment, ATE
RMSE/mean/median/std/max in centimeters, trajectory plot, velocity plots,
per-frame error dump, uncertainty/activated-mapping strips.

API parity: `pose_evaluation(gt_c2w, est_c2w, weights, plot_path, scale,
pose_alignment)` returns (trans_error_cm, results_dict) with the same result
keys as the reference (eval_ate.py:498-506). Errors are always reported in
cm (the reference converts to cm on its plotting path).
"""

from __future__ import annotations

import json
import os
from typing import Dict, Optional, Tuple

import numpy as np


def align_horn(model: np.ndarray, data: np.ndarray):
    """Horn's closed-form SE(3) alignment of `model` (3, N) onto `data` (3, N).

    Returns (rot (3,3), trans (3,1), trans_error (N,)). Matches the TUM
    benchmark `align` used by the reference (eval_ate.py)."""
    model_mean = model.mean(axis=1, keepdims=True)
    data_mean = data.mean(axis=1, keepdims=True)
    model_zc = model - model_mean
    data_zc = data - data_mean

    W = model_zc @ data_zc.T
    U, _, Vt = np.linalg.svd(W.T)
    S = np.eye(3)
    if np.linalg.det(U) * np.linalg.det(Vt) < 0:
        S[2, 2] = -1
    rot = U @ S @ Vt
    trans = data_mean - rot @ model_mean

    aligned = rot @ model + trans
    err = aligned - data
    trans_error = np.sqrt((err * err).sum(axis=0))
    return rot, trans, trans_error


def convert_poses(c2w_list: np.ndarray, scale: float = 1.0):
    """(N, 4, 4) c2w -> (M, 3) translations + validity mask, skipping
    nan/inf ground-truth poses (ScanNet quirk, eval_ate.py:527-541)."""
    c2w = np.asarray(c2w_list, dtype=np.float64)
    mask = np.isfinite(c2w).all(axis=(1, 2))
    xyz = c2w[mask][:, :3, 3] / scale
    return xyz, mask


def evaluate_ate(gt_xyz: np.ndarray, est_xyz: np.ndarray,
                 pose_alignment: bool = False,
                 plot: Optional[str] = None) -> Tuple[np.ndarray, Dict]:
    """ATE between matched (N, 3) translation arrays; errors in cm.

    pose_alignment=False reports raw errors but still estimates the Horn
    transform (reference behavior, eval_ate.py:414-421)."""
    model = est_xyz.T  # (3, N)
    data = gt_xyz.T
    rot, trans, _ = align_horn(model, data)
    if pose_alignment:
        aligned = rot @ model + trans
    else:
        aligned = model
    err = aligned - data
    trans_error = np.sqrt((err * err).sum(axis=0)) * 100.0  # cm

    results = {
        "compared_pose_pairs": int(len(trans_error)),
        "unit": "cm",
        "error.rmse": round(float(np.sqrt(np.mean(trans_error ** 2))), 2),
        "error.mean": round(float(np.mean(trans_error)), 2),
        "error.median": round(float(np.median(trans_error)), 2),
        "error.std": round(float(np.std(trans_error)), 2),
        "error.max": round(float(np.max(trans_error)), 2),
    }

    if plot:
        _plot_trajectory(gt_xyz, aligned.T, results, plot)
    return trans_error, results


def _plot_trajectory(gt_xyz, est_xyz, results, path):
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig, ax = plt.subplots()
    ax.set_title(f"len:{len(gt_xyz)} ATE RMSE:{results['error.rmse']} cm")
    ax.plot(gt_xyz[:, 0], gt_xyz[:, 1], "-", color="black",
            label="ground truth")
    ax.plot(est_xyz[:, 0], est_xyz[:, 1], "-", color="blue",
            label="estimated")
    ax.plot(gt_xyz[-1, 0], gt_xyz[-1, 1], "o", color="green", markersize=10,
            label="GT end")
    ax.plot(est_xyz[-1, 0], est_xyz[-1, 1], "*", color="red", markersize=10,
            label="Est end")
    ax.legend()
    ax.set_xlabel("x [m]")
    ax.set_ylabel("y [m]")
    fig.savefig(path, dpi=90)
    plt.close(fig)


def plot_velocities(gt_c2w, est_c2w, path):
    """Linear/angular velocity + acceleration panels
    (eval_ate.py:92-167, plot_combined_velocity)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def lin(tr):
        v = np.concatenate([[np.zeros(3)], np.diff(tr, axis=0)])
        vm = np.linalg.norm(v, axis=1)
        a = np.concatenate([[0.0], np.diff(vm)])
        return vm, a

    gt_t = np.asarray(gt_c2w)[:, :3, 3]
    est_t = np.asarray(est_c2w)[:, :3, 3]
    vg, ag = lin(gt_t)
    ve, ae = lin(est_t)

    fig, axes = plt.subplots(2, 2, figsize=(10, 6))
    for ax, (y1, y2, title) in zip(
            axes.ravel(),
            [(vg, ve, "linear velocity"), (ag, ae, "linear acceleration"),
             (vg - ve, None, "velocity delta"), (None, None, "")]):
        if y1 is None:
            ax.axis("off")
            continue
        ax.plot(y1, label="gt")
        if y2 is not None:
            ax.plot(y2, label="est")
        ax.set_title(title)
        ax.legend()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=90)
    plt.close(fig)


def vis_unc_mapstep(tracking_weights, additional_map_records, output):
    """Uncertainty strip + activated-mapping strip (eval_ate.py:336-379)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    os.makedirs(output, exist_ok=True)
    cmap = plt.get_cmap("plasma")
    norm = plt.Normalize(vmin=0, vmax=0.005)
    fig, ax = plt.subplots(figsize=(6, 0.5), dpi=150)
    for i, v in enumerate(tracking_weights):
        ax.vlines(i, 0, 1, color=cmap(norm(v)), linewidth=2)
    ax.yaxis.set_visible(False)
    fig.savefig(os.path.join(output, "uncertainty_record.png"),
                bbox_inches="tight", pad_inches=0)
    plt.close(fig)

    fig, ax = plt.subplots(figsize=(6, 0.5), dpi=150)
    for i, v in enumerate(additional_map_records):
        ax.vlines(i, 0, 1, color=("red" if v else "white"), linewidth=2)
    ax.yaxis.set_visible(False)
    fig.savefig(os.path.join(output, "addtional_mapping_record.png"),
                bbox_inches="tight", pad_inches=0)
    plt.close(fig)


def pose_evaluation(gt_c2w, est_c2w, weights=None, plot_path=None,
                    scale: float = 1.0, pose_alignment: bool = False):
    """Top-level entry matching the reference's `pose_evaluation`
    (called from the tracker, Tracker.py:377-379)."""
    gt = np.asarray(gt_c2w, dtype=np.float64)
    est = np.asarray(est_c2w, dtype=np.float64)
    mask = np.isfinite(gt).all(axis=(1, 2))  # gt nan/inf frames are skipped
    gt_xyz = gt[mask][:, :3, 3] / scale
    est_xyz = est[mask][:, :3, 3] / scale
    trans_error, results = evaluate_ate(gt_xyz, est_xyz, pose_alignment,
                                        plot=plot_path)
    if plot_path:
        out_dir = os.path.dirname(plot_path) or "."
        os.makedirs(out_dir, exist_ok=True)
        with open(os.path.join(out_dir, "trans_error_data.json"), "w") as f:
            json.dump({"trans_error_cm": trans_error.tolist()}, f)
        plot_velocities(gt_c2w, est_c2w,
                        os.path.join(out_dir, "velocity.png"))
    return trans_error, results


def main():
    import argparse

    from unislam_tpu.config import load_config
    from unislam_tpu.utils.logger import latest_checkpoint, load_checkpoint

    parser = argparse.ArgumentParser(description="Evaluate tracking ATE "
                                     "from the latest checkpoint.")
    parser.add_argument("config", type=str)
    parser.add_argument("--output", type=str, default=None)
    args = parser.parse_args()
    cfg = load_config(args.config, "configs/UNISLAM.yaml")
    output = args.output or cfg["data"]["output"]
    ckpt_path = latest_checkpoint(os.path.join(output, "ckpts"))
    if ckpt_path is None:
        print(f"no checkpoint under {output}/ckpts")
        return
    ckpt = load_checkpoint(ckpt_path)
    _, results = pose_evaluation(
        ckpt["gt_c2w"], ckpt["est_c2w"], ckpt.get("tracking_weights"),
        plot_path=os.path.join(output, "eval_ate_plot.png"),
        scale=cfg.get("scale", 1))
    print(results)
    vis_unc_mapstep(ckpt.get("tracking_weights", []),
                    ckpt.get("additional_map_records", []), output)


if __name__ == "__main__":
    main()
