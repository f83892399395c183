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


def angular_velocity_from_quats(quats: np.ndarray):
    """Rotational velocity/acceleration magnitudes from per-frame unit
    quaternions, matching the reference's finite-difference form
    (eval_ate.py:47-71, quaternion_to_rotational_velocity_round):
    |omega_t| = |2 (q_t - q_{t-1})| at dt = 1 frame, zero-prepended."""
    q = np.asarray(quats, np.float64)
    vel = np.linalg.norm(2.0 * np.diff(q, axis=0), axis=1)
    vel = np.concatenate([[0.0], vel])
    acc = np.concatenate([[0.0], np.diff(vel)])
    return vel, acc


def replace_outliers_with_median(data: np.ndarray, factor: float = 20.0):
    """Clamp |x| > factor*median(x) to the median (eval_ate.py:72-89) —
    keeps one bad quaternion flip from wrecking the plot scale."""
    data = np.asarray(data, np.float64)
    med = np.median(data)
    out = np.where(data > med * factor, med, data)
    return np.where(out < -med * factor, med, out)


def plot_velocities(gt_c2w, est_c2w, path, weights=None):
    """Linear + angular (quaternion-derived) velocity panels with the
    rendered-weight/uncertainty strip — the reference's
    plot_combined_velocity 3x2 figure (eval_ate.py:92-167)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from unislam_tpu.core import pose as pose_lib

    def lin(tr):
        v = np.concatenate([[np.zeros(3)], np.diff(tr, axis=0)])
        vm = np.linalg.norm(v, axis=1)
        a = np.concatenate([[0.0], np.diff(vm)])
        return vm, a

    gt = np.asarray(gt_c2w, np.float32)
    est = np.asarray(est_c2w, np.float32)
    vg, _ = lin(gt[:, :3, 3])
    ve, _ = lin(est[:, :3, 3])

    import jax.numpy as jnp
    q_gt = np.asarray(pose_lib.matrix_to_cam_pose(jnp.asarray(gt)))[:, :4]
    q_est = np.asarray(pose_lib.matrix_to_cam_pose(jnp.asarray(est)))[:, :4]
    wg, _ = angular_velocity_from_quats(q_gt)
    we, ae = angular_velocity_from_quats(q_est)
    wg = replace_outliers_with_median(wg)
    we = replace_outliers_with_median(we)
    ae = replace_outliers_with_median(ae)

    unc = (np.asarray(weights, np.float64) if weights is not None
           else np.zeros(len(vg)))

    fig, axes = plt.subplots(3, 2, figsize=(12, 18))
    panels = [
        (vg, "Linear Velocity GT", "Velocity (units/s)"),
        (wg, "Angular Velocity GT", "Angular Velocity (rad/s)"),
        (ve, "Linear Velocity Est", "Velocity (units/s)"),
        (we, "Angular Velocity Est", "Angular Velocity (rad/s)"),
        (unc, "uncertainty", "uncertainty"),
        (ae, "Angular Acceleration Est", "rad/s^2"),
    ]
    for ax, (y, title, ylabel) in zip(axes.ravel(), panels):
        ax.plot(np.arange(len(y)), y)
        ax.set_title(title)
        ax.set_xlabel("Time (s)")
        ax.set_ylabel(ylabel)
    fig.tight_layout()
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    fig.savefig(path, dpi=90)
    plt.close(fig)


def vis_trans_error(trans_error_cm, output, file_path="trans_error_data.json"):
    """Per-frame translation-error JSON + scatter strip + uncertainty
    colorbar (eval_ate.py:283-334)."""
    import matplotlib
    matplotlib.use("Agg")
    import matplotlib.pyplot as plt
    from matplotlib.cm import ScalarMappable
    from matplotlib.colors import Normalize

    os.makedirs(output, exist_ok=True)
    err_m = np.asarray(trans_error_cm, np.float64) / 100.0  # reference: m
    with open(os.path.join(output, file_path), "w") as f:
        json.dump({"trans_error": [round(float(e), 4) for e in err_m]}, f)

    cmap = plt.get_cmap("viridis")
    norm = Normalize(vmin=0, vmax=0.001)
    fig, ax = plt.subplots(figsize=(0.35, 4), dpi=300)
    cb = fig.colorbar(ScalarMappable(norm=norm, cmap=cmap), cax=ax)
    cb.set_label("Uncertainty Value")
    fig.savefig(os.path.join(output, "uncertainty_colorbar.png"),
                bbox_inches="tight")
    plt.close(fig)

    cmap = plt.get_cmap("jet")
    norm = plt.Normalize(vmin=0, vmax=0.25)
    fig, ax = plt.subplots(figsize=(6, 0.5), dpi=300)
    for i, value in enumerate(err_m):
        ax.vlines(i, 0, 1, color=cmap(norm(value)), linewidth=2)
    ax.yaxis.set_visible(False)
    ax.set_xticks(range(0, max(len(err_m), 1), 500))
    for side in ("top", "right", "left", "bottom"):
        ax.spines[side].set_visible(False)
    ax.set_aspect("auto")
    fig.savefig(os.path.join(output, "translation_error_scatter.png"),
                bbox_inches="tight", pad_inches=0)
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
        vis_trans_error(trans_error, out_dir)
        w = np.asarray(weights)[mask] if weights is not None else None
        plot_velocities(gt[mask], est[mask],
                        os.path.join(out_dir, "velocity.png"), weights=w)
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
