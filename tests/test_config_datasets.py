"""Config inheritance + dataset loaders (against generated on-disk fixtures)."""

import os

import cv2
import numpy as np
import pytest

from unislam_tpu.config import load_config
from unislam_tpu.data.datasets import Replica, ScanNet, get_dataset

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_config_inheritance_chain():
    cfg = load_config(os.path.join(ROOT, "configs/Replica/room0.yaml"),
                      os.path.join(ROOT, "configs/UNISLAM.yaml"))
    # leaf values
    assert cfg["data"]["input_folder"] == "Datasets/Replica/room0"
    assert cfg["mapping"]["bound"][0] == [-1.0, 7.0]
    # dataset-base values
    assert cfg["dataset"] == "replica"
    assert cfg["grid"]["hash_size_sdf"] == 16
    assert cfg["grid"]["hash_size_color"] == 19
    # default values not overridden anywhere
    assert cfg["mapping"]["mapping_window_size"] == 20
    assert cfg["model"]["truncation"] == 0.06
    assert cfg["tracking"]["w_sdf_center"] == 200


def test_all_configs_parse():
    import glob
    default = os.path.join(ROOT, "configs/UNISLAM.yaml")
    leaves = [p for p in glob.glob(os.path.join(ROOT, "configs/*/*.yaml"))]
    assert len(leaves) >= 30
    for p in leaves:
        cfg = load_config(p, default)
        assert "cam" in cfg and "tracking" in cfg and "mapping" in cfg, p


@pytest.fixture
def fake_replica(tmp_path):
    """A 4-frame Replica-format scene on disk."""
    d = tmp_path / "room0" / "results"
    d.mkdir(parents=True)
    H, W = 30, 40
    rng = np.random.default_rng(0)
    poses = []
    for i in range(4):
        color = (rng.random((H, W, 3)) * 255).astype(np.uint8)
        depth = (rng.random((H, W)) * 6553.5).astype(np.uint16)
        cv2.imwrite(str(d / f"frame{i:06d}.jpg"), color)
        cv2.imwrite(str(d / f"depth{i:06d}.png"), depth)
        c2w = np.eye(4)
        c2w[:3, 3] = [i * 0.1, 0, 0]
        poses.append(c2w)
    with open(tmp_path / "room0" / "traj.txt", "w") as f:
        for p in poses:
            f.write(" ".join(str(v) for v in p.reshape(-1)) + "\n")
    return str(tmp_path / "room0")


def test_replica_loader(fake_replica):
    cfg = {"dataset": "replica",
           "cam": {"H": 30, "W": 40, "fx": 30.0, "fy": 30.0, "cx": 19.5,
                   "cy": 14.5, "png_depth_scale": 6553.5, "crop_edge": 0},
           "data": {"input_folder": fake_replica}}
    ds = get_dataset(cfg)
    assert len(ds) == 4
    color, depth, pose = ds[1]
    assert color.shape == (30, 40, 3) and color.dtype == np.float32
    assert color.max() <= 1.0
    assert depth.shape == (30, 40) and depth.max() <= 1.0 + 1e-6
    # y/z axis flip applied
    np.testing.assert_allclose(pose[:3, 3], [0.1, 0, 0], atol=1e-6)
    np.testing.assert_allclose(pose[1, 1], -1.0)
    np.testing.assert_allclose(pose[2, 2], -1.0)


def test_replica_loader_crop_edge(fake_replica):
    cfg = {"dataset": "replica",
           "cam": {"H": 30, "W": 40, "fx": 30.0, "fy": 30.0, "cx": 19.5,
                   "cy": 14.5, "png_depth_scale": 6553.5, "crop_edge": 4},
           "data": {"input_folder": fake_replica}}
    ds = get_dataset(cfg)
    color, depth, _ = ds[0]
    assert color.shape == (22, 32, 3) and depth.shape == (22, 32)


def test_scannet_loader(tmp_path):
    base = tmp_path / "scene"
    for sub in ["color", "depth", "pose"]:
        (base / sub).mkdir(parents=True)
    H, W = 24, 32
    rng = np.random.default_rng(1)
    for i in range(3):
        cv2.imwrite(str(base / "color" / f"{i}.jpg"),
                    (rng.random((H, W, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(base / "depth" / f"{i}.png"),
                    (rng.random((H, W)) * 1000).astype(np.uint16))
        c2w = np.eye(4)
        c2w[0, 3] = i
        with open(base / "pose" / f"{i}.txt", "w") as f:
            for row in c2w:
                f.write(" ".join(str(v) for v in row) + "\n")
    cfg = {"dataset": "scannet",
           "cam": {"H": H, "W": W, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                   "cy": 11.5, "png_depth_scale": 1000.0, "crop_edge": 2},
           "data": {"input_folder": str(base)}}
    ds = get_dataset(cfg)
    assert len(ds) == 3
    color, depth, pose = ds[2]
    assert color.shape == (20, 28, 3)
    assert pose[0, 3] == 2.0


def test_tum_loader(tmp_path):
    base = tmp_path / "tum"
    (base / "rgb").mkdir(parents=True)
    (base / "depth").mkdir()
    H, W = 24, 32
    rng = np.random.default_rng(2)
    rgb_lines, depth_lines, gt_lines = [], [], ["# header"]
    for i in range(3):
        t = 100.0 + i * 0.1
        cv2.imwrite(str(base / "rgb" / f"{t:.1f}.png"),
                    (rng.random((H, W, 3)) * 255).astype(np.uint8))
        cv2.imwrite(str(base / "depth" / f"{t:.1f}.png"),
                    (rng.random((H, W)) * 5000).astype(np.uint16))
        rgb_lines.append(f"{t} rgb/{t:.1f}.png")
        depth_lines.append(f"{t} depth/{t:.1f}.png")
        gt_lines.append(f"{t} {i*0.1} 0 0 0 0 0 1")  # tx ty tz qx qy qz qw
    (base / "rgb.txt").write_text("\n".join(rgb_lines))
    (base / "depth.txt").write_text("\n".join(depth_lines))
    (base / "groundtruth.txt").write_text("\n".join(gt_lines))
    cfg = {"dataset": "tumrgbd",
           "cam": {"H": H, "W": W, "fx": 20.0, "fy": 20.0, "cx": 15.5,
                   "cy": 11.5, "png_depth_scale": 5000.0, "crop_edge": 0},
           "data": {"input_folder": str(base)}}
    ds = get_dataset(cfg)
    assert len(ds) == 3
    color, depth, pose = ds[0]
    # first pose is origin (inv_pose normalization)
    np.testing.assert_allclose(pose[:3, 3], 0, atol=1e-6)
    _, _, pose1 = ds[1]
    np.testing.assert_allclose(pose1[0, 3], 0.1, atol=1e-6)
