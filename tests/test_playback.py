"""Live observability feed + playback rendering (utils/playback.py).

The reference's live viewer is an interactive open3d GUI fed over an
mp.Queue (visualizer_util.py:26-230); ours is a file-based feed any process
can poll. These tests cover the feed protocol (atomic write, snapshot
selection) and the headless render path end-to-end.
"""

import os

import numpy as np

from unislam_tpu.utils import mesh_io, playback


def _tet_mesh(path, scale=1.0):
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1]],
                     np.float32) * scale
    faces = np.array([[0, 1, 2], [0, 1, 3], [0, 2, 3], [1, 2, 3]], np.int32)
    mesh_io.write_ply(path, verts, faces)
    return verts, faces


def test_live_state_roundtrip(tmp_path):
    out = str(tmp_path)
    os.makedirs(f"{out}/mesh")
    _tet_mesh(f"{out}/mesh/00004_mesh.ply")
    est = np.tile(np.eye(4, dtype=np.float32), (10, 1, 1))
    est[:, 0, 3] = np.linspace(0, 1, 10)
    gt = est.copy()

    playback.write_live_state(out, 6, 10, est, gt)
    st = playback.read_live_state(out)
    assert st["frame"] == 6 and st["n_img"] == 10 and not st["done"]
    assert len(st["est_t"]) == 7          # trajectory up to current frame
    assert st["mesh"].endswith("00004_mesh.ply")
    assert np.allclose(st["cur_c2w"], est[6], atol=1e-4)

    playback.write_live_state(out, 9, 10, est, gt)
    assert playback.read_live_state(out)["done"]

    assert playback.read_live_state(str(tmp_path / "nowhere")) is None


def test_mesh_snapshot_selection(tmp_path):
    mesh_dir = str(tmp_path / "mesh")
    os.makedirs(mesh_dir)
    _tet_mesh(f"{mesh_dir}/00004_mesh.ply")
    _tet_mesh(f"{mesh_dir}/00008_mesh.ply")
    _tet_mesh(f"{mesh_dir}/00008_mesh_culled.ply")  # must be ignored

    pick = playback.mesh_snapshot_for_frame
    assert pick(mesh_dir, 5).endswith("00004_mesh.ply")
    assert pick(mesh_dir, 8).endswith("00008_mesh.ply")
    assert pick(mesh_dir, 100).endswith("00008_mesh.ply")
    # before the first snapshot: falls back to the newest
    assert pick(mesh_dir, 2).endswith("00008_mesh.ply")
    assert playback.newest_mesh(str(tmp_path / "none")) is None


def test_render_view_and_follow_live(tmp_path):
    out = str(tmp_path)
    os.makedirs(f"{out}/mesh")
    verts, faces = _tet_mesh(f"{out}/mesh/00002_mesh.ply", scale=2.0)
    est = np.tile(np.eye(4, dtype=np.float32), (4, 1, 1))
    est[:, 2, 3] = np.linspace(3, 4, 4)
    gt = est.copy()

    png = playback.render_view(f"{out}/view.png", verts, faces,
                               est[:, :3, 3], gt[:, :3, 3], est[-1], 3, 4)
    assert os.path.getsize(png) > 1000

    # live follower: state says done -> one render pass, then exit
    playback.write_live_state(out, 3, 4, est, gt)
    rendered = playback.follow_live(out, poll_s=0.01, once=True)
    assert len(rendered) == 1 and os.path.exists(rendered[0])
