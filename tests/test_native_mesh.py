"""Native library (marching tetrahedra, rasterizer, frustum) + mesh IO +
mesher + reconstruction metrics."""

import os

import numpy as np
import pytest

from unislam_tpu.native.lib import (frustum_visibility, marching_tetrahedra,
                                    rasterize_depth)
from unislam_tpu.utils import mesh_io


def sphere_grid(n=48, r=0.6):
    x = np.linspace(-1, 1, n, dtype=np.float32)
    X, Y, Z = np.meshgrid(x, x, x, indexing="ij")
    return np.sqrt(X ** 2 + Y ** 2 + Z ** 2) - r


def sphere_mesh(n=48, r=0.6):
    sdf = sphere_grid(n, r)
    vi, faces = marching_tetrahedra(sdf, 0.0)
    return vi / (n - 1) * 2 - 1, faces


def test_marching_sphere_geometry():
    verts, faces = sphere_mesh()
    rad = np.linalg.norm(verts, axis=1)
    assert abs(rad.mean() - 0.6) < 2e-3 and rad.std() < 2e-3
    v0, v1, v2 = (verts[faces[:, i]] for i in range(3))
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=1).sum()
    assert abs(area - 4 * np.pi * 0.36) / (4 * np.pi * 0.36) < 0.01
    # consistent outward orientation
    nrm = np.cross(v1 - v0, v2 - v0)
    ctr = (v0 + v1 + v2) / 3
    assert ((nrm * ctr).sum(axis=1) > 0).all()


def test_marching_watertight():
    _, faces = sphere_mesh(n=24)
    import collections
    edges = collections.Counter()
    for f in faces:
        for a, b in [(f[0], f[1]), (f[1], f[2]), (f[2], f[0])]:
            edges[(min(a, b), max(a, b))] += 1
    assert set(edges.values()) == {2}


def test_rasterizer_matches_analytic_sphere():
    verts, faces = sphere_mesh(n=64)
    c2w = np.eye(4)
    c2w[2, 3] = 1.5
    H, W, fx, fy, cx, cy = 48, 64, 60.0, 60.0, 31.5, 23.5
    d = rasterize_depth(verts, faces, np.linalg.inv(c2w), fx, fy, cx, cy, W,
                        H)
    assert abs(d[24, 32] - 0.9) < 5e-3
    j, i = np.meshgrid(np.arange(H), np.arange(W), indexing="ij")
    dirs = np.stack([(i - cx) / fx, -(j - cy) / fy,
                     -np.ones_like(i, dtype=float)], -1)
    o = np.array([0, 0, 1.5])
    b = (o * dirs).sum(-1)
    disc = b * b - (o @ o - 0.36) * (dirs * dirs).sum(-1)
    t = np.where(disc > 0,
                 (-b - np.sqrt(np.maximum(disc, 0))) / (dirs * dirs).sum(-1),
                 0)
    hit = d > 0
    assert hit.sum() == (disc > 0).sum()
    assert np.abs(d[hit] - t[hit]).mean() < 2e-3


def test_frustum_visibility_depth_consistency():
    pts = np.array([[0, 0, -1.0], [0, 0, -3.0]], np.float32)
    depth = np.full((48, 64), 1.0, np.float32)  # surface at depth 1
    m = frustum_visibility(pts, np.eye(4), 60, 60, 31.5, 23.5, 64, 48,
                           depth_img=depth, trunc=0.1)
    # point at depth 1 is on the surface: visible; at 3 it is occluded
    assert m[0] and not m[1]


def test_ply_roundtrip(tmp_path):
    verts, faces = sphere_mesh(n=16)
    colors = np.random.default_rng(0).random((len(verts), 3)).astype(
        np.float32)
    p = str(tmp_path / "m.ply")
    mesh_io.write_ply(p, verts, faces, colors)
    v2, f2, c2 = mesh_io.read_ply(p)
    np.testing.assert_allclose(v2, verts, atol=1e-6)
    np.testing.assert_array_equal(f2, faces)
    np.testing.assert_allclose(c2.astype(np.float32) / 255, colors, atol=0.5 / 255 * 2)


def test_remove_unreferenced():
    verts = np.arange(15, dtype=np.float32).reshape(5, 3)
    faces = np.array([[0, 2, 4]])
    v, f, _ = mesh_io.remove_unreferenced(verts, faces)
    assert len(v) == 3
    np.testing.assert_array_equal(f, [[0, 1, 2]])
    np.testing.assert_allclose(v, verts[[0, 2, 4]])


def test_3d_metrics_identical_and_offset(tmp_path):
    from unislam_tpu.tools import eval_recon
    verts, faces = sphere_mesh(n=32)
    a = str(tmp_path / "a.ply")
    b = str(tmp_path / "b.ply")
    mesh_io.write_ply(a, verts, faces)
    mesh_io.write_ply(b, verts + 0.05, faces)
    res = eval_recon.calc_3d_metric(a, a, align=False, num_points=20000)
    assert res["accuracy"] < 0.1 and res["completion"] < 0.1
    assert res["completion ratio"] > 99.0
    # 5cm offset -> ICP alignment recovers it
    res2 = eval_recon.calc_3d_metric(b, a, align=True, num_points=20000)
    assert res2["accuracy"] < 0.5, res2


def test_2d_metric_identical(tmp_path):
    from unislam_tpu.tools import eval_recon
    verts, faces = sphere_mesh(n=32)
    verts = verts * 2.0  # bigger so cameras inside bbox see it
    a = str(tmp_path / "a.ply")
    mesh_io.write_ply(a, verts, faces)
    res = eval_recon.calc_2d_metric(a, a, align=False, n_imgs=4)
    assert res["Depth L1: "] < 1e-3


def test_ms_ssim_sanity():
    from unislam_tpu.tools.eval_recon import ms_ssim
    rng = np.random.default_rng(0)
    img = rng.random((180, 240, 3))
    assert ms_ssim(img, img) > 0.999
    noisy = np.clip(img + rng.normal(0, 0.2, img.shape), 0, 1)
    v = ms_ssim(img, noisy)
    assert 0.0 < v < 0.99
