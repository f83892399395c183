"""Two-pass LOD-contract meshing: band-gated mapping leaves fine levels
untrained off-band; the mesher must not turn that noise into floaters.

The field probes are stubbed directly (the real-field end-to-end evidence
is the room0-scale run, BENCHLOG round 3: observed-accuracy 9.36 -> 1.03 cm
from this fix): the coarse probe sees a clean sphere, the full-ladder probe
adds junk zero-crossings in free space. Single-pass meshing hallucinates
the junk; two-pass (fine queries gated by the coarse band) must not."""

import numpy as np

from unislam_tpu.data.synthetic import SyntheticRoom, make_config
from unislam_tpu.models import brick_encoding as be
from unislam_tpu.models import scene as scene_lib
from unislam_tpu.utils import mesh_io
from unislam_tpu.utils.mesher import Mesher


def _cfg(two_pass):
    ds = SyntheticRoom(n_frames=2)
    cfg = make_config(ds, {
        "rendering": {"n_fine": 8, "lod_split": "hashed"},
        "meshing": {"resolution": 0.04, "lod_two_pass": two_pass},
        "grid": {"encoding": "brick", "brick_levels": 3,
                 "brick_base_res": 16, "brick_features": 4,
                 "brick_hash_size": 10, "brick_matmul_rows": 1024,
                 "brick_matmul_hashed": 0},
    })
    return ds, cfg


CENTER = np.array([0.1, -0.2, 0.0], np.float32)
R_SPH = 0.55


def _sphere_sdf(pts):
    # tanh-ish clamp like the trained field
    return np.tanh((np.linalg.norm(pts - CENTER, axis=-1) - R_SPH) / 0.06)


def _junk_sdf(pts):
    """Sphere + phantom blobs in free space (the untrained-fine junk)."""
    s = _sphere_sdf(pts)
    for c in ([0.9, 0.9, 0.9], [-0.9, 0.6, -0.8], [0.0, 0.95, 0.0]):
        s = np.minimum(
            s, np.tanh((np.linalg.norm(pts - np.asarray(c, np.float32),
                                       axis=-1) - 0.12) / 0.06))
    return s


def _stubbed_mesher(two_pass, tmp_path):
    ds, cfg = _cfg(two_pass)
    sc = scene_lib.make_scene_config(cfg)
    from unislam_tpu.core.rays import Intrinsics
    m = Mesher(cfg, sc, Intrinsics(40, 40, 35.0, 35.0, 19.5, 19.5),
               points_batch_size=50_000)

    def eval_points(pts, params, sdf_only=False, coarse=False):
        pts = np.asarray(pts, np.float32)
        if sdf_only:
            return (_sphere_sdf(pts) if coarse else _junk_sdf(pts)) \
                .astype(np.float32)
        out = np.zeros((len(pts), 4), np.float32)
        out[:, 3] = _junk_sdf(pts)
        out[:, :3] = 0.5
        return out

    m.eval_points = eval_points
    out = str(tmp_path / f"mesh_{two_pass}.ply")
    assert m.get_mesh(out, params=None, bank=None) is not None
    v, _, _ = mesh_io.read_ply(out)
    dist = np.abs(np.linalg.norm(v - CENTER, axis=-1) - R_SPH)
    return float((dist > 0.08).mean()), len(v)


def test_two_pass_activation_flags():
    _, cfg = _cfg(True)
    sc = scene_lib.make_scene_config(cfg)
    from unislam_tpu.core.rays import Intrinsics
    intr = Intrinsics(40, 40, 35.0, 35.0, 19.5, 19.5)
    assert Mesher(cfg, sc, intr)._lod_two_pass is True
    cfg2 = dict(cfg, rendering=dict(cfg["rendering"], n_fine=0))
    assert Mesher(cfg2, sc, intr)._lod_two_pass is False  # LOD off
    cfg3 = dict(cfg, meshing=dict(cfg["meshing"], lod_two_pass=False))
    assert Mesher(cfg3, sc, intr)._lod_two_pass is False  # explicit off


def test_two_pass_mesher_suppresses_off_band_junk(tmp_path):
    frac_single, n_single = _stubbed_mesher(False, tmp_path)
    frac_two, n_two = _stubbed_mesher(True, tmp_path)
    assert frac_single > 0.05, "junk blobs must show up in single-pass"
    assert frac_two < 0.01, f"two-pass mesh still has {frac_two:.1%} junk"
    assert n_two > 1000  # the sphere itself survives


def test_hierarchical_hash_meshing_matches_dense(tmp_path):
    """Hash-mode hierarchical two-pass (VERDICT r3 weak #4): the strided
    coarse sweep + near-band refinement must query far fewer points than
    the dense sweep while producing the same surface."""
    from unislam_tpu.core.rays import Intrinsics

    ds = SyntheticRoom(n_frames=2)
    counted = {"pts": 0}

    def run(hierarchical):
        # resolution chosen so the grid crosses the >=2M-point threshold
        # below which the mesher always uses the dense sweep
        cfg = make_config(ds, {
            "meshing": {"resolution": 0.0125, "hierarchical": hierarchical},
        })
        sc = scene_lib.make_scene_config(cfg)
        assert sc.encoding != "brick"
        m = Mesher(cfg, sc, Intrinsics(40, 40, 35.0, 35.0, 19.5, 19.5),
                   points_batch_size=50_000)
        if hierarchical:
            assert m._hier_two_pass and m._hier_stride >= 2

        counted["pts"] = 0

        def eval_points(pts, params, sdf_only=False, coarse=False):
            pts = np.asarray(pts, np.float32)
            counted["pts"] += len(pts)
            if sdf_only:
                return _sphere_sdf(pts).astype(np.float32)
            out = np.zeros((len(pts), 4), np.float32)
            out[:, 3] = _sphere_sdf(pts)
            out[:, :3] = 0.5
            return out

        m.eval_points = eval_points
        out = str(tmp_path / f"mesh_h{hierarchical}.ply")
        assert m.get_mesh(out, params=None, bank=None) is not None
        v, f, _ = mesh_io.read_ply(out)
        return v, f, counted["pts"]

    v_h, f_h, n_h = run(True)
    v_d, f_d, n_d = run(False)

    # >=3x fewer SDF queries (sphere surface is a small fraction of volume)
    assert n_h < n_d / 3, (n_h, n_d)
    # same surface: every hierarchical vertex on the analytic sphere, and
    # the mesh has the same scale of geometry as the dense one
    dist = np.abs(np.linalg.norm(v_h - CENTER, axis=-1) - R_SPH)
    assert float(dist.max()) < 0.04, float(dist.max())
    assert abs(len(f_h) - len(f_d)) < 0.02 * len(f_d), (len(f_h), len(f_d))
