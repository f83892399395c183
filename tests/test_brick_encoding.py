"""TPU-native brick encoding: interpolation correctness, continuity,
gradients, and end-to-end quality parity with the hash path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unislam_tpu.models import brick_encoding as be


def small_spec():
    return be.make_spec(n_levels=3, n_features=2, log2_hashmap_size=9,
                        base_resolution=8, desired_resolution=64)


def test_spec_structure():
    spec = be.make_spec(n_levels=4, n_features=8, log2_hashmap_size=16,
                        desired_resolution=816)
    assert spec.out_dim == 32
    assert spec.row_dim == 27 * 8
    assert spec.resolutions[0] == 16 and spec.resolutions[-1] == 816
    assert not spec.hashed[0]          # coarse bricks dense
    assert spec.hashed[-1]             # fine bricks hashed
    assert (np.diff(spec.row_offsets) > 0).all()


def test_constant_table_constant_output():
    spec = small_spec()
    table = jnp.full((spec.total_rows, spec.row_dim), 0.5)
    pts = jax.random.uniform(jax.random.PRNGKey(0), (64, 3))
    out = np.asarray(be.encode(table, pts, spec))
    np.testing.assert_allclose(out, 0.5, atol=1e-6)


def test_interpolation_is_trilinear_within_cell():
    """Inside one cell the encoding must be exactly trilinear: check
    midpoint = mean of the 8 corner evaluations."""
    spec = be.make_spec(n_levels=1, n_features=1, log2_hashmap_size=12,
                        base_resolution=9, desired_resolution=9)
    table = jax.random.normal(jax.random.PRNGKey(1),
                              (spec.total_rows, spec.row_dim))
    res = float(spec.resolutions[0])
    # pick cell (2,2,2): vertices at lattice coords /(res-1)
    def at(xyz):
        return float(be.encode(table, jnp.asarray([xyz]) / (res - 1),
                               spec)[0, 0])

    corners = [at([2 + dx, 2 + dy, 2 + dz])
               for dx in (0, 1) for dy in (0, 1) for dz in (0, 1)]
    mid = at([2.5, 2.5, 2.5])
    np.testing.assert_allclose(mid, np.mean(corners), rtol=1e-5)
    # linear along an edge
    q = at([2.25, 2.0, 2.0])
    np.testing.assert_allclose(q, 0.75 * corners[0] + 0.25 * corners[4],
                               rtol=1e-5)


def test_continuity_inside_brick():
    """Crossing a cell boundary *within* a brick must be continuous."""
    spec = be.make_spec(n_levels=1, n_features=2, log2_hashmap_size=12,
                        base_resolution=17, desired_resolution=17)
    table = jax.random.normal(jax.random.PRNGKey(2),
                              (spec.total_rows, spec.row_dim))
    res = float(spec.resolutions[0])
    # cells 4 and 5 share brick 2 (cells [4,6)); boundary at vertex 5
    eps = 1e-4
    lo = be.encode(table, jnp.asarray([[5 - eps, 3.3, 3.3]]) / (res - 1), spec)
    hi = be.encode(table, jnp.asarray([[5 + eps, 3.3, 3.3]]) / (res - 1), spec)
    np.testing.assert_allclose(np.asarray(lo), np.asarray(hi), atol=1e-3)


def test_gradients_flow_to_table_and_points():
    spec = small_spec()
    table = be.init_table(jax.random.PRNGKey(0), spec)
    pts = jax.random.uniform(jax.random.PRNGKey(1), (32, 3))

    g_t = jax.grad(lambda t: jnp.sum(be.encode(t, pts, spec) ** 2))(table)
    assert np.isfinite(np.asarray(g_t)).all()
    assert (np.abs(np.asarray(g_t)) > 0).any()
    # at most one row per point per level receives gradient
    touched = (np.abs(np.asarray(g_t)) > 0).any(axis=1).sum()
    assert touched <= 32 * spec.n_levels

    g_p = jax.grad(lambda p: jnp.sum(be.encode(table, p, spec) ** 2))(pts)
    assert np.isfinite(np.asarray(g_p)).all()


def test_matmul_levels_ladder_snap():
    """With a matmul budget, level 1 snaps to the largest res whose dense
    brick count fits, and the tail re-spreads geometrically."""
    spec = be.make_spec(n_levels=4, n_features=8, log2_hashmap_size=16,
                        desired_resolution=816, matmul_max_rows=4096)
    assert spec.resolutions[0] == 16 and spec.resolutions[-1] == 816
    assert spec.resolutions[1] == 32            # 16^3 = 4096 bricks
    assert spec.matmul[0] and spec.matmul[1]
    assert not spec.matmul[2] and not spec.matmul[3]
    assert spec.level_rows[1] == 4096


def test_matmul_matches_gather():
    """The one-hot MXU lookup must agree with the gather path up to bf16
    rounding of the table rows."""
    spec_mm = be.make_spec(n_levels=3, n_features=2, log2_hashmap_size=12,
                           base_resolution=8, desired_resolution=64,
                           matmul_max_rows=512)
    assert spec_mm.matmul.any() and not spec_mm.matmul.all()
    spec_g = spec_mm._replace(matmul=np.zeros(spec_mm.n_levels, bool))
    table = jax.random.normal(jax.random.PRNGKey(3),
                              (spec_mm.total_rows, spec_mm.row_dim))
    pts = jax.random.uniform(jax.random.PRNGKey(4), (128, 3))
    out_mm = np.asarray(be.encode(table, pts, spec_mm))
    out_g = np.asarray(be.encode(table, pts, spec_g))
    np.testing.assert_allclose(out_mm, out_g, atol=2e-2, rtol=2e-2)

    # gradients flow through the matmul path to table and points
    g_t = jax.grad(lambda t: jnp.sum(be.encode(t, pts, spec_mm) ** 2))(table)
    assert np.isfinite(np.asarray(g_t)).all()
    mm_lo = int(spec_mm.row_offsets[0])
    mm_hi = int(spec_mm.row_offsets[1])
    assert (np.abs(np.asarray(g_t[mm_lo:mm_hi])) > 0).any()
    g_p = jax.grad(lambda p: jnp.sum(be.encode(table, p, spec_mm) ** 2))(pts)
    assert np.isfinite(np.asarray(g_p)).all() and \
        (np.abs(np.asarray(g_p)) > 0).any()


def test_custom_vjp_matches_autodiff():
    """encode's hand-written backward must equal plain autodiff of the same
    forward (checked for both the gather-only and mixed matmul specs)."""
    for mm in (0, 512):
        spec = be.make_spec(n_levels=3, n_features=2, log2_hashmap_size=10,
                            base_resolution=8, desired_resolution=64,
                            matmul_max_rows=mm)
        table = jax.random.normal(jax.random.PRNGKey(5),
                                  (spec.total_rows, spec.row_dim))
        pts = jax.random.uniform(jax.random.PRNGKey(6), (64, 3),
                                 minval=0.02, maxval=0.98)
        cot = jax.random.normal(jax.random.PRNGKey(7), (64, spec.out_dim))

        def loss_custom(t, p):
            return jnp.sum(be.encode(t, p, spec) * cot)

        def loss_auto(t, p):
            return jnp.sum(be._encode_fwd(t, p, spec, be.all_levels(spec))[0] * cot)

        gt_c, gp_c = jax.grad(loss_custom, argnums=(0, 1))(table, pts)
        gt_a, gp_a = jax.grad(loss_auto, argnums=(0, 1))(table, pts)
        # g_rows are materialized in bf16 by design (round 2: halves the
        # scatter-input HBM traffic), so the custom VJP differs from f32
        # autodiff at bf16 resolution (~8e-3 worst case). The points
        # cotangent additionally contracts bf16 rows x bf16 g directly
        # (round 3: avoids an 87 MB f32 materialization per mapping iter),
        # so its error is bf16-product scale: ~1% relative.
        tol = 1e-2 if mm == 0 else 3e-2
        np.testing.assert_allclose(np.asarray(gt_c), np.asarray(gt_a),
                                   atol=tol, rtol=tol)
        np.testing.assert_allclose(np.asarray(gp_c), np.asarray(gp_a),
                                   atol=tol * 30, rtol=2e-2)


def test_scene_integration_brick_mode():
    from unislam_tpu.models import scene as scene_lib
    cfg = {
        "scale": 1,
        "planes_res": {"bound_dividable": 0.24},
        "mapping": {"bound": [[-1, 1], [-1, 1], [-1, 1]]},
        "grid": {"hash_size_sdf": 10, "hash_size_color": 10,
                 "voxel_sdf": 0.05, "voxel_color": 0.05,
                 "encoding": "brick", "brick_levels": 3,
                 "brick_features": 4, "brick_hash_size": 10},
        "model": {"truncation": 0.06, "c_dim": 32},
        "rendering": {"learnable_beta": True},
    }
    sc = scene_lib.make_scene_config(cfg)
    assert sc.encoding == "brick" and sc.brick_spec is not None
    params = scene_lib.init_params(jax.random.PRNGKey(0), sc)
    assert "table" in params and "sdf_table" not in params
    out = scene_lib.query(params, sc, jax.random.uniform(
        jax.random.PRNGKey(1), (50, 3)))
    assert out.shape == (50, 4)
    assert np.isfinite(np.asarray(out)).all()

    g = jax.grad(lambda p: jnp.sum(
        scene_lib.query(p, sc, jax.random.uniform(
            jax.random.PRNGKey(2), (50, 3))) ** 2))(params)
    flat = np.concatenate([np.asarray(x).ravel()
                           for x in jax.tree_util.tree_leaves(g)])
    assert np.isfinite(flat).all() and (np.abs(flat) > 0).any()


@pytest.mark.slow
def test_brick_slam_quality_parity():
    """E2E SLAM with the brick encoding must match the hash path's quality
    on the synthetic room (the TPU-native performance mode is not allowed to
    regress accuracy)."""
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine.slam import UniSLAM
    from unislam_tpu.tools.eval_ate import evaluate_ate

    ds = SyntheticRoom(n_frames=9,
                       intr=Intrinsics(H=40, W=52, fx=45.0, fy=45.0,
                                       cx=25.5, cy=19.5),
                       deg_per_frame=1.5)
    cfg = make_config(ds, {
        "tracking": {"pixels": 600, "iters": 16, "ignore_edge_W": 3,
                     "ignore_edge_H": 3, "lr_T": 0.01, "lr_R": 0.004},
        "mapping": {"pixels": 800, "iters": 8, "iters_first": 25,
                    "every_frame": 2, "keyframe_every": 2},
        "rendering": {"n_stratified": 16, "n_importance": 4},
        "grid": {"encoding": "brick", "brick_levels": 3,
                 "brick_features": 8, "brick_hash_size": 12},
    })
    slam = UniSLAM(cfg, ds, seed=0)
    slam.run(progress=False)
    _, results = evaluate_ate(slam.gt_c2w[:, :3, 3], slam.est_c2w[:, :3, 3])
    assert results["error.rmse"] < 5.0, results


def test_matmul_hashed_level_matches_gather_lookup():
    """A hashed level served by one-hot MXU matmul must produce the same
    features and table gradient as the gather path on the same table."""
    # base_resolution chosen so the matmul ladder re-spread is a no-op and
    # both specs share the same ladder + table geometry
    kw = dict(n_levels=3, n_features=2, log2_hashmap_size=6,
              base_resolution=8, desired_resolution=64)
    spec_mm = be.make_spec(matmul_max_rows=64, matmul_hashed=1,
                           matmul_hashed_rows=64, **kw)
    spec_g = be.make_spec(matmul_max_rows=0, **kw)
    assert np.array_equal(spec_mm.resolutions, spec_g.resolutions)
    assert np.array_equal(spec_mm.level_rows, spec_g.level_rows)
    assert spec_mm.hashed[1] and spec_mm.matmul[1] and not spec_g.matmul[1]

    table = jax.random.normal(jax.random.PRNGKey(0),
                              (spec_g.total_rows, spec_g.row_dim))
    pts = jax.random.uniform(jax.random.PRNGKey(1), (40, 3))
    out_mm = np.asarray(be.encode(table, pts, spec_mm))
    out_g = np.asarray(be.encode(table, pts, spec_g))
    np.testing.assert_allclose(out_mm, out_g, rtol=5e-2, atol=5e-3)

    g_mm = jax.grad(lambda t: jnp.sum(be.encode(t, pts, spec_mm) ** 2))(table)
    g_g = jax.grad(lambda t: jnp.sum(be.encode(t, pts, spec_g) ** 2))(table)
    np.testing.assert_allclose(np.asarray(g_mm), np.asarray(g_g),
                               rtol=5e-2, atol=5e-3)


def test_dedup_rows_exact_merge():
    """_dedup_rows merges consecutive same-index runs exactly and drops
    only the overflow runs past Ku."""
    R, K, D = 3, 6, 4
    idx = jnp.asarray([[5, 5, 9, 9, 9, 2],     # 3 runs
                       [7, 7, 7, 7, 7, 7],     # 1 run
                       [1, 2, 3, 4, 5, 6]])    # 6 runs -> overflow at Ku=3
    g = jnp.arange(R * K * D, dtype=jnp.float32).reshape(R * K, D)
    idx_u, g_u = be._dedup_rows(idx.reshape(-1), g, R, K, Ku=3)
    idx_u = np.asarray(idx_u).reshape(R, 3)
    g_u = np.asarray(g_u).reshape(R, 3, D)
    g3 = np.asarray(g).reshape(R, K, D)

    assert idx_u[0].tolist() == [5, 9, 2]
    np.testing.assert_allclose(g_u[0, 0], g3[0, 0] + g3[0, 1])
    np.testing.assert_allclose(g_u[0, 1], g3[0, 2:5].sum(0))
    np.testing.assert_allclose(g_u[0, 2], g3[0, 5])
    # unused slots: whatever index they carry, their update must be 0
    assert idx_u[1, 0] == 7
    np.testing.assert_allclose(g_u[1, 0], g3[1].sum(0))
    np.testing.assert_allclose(g_u[1, 1:], 0.0)
    # ray 2: 6 distinct rows, capacity 3 -> farthest 3 dropped
    assert idx_u[2].tolist() == [1, 2, 3]
    np.testing.assert_allclose(g_u[2], g3[2, :3])

    # full scatter equivalence when capacity suffices
    idx_u6, g_u6 = be._dedup_rows(idx.reshape(-1), g, R, K, Ku=6)
    dense_ref = np.zeros((10, D), np.float32)
    np.add.at(dense_ref, np.asarray(idx).reshape(-1), np.asarray(g))
    dense_dd = np.zeros((10, D), np.float32)
    np.add.at(dense_dd, np.asarray(idx_u6), np.asarray(g_u6))
    np.testing.assert_allclose(dense_dd, dense_ref, rtol=1e-6)


def test_query_lod_dedup_matches_exact():
    """query_lod with dedup_band: identical forward, matching table/point
    gradients when per-ray band bricks fit the dedup capacity (short bands
    on a coarse ladder guarantee it here)."""
    from unislam_tpu.models import scene as scene_lib

    spec = be.make_spec(n_levels=3, n_features=2, log2_hashmap_size=9,
                        base_resolution=8, desired_resolution=64)
    sc = scene_lib.SceneConfig(
        sdf_spec=None, color_spec=None,
        bound=np.asarray([[0, 1], [0, 1], [0, 1]], np.float32),
        truncation=0.06, encoding="brick", brick_spec=spec)
    params = scene_lib.init_params(jax.random.PRNGKey(0), sc)

    R, S, K = 16, 10, 6
    key = jax.random.PRNGKey(1)
    o = jax.random.uniform(key, (R, 1, 3), minval=0.3, maxval=0.7)
    d = jax.random.normal(jax.random.PRNGKey(2), (R, 1, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    t = jnp.linspace(0.0, 0.04, S)[None, :, None]   # short z-ordered band
    p_nor = jnp.clip(o + d * t, 0.0, 1.0)
    sel_idx = jnp.tile(jnp.asarray([1, 2, 4, 5, 7, 8])[None], (R, 1))
    sel = sel_idx[..., None] == jnp.arange(S)[None, None, :]

    def loss(params, dd):
        out = scene_lib.query_lod(params, sc, p_nor, sel, n_mid=3,
                                  dedup=dd)
        return jnp.sum(out * out), out

    (l0, out0), g0 = jax.value_and_grad(loss, has_aux=True)(params, 0.0)
    (l1, out1), g1 = jax.value_and_grad(loss, has_aux=True)(params, 1.0)
    np.testing.assert_allclose(np.asarray(out1), np.asarray(out0),
                               rtol=1e-5, atol=1e-6)
    np.testing.assert_allclose(np.asarray(g1["table"]),
                               np.asarray(g0["table"]),
                               rtol=2e-2, atol=2e-6)
    # pose/points path sanity: decoders' grads equal too
    for k in ("sdf_mlp", "color_mlp"):
        for a, b in zip(jax.tree_util.tree_leaves(g1[k]),
                        jax.tree_util.tree_leaves(g0[k])):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                       rtol=1e-4, atol=1e-6)
