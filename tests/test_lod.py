"""Surface-LOD query tests: level-subset encode, query_lod equivalences,
and the renderer's n_fine path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from unislam_tpu.models import brick_encoding as be
from unislam_tpu.models import decoders, scene as scene_lib
from unislam_tpu.render import renderer


def _scene(n_fine_levels_hashed=True):
    spec = be.make_spec(n_levels=3, n_features=4, log2_hashmap_size=6,
                        base_resolution=4, desired_resolution=64,
                        matmul_max_rows=64)
    bound = np.asarray([[-1.0, 1.0]] * 3, np.float32)
    sc = scene_lib.SceneConfig(
        sdf_spec=None, color_spec=None, bound=bound, truncation=0.1,
        c_dim=spec.out_dim, encoding="brick", brick_spec=spec)
    params = {
        "table": be.init_table(jax.random.PRNGKey(0), spec) * 1e3,
        "sdf_mlp": decoders.init_mlp(jax.random.PRNGKey(1), spec.out_dim,
                                     16, 1, 2),
        "color_mlp": decoders.init_mlp(jax.random.PRNGKey(2), spec.out_dim,
                                       16, 3, 2),
        "beta": jnp.full((1,), 10.0),
    }
    return sc, params


def test_level_subset_matches_full():
    sc, params = _scene()
    spec = sc.brick_spec
    pts = jax.random.uniform(jax.random.PRNGKey(3), (50, 3))
    full = be.encode(params["table"], pts, spec)
    F = spec.n_features
    for levels in [(0,), (1, 2), (0, 2)]:
        sub = be.encode(params["table"], pts, spec, levels)
        want = np.concatenate(
            [np.asarray(full[:, l * F:(l + 1) * F]) for l in levels], axis=1)
        np.testing.assert_allclose(np.asarray(sub), want, rtol=1e-6)


def test_level_subset_grads_match_full():
    sc, params = _scene()
    spec = sc.brick_spec
    pts = jax.random.uniform(jax.random.PRNGKey(4), (30, 3))
    F = spec.n_features
    levels = (1, 2)

    def loss_sub(t, p):
        return jnp.sum(jnp.sin(be.encode(t, p, spec, levels)))

    def loss_full(t, p):
        out = be.encode(t, p, spec)
        sub = jnp.concatenate([out[:, l * F:(l + 1) * F] for l in levels],
                              axis=1)
        return jnp.sum(jnp.sin(sub))

    g1 = jax.grad(loss_sub, argnums=(0, 1))(params["table"], pts)
    g2 = jax.grad(loss_full, argnums=(0, 1))(params["table"], pts)
    np.testing.assert_allclose(np.asarray(g1[0]), np.asarray(g2[0]),
                               rtol=1e-5, atol=1e-8)
    np.testing.assert_allclose(np.asarray(g1[1]), np.asarray(g2[1]),
                               rtol=1e-5, atol=1e-6)


def test_query_lod_full_selection_matches_query():
    """With K = S (every sample selected) LOD must equal the plain query."""
    sc, params = _scene()
    R, S = 7, 6
    p_nor = jax.random.uniform(jax.random.PRNGKey(5), (R, S, 3))
    # identity selection: K = S, onehot = I
    sel = jnp.tile(jnp.eye(S)[None], (R, 1, 1))
    out_lod = scene_lib.query_lod(params, sc, p_nor, sel)
    out_ref = scene_lib.query(params, sc, p_nor.reshape(-1, 3)).reshape(
        R, S, 4)
    np.testing.assert_allclose(np.asarray(out_lod), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)


def test_query_lod_unselected_get_coarse_only():
    sc, params = _scene()
    spec = sc.brick_spec
    coarse, fine = be.coarse_fine_split(spec)
    assert fine, "test spec must have a hashed level"
    R, S, K = 3, 5, 2
    p_nor = jax.random.uniform(jax.random.PRNGKey(6), (R, S, 3))
    sel_idx = jnp.zeros((R, K), jnp.int32).at[:, 1].set(1)  # samples 0,1
    sel = (sel_idx[..., None] == jnp.arange(S)[None, None, :])
    out = scene_lib.query_lod(params, sc, p_nor, sel)

    # unselected sample -> features = coarse only -> equals a query where
    # fine levels are zero-filled
    feat_c = be.encode(params["table"], p_nor[0, 3][None], spec, coarse)
    feat = scene_lib._zero_fill_levels(feat_c, spec, coarse)
    sdf = decoders.mlp_apply(params["sdf_mlp"], feat, "tanh")[0, 0]
    np.testing.assert_allclose(float(out[0, 3, 3]), float(sdf), rtol=1e-5)

    # selected sample -> equals the full query
    full = scene_lib.query(params, sc, p_nor[0, 1][None])[0]
    np.testing.assert_allclose(np.asarray(out[0, 1]), np.asarray(full),
                               rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("with_depth", [True, False])
def test_render_lod_runs_and_finite(with_depth):
    sc, params = _scene()
    rc = renderer.RenderConfig(n_stratified=8, n_importance=4, perturb=True,
                               n_fine=5)
    R = 16
    key = jax.random.PRNGKey(7)
    d = jax.random.normal(key, (R, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    rays_o = jnp.zeros((R, 3))
    gt_depth = jnp.full((R,), 0.8) if with_depth else jnp.zeros((R,))
    out = renderer.render_rays(params, sc, rc, rays_o, rays_d, gt_depth, key)
    for leaf in out:
        assert np.all(np.isfinite(np.asarray(leaf)))

    # gradients flow to the table through the LOD path
    def loss(p):
        o = renderer.render_rays(p, sc, rc, rays_o, rays_d, gt_depth, key)
        return jnp.sum(o.rgb) + jnp.sum(o.depth)

    g = jax.grad(loss)(params)
    assert np.isfinite(np.asarray(g["table"])).all()
    assert float(jnp.abs(jnp.asarray(g["table"])).sum()) > 0


def _scene_mhash():
    """A spec with a matmul-hashed level so the two split modes differ:
    levels = [dense, dense, hashed+matmul, hashed+gather]."""
    spec = be.make_spec(n_levels=4, n_features=4, log2_hashmap_size=6,
                        base_resolution=4, desired_resolution=256,
                        matmul_max_rows=64, matmul_hashed=1,
                        matmul_hashed_rows=32)
    bound = np.asarray([[-1.0, 1.0]] * 3, np.float32)
    sc = scene_lib.SceneConfig(
        sdf_spec=None, color_spec=None, bound=bound, truncation=0.1,
        c_dim=spec.out_dim, encoding="brick", brick_spec=spec)
    params = {
        "table": be.init_table(jax.random.PRNGKey(0), spec) * 1e3,
        "sdf_mlp": decoders.init_mlp(jax.random.PRNGKey(1), spec.out_dim,
                                     16, 1, 2),
        "color_mlp": decoders.init_mlp(jax.random.PRNGKey(2), spec.out_dim,
                                       16, 3, 2),
        "beta": jnp.full((1,), 10.0),
    }
    return sc, params


def test_split_modes():
    sc, _ = _scene_mhash()
    spec = sc.brick_spec
    assert list(spec.hashed) == [False, False, True, True]
    assert list(spec.matmul)[2:] == [True, False]
    # cost split: matmul-hashed levels stay coarse (tracking-safe)
    assert be.coarse_fine_split(spec, "cost") == ((0, 1, 2), (3,))
    # hashed split: every hashed level is band-gated (mapping option)
    assert be.coarse_fine_split(spec, "hashed") == ((0, 1), (2, 3))


def test_query_lod_hashed_split_full_selection_matches_query():
    sc, params = _scene_mhash()
    R, S = 5, 4
    p_nor = jax.random.uniform(jax.random.PRNGKey(8), (R, S, 3))
    sel = jnp.tile(jnp.eye(S)[None], (R, 1, 1))
    out_lod = scene_lib.query_lod(params, sc, p_nor, sel, split="hashed")
    out_ref = scene_lib.query(params, sc, p_nor.reshape(-1, 3)).reshape(
        R, S, 4)
    np.testing.assert_allclose(np.asarray(out_lod), np.asarray(out_ref),
                               rtol=1e-5, atol=1e-6)


def test_render_hashed_split_runs_and_grads():
    sc, params = _scene_mhash()
    rc = renderer.RenderConfig(n_stratified=8, n_importance=4, perturb=True,
                               n_fine=5, lod_split="hashed")
    R = 12
    key = jax.random.PRNGKey(9)
    d = jax.random.normal(key, (R, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = renderer.render_rays(params, sc, rc, jnp.zeros((R, 3)), rays_d,
                               jnp.full((R,), 0.8), key)
    for leaf in out:
        assert np.all(np.isfinite(np.asarray(leaf)))

    def loss(p):
        o = renderer.render_rays(p, sc, rc, jnp.zeros((R, 3)), rays_d,
                                 jnp.full((R,), 0.8), key)
        return jnp.sum(o.rgb) + jnp.sum(o.depth)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(jnp.asarray(g["table"])).sum()) > 0


def test_degenerate_split_falls_back_to_full_query():
    """A spec whose cost split has NO fine levels: n_fine > 0 must be a
    no-op (exactly the full-ladder render), not a crash."""
    spec = be.make_spec(n_levels=2, n_features=4, log2_hashmap_size=6,
                        base_resolution=4, desired_resolution=8,
                        matmul_max_rows=64)
    assert be.coarse_fine_split(spec, "cost")[1] == ()
    bound = np.asarray([[-1.0, 1.0]] * 3, np.float32)
    sc = scene_lib.SceneConfig(
        sdf_spec=None, color_spec=None, bound=bound, truncation=0.1,
        c_dim=spec.out_dim, encoding="brick", brick_spec=spec)
    params = {
        "table": be.init_table(jax.random.PRNGKey(0), spec) * 1e3,
        "sdf_mlp": decoders.init_mlp(jax.random.PRNGKey(1), spec.out_dim,
                                     16, 1, 2),
        "color_mlp": decoders.init_mlp(jax.random.PRNGKey(2), spec.out_dim,
                                       16, 3, 2),
        "beta": jnp.full((1,), 10.0),
    }
    R = 9
    key = jax.random.PRNGKey(10)
    d = jax.random.normal(key, (R, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    args = (params, sc, jnp.zeros((R, 3)), rays_d, jnp.full((R,), 0.7), key)
    rc_lod = renderer.RenderConfig(n_stratified=8, n_importance=4,
                                   perturb=True, n_fine=5)
    rc_full = rc_lod._replace(n_fine=0)
    out_lod = renderer.render_rays(args[0], args[1], rc_lod, *args[2:])
    out_full = renderer.render_rays(args[0], args[1], rc_full, *args[2:])
    for a, b in zip(out_lod, out_full):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_split_mode_coarse_n():
    sc, _ = _scene_mhash()
    spec = sc.brick_spec
    assert be.coarse_fine_split(spec, "coarse2") == ((0, 1), (2, 3))
    assert be.coarse_fine_split(spec, "coarse3") == ((0, 1, 2), (3,))
    assert be.coarse_fine_split(spec, "coarse4") == ((0, 1, 2, 3), ())


def test_render_coarse_only_with_split_kw():
    """n_fine = -1 (coarse-to-fine tracking) with an explicit split mode —
    regression: query_coarse must accept the split kwarg."""
    sc, params = _scene_mhash()
    rc = renderer.RenderConfig(n_stratified=8, n_importance=4, perturb=True,
                               n_fine=-1, lod_split="coarse2")
    R = 8
    key = jax.random.PRNGKey(11)
    d = jax.random.normal(key, (R, 3))
    rays_d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    out = renderer.render_rays(params, sc, rc, jnp.zeros((R, 3)), rays_d,
                               jnp.full((R,), 0.8), key)
    for leaf in out:
        assert np.all(np.isfinite(np.asarray(leaf)))


def test_query_lod_field_selects_surface_band():
    """Field-guided selection must give fine detail to the samples where
    the coarse SDF crosses zero, and match query_lod given that onehot."""
    sc, params = _scene_mhash()
    R, S, K = 6, 10, 3
    p_nor = jax.random.uniform(jax.random.PRNGKey(12), (R, S, 3))
    out_f = scene_lib.query_lod_field(params, sc, p_nor, K, split="hashed")
    assert out_f.shape == (R, S, 4)
    assert np.all(np.isfinite(np.asarray(out_f)))

    # reproduce the selection by hand -> outputs must match query_lod
    from unislam_tpu.models import decoders as dec
    coarse, fine = be.coarse_fine_split(sc.brick_spec, "hashed")
    feat_c = be.encode(params["table"], p_nor.reshape(-1, 3), sc.brick_spec,
                       coarse)
    probe = scene_lib._zero_fill_levels(feat_c, sc.brick_spec, coarse)
    sdf_c = dec.mlp_apply(params["sdf_mlp"], probe, "tanh")[..., 0]
    sdf_c = np.asarray(sdf_c).reshape(R, S)
    sel_idx = np.argsort(np.abs(sdf_c), axis=1)[:, :K]
    # jax top_k ties/order may differ; compare against query_lod with the
    # exact onehot jax picked is overkill — instead check the invariant:
    # selected samples (fine features on) differ from a coarse-only query
    # only where |sdf_c| is among the K smallest
    out_plain = scene_lib.query_coarse(params, sc, p_nor.reshape(-1, 3),
                                       split="hashed").reshape(R, S, 4)
    diff = np.abs(np.asarray(out_f) - np.asarray(out_plain)).sum(-1)
    for r in range(R):
        changed = set(np.nonzero(diff[r] > 1e-6)[0].tolist())
        allowed = set(sel_idx[r].tolist())
        assert changed <= allowed, (r, changed, allowed)

    # gradients flow to the table through the field-selected path
    def loss(p):
        o = scene_lib.query_lod_field(p, sc, p_nor, K, split="hashed")
        return jnp.sum(o)

    g = jax.grad(loss)(params)
    assert float(jnp.abs(jnp.asarray(g["table"])).sum()) > 0


def test_query_lod_n_mid_band_semantics():
    """n_fine_mid: non-finest fine levels get only the n_mid FIRST selected
    samples (sel rows are ordered nearest-first by the renderer's top_k).
    - n_mid >= K (or 0) must reproduce the single-band path exactly;
    - with n_mid < K, the first n_mid selected samples still carry every
      fine level (match the full query), while later-selected samples lose
      only the mid levels (match a query with mid features zero-filled)."""
    # spec with TWO hashed (fine) levels: no matmul budget so the ladder
    # doesn't snap level 1 down to a dense level
    spec = be.make_spec(n_levels=3, n_features=4, log2_hashmap_size=6,
                        base_resolution=4, desired_resolution=64,
                        matmul_max_rows=0)
    bound = np.asarray([[-1.0, 1.0]] * 3, np.float32)
    sc = scene_lib.SceneConfig(
        sdf_spec=None, color_spec=None, bound=bound, truncation=0.1,
        c_dim=spec.out_dim, encoding="brick", brick_spec=spec)
    params = {
        "table": be.init_table(jax.random.PRNGKey(0), spec) * 1e3,
        "sdf_mlp": decoders.init_mlp(jax.random.PRNGKey(1), spec.out_dim,
                                     16, 1, 2),
        "color_mlp": decoders.init_mlp(jax.random.PRNGKey(2), spec.out_dim,
                                       16, 3, 2),
        "beta": jnp.full((1,), 10.0),
    }
    coarse, fine = be.coarse_fine_split(spec)
    assert len(fine) >= 2
    R, S, K, n_mid = 4, 6, 3, 1
    p_nor = jax.random.uniform(jax.random.PRNGKey(11), (R, S, 3))
    # selection rows: samples [2, 0, 4] per ray (nearest-first order)
    order = jnp.asarray([2, 0, 4])
    sel = (order[None, :, None] == jnp.arange(S)[None, None, :])
    sel = jnp.tile(sel, (R, 1, 1))

    base = scene_lib.query_lod(params, sc, p_nor, sel)
    for nm in (0, K, K + 5):
        out = scene_lib.query_lod(params, sc, p_nor, sel, n_mid=nm)
        np.testing.assert_allclose(np.asarray(out), np.asarray(base),
                                   rtol=1e-5, atol=1e-6)

    out = scene_lib.query_lod(params, sc, p_nor, sel, n_mid=n_mid)
    # sample 2 (rank 0 < n_mid): full ladder
    full = scene_lib.query(params, sc, p_nor[0, 2][None])[0]
    np.testing.assert_allclose(np.asarray(out[0, 2]), np.asarray(full),
                               rtol=1e-5, atol=1e-6)
    # sample 0 (rank 1 >= n_mid): coarse + finest only, mid zero-filled
    keep = tuple(coarse) + (fine[-1],)
    feat = be.encode(params["table"], p_nor[0, 0][None], spec, keep)
    feat = scene_lib._zero_fill_levels(feat, spec, keep)
    sdf = decoders.mlp_apply(params["sdf_mlp"], feat, "tanh")[0, 0]
    np.testing.assert_allclose(float(out[0, 0, 3]), float(sdf), rtol=1e-5,
                               atol=1e-6)
    # unselected sample 3: coarse only, unchanged by n_mid
    np.testing.assert_allclose(np.asarray(out[0, 3]),
                               np.asarray(base[0, 3]), rtol=1e-5, atol=1e-6)
