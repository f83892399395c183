"""Multi-device ray-sharding tests on the 8-virtual-device CPU mesh:
the sharded mapping step must (a) run with the batch partitioned over the
'rays' axis and scene grads all-reduced by XLA, and (b) agree numerically
with the unsharded step."""

import jax
import jax.numpy as jnp
import numpy as np

from unislam_tpu.core.rays import Intrinsics, camera_ray_dirs
from unislam_tpu.engine import keyframes as kf_lib
from unislam_tpu.engine import mapper as mapper_lib
from unislam_tpu.models import brick_encoding as be
from unislam_tpu.models import hash_encoding as he
from unislam_tpu.models import scene as scene_lib
from unislam_tpu.parallel import sharding as sh
from unislam_tpu.render.renderer import RenderConfig


def _setup(encoding="hash"):
    intr = Intrinsics(H=24, W=32, fx=30.0, fy=30.0, cx=15.5, cy=11.5)
    bound = np.asarray([[-1.5, 1.5]] * 3, np.float32)
    kw = dict(
        sdf_spec=he.make_spec(n_levels=4, log2_hashmap_size=8,
                              base_resolution=4, desired_resolution=32),
        color_spec=he.make_spec(n_levels=4, log2_hashmap_size=8,
                                base_resolution=4, desired_resolution=32),
        bound=bound, truncation=0.06)
    rc_kw = {}
    if encoding == "brick":
        kw.update(encoding="brick", c_dim=12,
                  brick_spec=be.make_spec(n_levels=3, n_features=4,
                                          log2_hashmap_size=8,
                                          base_resolution=4,
                                          desired_resolution=32,
                                          matmul_max_rows=64))
        rc_kw["n_fine"] = 6
    sc = scene_lib.SceneConfig(**kw)
    rc = RenderConfig(n_stratified=8, n_importance=4, perturb=True, **rc_kw)
    params = scene_lib.init_params(jax.random.PRNGKey(0), sc)

    max_kf, bank_size = 4, 64
    bank = kf_lib.init_bank(max_kf, bank_size)
    add = kf_lib.make_add_keyframe(intr.H, intr.W, bank_size)
    depth = jnp.full((intr.H, intr.W), 1.0)
    color = jnp.full((intr.H, intr.W, 3), 0.5)
    rays_d = camera_ray_dirs(intr)
    eye = jnp.eye(4)
    for i in range(2):
        bank = add(bank, depth, color, rays_d, eye, eye, jnp.int32(i),
                   jax.random.PRNGKey(i))
    return intr, sc, rc, params, bank, depth, color, rays_d, max_kf, bank_size


def _run_step(mesh, intr, sc, rc, params, bank, depth, color, rays_d,
              max_kf, bank_size):
    mc = mapper_lib.MapperConfig(pixels=240, iters=1, extra_rays=16)
    step, opt, _ = mapper_lib.make_mapping_step(sc, rc, mc, intr, max_kf,
                                                bank_size, mesh=mesh)
    if mesh is not None:
        shardings = sh.scene_param_shardings(mesh, params)
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)

    pose7 = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), (max_kf + 1, 1))
    opt_tree = {"scene": params, "poses": pose7}
    opt_state = opt.init(opt_tree)
    probs = np.zeros(max_kf + 1, np.float32)
    probs[[0, 1, max_kf]] = 1 / 3
    pg = np.zeros((max_kf + 1, 1), np.float32)
    pg[[1, max_kf]] = 1.0
    opt_tree, opt_state, loss = step(
        opt_tree, opt_state, bank, depth, color, rays_d,
        jnp.asarray(probs), jnp.asarray(probs), jnp.asarray(pg),
        jax.random.PRNGKey(3), jnp.float32(1.0))
    return opt_tree, float(loss)


def test_sharded_step_runs_all_devices():
    assert len(jax.devices()) >= 8, "conftest must provide 8 cpu devices"
    setup = _setup("hash")
    mesh = sh.make_mesh(8)
    opt_tree, loss = _run_step(mesh, *setup)
    assert np.isfinite(loss) and loss > 0


def test_sharded_matches_unsharded():
    """Same PRNG key, same batch: the 8-way sharded step must produce the
    same loss and parameter update as the single-device step (the psum
    reduction is exact up to fp reassociation)."""
    setup = _setup("hash")
    mesh = sh.make_mesh(8)
    tree_s, loss_s = _run_step(mesh, *setup)
    tree_1, loss_1 = _run_step(None, *setup)
    np.testing.assert_allclose(loss_s, loss_1, rtol=1e-4)
    a = np.asarray(tree_s["scene"]["sdf_mlp"]["w0"])
    b = np.asarray(tree_1["scene"]["sdf_mlp"]["w0"])
    np.testing.assert_allclose(a, b, atol=1e-5)


def test_sharded_brick_lod_step():
    """The flagship brick+LOD config compiles and runs over the mesh."""
    setup = _setup("brick")
    mesh = sh.make_mesh(8)
    _, loss = _run_step(mesh, *setup)
    assert np.isfinite(loss) and loss > 0


def _assert_row_sharded(leaf, mesh):
    """The leaf must be genuinely partitioned: a shard on every device and
    per-shard row counts strictly below the full row count."""
    devs = {s.device for s in leaf.addressable_shards}
    assert len(devs) == mesh.devices.size, leaf.sharding
    for s in leaf.addressable_shards:
        assert s.data.shape[0] < leaf.shape[0], (s.data.shape, leaf.shape)
        assert s.data.shape[1] == leaf.shape[1]


def test_table_sharding_placement_both_encodings():
    """Regression: round 3's matcher only knew hash mode's sdf_table /
    color_table keys, so brick mode's single "table" silently replicated
    while the dryrun claimed model-parallel table sharding."""
    mesh = sh.make_mesh(8)
    for encoding, keys in (("hash", ("sdf_table", "color_table")),
                           ("brick", ("table",))):
        _, sc, _, params, *_ = _setup(encoding)
        shardings = sh.scene_param_shardings(mesh, params, shard_tables=True)
        placed = jax.tree_util.tree_map(jax.device_put, params, shardings)
        for k in keys:
            _assert_row_sharded(placed[k], mesh)
        # non-table leaves stay replicated
        mlp_leaf = placed["sdf_mlp"]["w0"]
        assert mlp_leaf.sharding.is_fully_replicated, mlp_leaf.sharding


def test_sharded_tables_step_matches_unsharded():
    """Brick mapping step with table rows sharded over 8 devices must agree
    numerically with the single-device step (gathers/scatters ride the
    mesh; XLA inserts the collectives)."""
    setup = _setup("brick")
    mesh = sh.make_mesh(8)

    intr, sc, rc, params, bank, depth, color, rays_d, max_kf, bank_size = setup
    mc = mapper_lib.MapperConfig(pixels=240, iters=1, extra_rays=16)
    step, opt, _ = mapper_lib.make_mapping_step(sc, rc, mc, intr, max_kf,
                                                bank_size, mesh=mesh)
    shardings = sh.scene_param_shardings(mesh, params, shard_tables=True)
    placed = jax.tree_util.tree_map(jax.device_put, params, shardings)

    pose7 = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), (max_kf + 1, 1))
    probs = np.zeros(max_kf + 1, np.float32)
    probs[[0, 1, max_kf]] = 1 / 3
    pg = np.zeros((max_kf + 1, 1), np.float32)
    pg[[1, max_kf]] = 1.0

    def run(p):
        opt_tree = {"scene": p, "poses": pose7}
        opt_state = opt.init(opt_tree)
        tree, _, loss = step(
            opt_tree, opt_state, bank, depth, color, rays_d,
            jnp.asarray(probs), jnp.asarray(probs), jnp.asarray(pg),
            jax.random.PRNGKey(3), jnp.float32(1.0))
        return tree, float(loss)

    tree_s, loss_s = run(placed)
    tree_1, loss_1 = run(params)
    np.testing.assert_allclose(loss_s, loss_1, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(tree_s["scene"]["table"]),
                               np.asarray(tree_1["scene"]["table"]),
                               atol=1e-5)
