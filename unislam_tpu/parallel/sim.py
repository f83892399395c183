"""Tiny, deterministic mapping problem for sharding validation.

Used by three consumers that must agree exactly:
- `__graft_entry__.dryrun_multichip` (driver compile-check on N virtual
  devices),
- `tests/test_multihost.py` + `tests/multihost_worker.py` (multi-process
  CPU simulation: 2 processes x 4 devices == 1 process x 8 devices),
- `examples/scaling_sweep.py` (rays/s scaling harness).

Everything is seeded and shape-static so any process produces bit-identical
host-side inputs; only the device placement differs.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np


class TinyProblem(NamedTuple):
    step: object          # jitted mapping step
    opt: object           # optax optimizer
    opt_tree: dict
    opt_state: object
    bank: object
    depth: jnp.ndarray
    color: jnp.ndarray
    rays_d: jnp.ndarray
    probs: jnp.ndarray
    extra_probs: jnp.ndarray
    pose_grad_mask: jnp.ndarray
    intr: object


def build_tiny_mapping_problem(mesh=None, n_rays_base: int = 240,
                               shard_tables: bool = False) -> TinyProblem:
    """Build the flagship-config mapping step (brick encoding + surface-LOD
    + joint BA) at toy scale. `mesh`: optional jax.sharding.Mesh; ray counts
    are sized to divide any mesh size that divides `n_rays_base`."""
    from unislam_tpu.core.rays import Intrinsics, camera_ray_dirs
    from unislam_tpu.engine import keyframes as kf_lib
    from unislam_tpu.engine import mapper as mapper_lib
    from unislam_tpu.models import brick_encoding as be
    from unislam_tpu.models import hash_encoding as he
    from unislam_tpu.models import scene as scene_lib
    from unislam_tpu.parallel import sharding as sh
    from unislam_tpu.render.renderer import RenderConfig

    intr = Intrinsics(H=24, W=32, fx=30.0, fy=30.0, cx=15.5, cy=11.5)
    bound = np.asarray([[-1.5, 1.5]] * 3, np.float32)
    sc = scene_lib.SceneConfig(
        sdf_spec=he.make_spec(n_levels=4, log2_hashmap_size=8,
                              base_resolution=4, desired_resolution=32),
        color_spec=he.make_spec(n_levels=4, log2_hashmap_size=8,
                                base_resolution=4, desired_resolution=32),
        bound=bound, truncation=0.06, encoding="brick",
        brick_spec=be.make_spec(n_levels=3, n_features=4,
                                log2_hashmap_size=8, base_resolution=4,
                                desired_resolution=32, matmul_max_rows=64),
        c_dim=12)
    params = scene_lib.init_params(jax.random.PRNGKey(0), sc)

    rc = RenderConfig(n_stratified=8, n_importance=4, perturb=True, n_fine=6)
    n_dev = 1 if mesh is None else mesh.devices.size
    per = max(1, n_rays_base // n_dev)
    mc = mapper_lib.MapperConfig(pixels=per * n_dev, iters=1,
                                 extra_rays=n_dev * 8)
    max_kf, bank_size = 4, 64

    step, opt, _ = mapper_lib.make_mapping_step(sc, rc, mc, intr, max_kf,
                                                bank_size, mesh=mesh)

    if mesh is not None:
        shardings = sh.scene_param_shardings(mesh, params,
                                             shard_tables=shard_tables)
        params = jax.tree_util.tree_map(jax.device_put, params, shardings)

    bank = kf_lib.init_bank(max_kf, bank_size)
    add = kf_lib.make_add_keyframe(intr.H, intr.W, bank_size)
    depth = jnp.full((intr.H, intr.W), 1.0)
    color = jnp.full((intr.H, intr.W, 3), 0.5)
    rays_d = camera_ray_dirs(intr)
    eye = jnp.eye(4)
    for i in range(2):
        bank = add(bank, depth, color, rays_d, eye, eye, jnp.int32(i),
                   jax.random.PRNGKey(i))

    pose7 = jnp.tile(jnp.asarray([1.0, 0, 0, 0, 0, 0, 0]), (max_kf + 1, 1))
    opt_tree = {"scene": params, "poses": pose7}
    opt_state = opt.init(opt_tree)

    probs = np.zeros(max_kf + 1)
    probs[[0, 1, max_kf]] = 1 / 3
    pose_grad_mask = np.zeros((max_kf + 1, 1), np.float32)
    pose_grad_mask[[1, max_kf]] = 1.0  # BA moves kf 1 + current, kf 0 fixed

    return TinyProblem(
        step=step, opt=opt, opt_tree=opt_tree, opt_state=opt_state,
        bank=bank, depth=depth, color=color, rays_d=rays_d,
        probs=jnp.asarray(probs, jnp.float32),
        extra_probs=jnp.asarray(probs, jnp.float32),
        pose_grad_mask=jnp.asarray(pose_grad_mask), intr=intr)


def run_tiny_step(p: TinyProblem, key=None):
    """One mapping step; returns (opt_tree', opt_state', loss)."""
    if key is None:
        key = jax.random.PRNGKey(3)
    return p.step(p.opt_tree, p.opt_state, p.bank, p.depth, p.color,
                  p.rays_d, p.probs, p.extra_probs, p.pose_grad_mask, key,
                  jnp.float32(1.0))


def param_checksums(opt_tree) -> dict:
    """Deterministic per-leaf float checksums of the scene params (post-step
    numerics fingerprint, comparable across process topologies)."""
    out = {}
    for path, leaf in jax.tree_util.tree_leaves_with_path(opt_tree):
        name = jax.tree_util.keystr(path)
        arr = np.asarray(jax.device_get(leaf)
                         if not hasattr(leaf, "addressable_data")
                         else leaf.addressable_data(0))
        out[name] = float(np.abs(np.asarray(arr, np.float64)).sum())
    return out
