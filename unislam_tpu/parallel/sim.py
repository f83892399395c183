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
    sc: object = None        # SceneConfig (round 5: tracking dry run)
    rc: object = None        # RenderConfig


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
        pose_grad_mask=jnp.asarray(pose_grad_mask), intr=intr,
        sc=sc, rc=rc)


def run_tiny_step(p: TinyProblem, key=None):
    """One mapping step; returns (opt_tree', opt_state', loss)."""
    if key is None:
        key = jax.random.PRNGKey(3)
    return p.step(p.opt_tree, p.opt_state, p.bank, p.depth, p.color,
                  p.rays_d, p.probs, p.extra_probs, p.pose_grad_mask, key,
                  jnp.float32(1.0))


def run_tiny_track_frame(p: TinyProblem, mesh=None, n_iters: int = 2):
    """One fused whole-frame TRACKING dispatch over the same mesh/scene:
    ray batch sharded like mapping's, pose-only gradients against the
    (possibly row-sharded) frozen scene params. Together with
    run_tiny_step this covers the driver's FULL per-frame training
    surface in the multichip dry run. Returns the final state tuple
    (pose, opt_state, best7, min_loss, unc_prev, unc_last)."""
    from unislam_tpu.engine import tracker as tracker_lib

    n_dev = 1 if mesh is None else mesh.devices.size
    per = max(1, 240 // n_dev)
    tc = tracker_lib.TrackerConfig(pixels=per * n_dev, iters=n_iters,
                                   ignore_edge_W=2, ignore_edge_H=2)
    _, topt, track_frame = tracker_lib.make_tracking_step(
        p.sc, p.rc, tc, p.intr, mesh=mesh)
    pose = {"R": jnp.asarray([1.0, 0.0, 0.0, 0.0]),
            "T": jnp.asarray([0.0, 0.0, 0.0])}
    return track_frame(p.opt_tree["scene"], pose, topt.init(pose),
                       p.depth, p.color, jax.random.PRNGKey(11),
                       jnp.int32(n_iters))


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


def run_tiny_slam(mesh=None, n_frames: int = 6, multiprocess: bool = False):
    """Tiny end-to-end SLAM loop (track + selection + mapping + keyframe
    adds) on the shared toy problem, drivable identically single- and
    multi-process. Returns (est_pose7 (n,7) np.ndarray, mapping losses).

    All host-side logic is deterministic numpy; every device input is
    replicated on the global mesh so any process topology with the same
    total device count produces the same numerics (the multi-host analog of
    engine/slam.py's sequential driver — VERDICT r3 #6's e2e smoke).
    """
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core.rays import Intrinsics, camera_ray_dirs
    from unislam_tpu.data.synthetic import SyntheticRoom
    from unislam_tpu.engine import keyframes as kf_lib
    from unislam_tpu.engine import mapper as mapper_lib
    from unislam_tpu.engine import selection as selection_lib
    from unislam_tpu.engine import tracker as tracker_lib
    from unislam_tpu.models import brick_encoding as be
    from unislam_tpu.models import hash_encoding as he
    from unislam_tpu.models import scene as scene_lib
    from unislam_tpu.parallel import distributed as dist
    from unislam_tpu.render.renderer import RenderConfig

    intr = Intrinsics(H=24, W=32, fx=30.0, fy=30.0, cx=15.5, cy=11.5)
    ds = SyntheticRoom(n_frames=n_frames, intr=intr, deg_per_frame=1.5)
    bound = np.asarray(ds.bound, np.float32) if hasattr(ds, "bound") else \
        np.asarray([[-1.6, 1.6]] * 3, np.float32)
    sc = scene_lib.SceneConfig(
        sdf_spec=he.make_spec(n_levels=4, log2_hashmap_size=8,
                              base_resolution=4, desired_resolution=32),
        color_spec=he.make_spec(n_levels=4, log2_hashmap_size=8,
                                base_resolution=4, desired_resolution=32),
        bound=bound, truncation=0.08, encoding="brick",
        brick_spec=be.make_spec(n_levels=3, n_features=4,
                                log2_hashmap_size=8, base_resolution=4,
                                desired_resolution=32, matmul_max_rows=64),
        c_dim=12)
    rc = RenderConfig(n_stratified=8, n_importance=4, perturb=True, n_fine=6)
    tc = tracker_lib.TrackerConfig(pixels=240, iters=4, lr_T=0.01,
                                   lr_R=0.004, ignore_edge_W=3,
                                   ignore_edge_H=3)
    mc = mapper_lib.MapperConfig(pixels=240, iters=2, iters_first=4,
                                 every_frame=2, keyframe_every=2,
                                 extra_rays=16)
    max_kf, bank_size = 6, 64

    _, _, track_frame_fn = tracker_lib.make_tracking_step(sc, rc, tc, intr,
                                                          mesh=mesh)
    track_opt = tracker_lib.make_optimizer(tc)
    map_step, map_opt, map_phase = mapper_lib.make_mapping_step(
        sc, rc, mc, intr, max_kf, bank_size, mesh=mesh)
    select_fn = selection_lib.make_selection_fn(intr, max_kf, window_size=4)
    add_kf = kf_lib.make_add_keyframe(intr.H, intr.W, bank_size)

    if mesh is not None:
        rep = lambda t: dist.replicate(mesh, t)
    else:
        rep = lambda t: t

    def fetch(x):
        return dist.fetch_replicated(x) if multiprocess else np.asarray(x)

    import jax

    params = rep(scene_lib.init_params(jax.random.PRNGKey(0), sc))
    bank = rep(kf_lib.init_bank(max_kf, bank_size))
    rays_d_cam = rep(camera_ray_dirs(intr))

    est7 = np.zeros((n_frames, 7), np.float32)
    losses = []
    init_phase = True
    for idx in range(n_frames):
        color_np, depth_np, gt_c2w = ds[idx]
        depth = rep(jnp.asarray(depth_np, jnp.float32))
        color = rep(jnp.asarray(color_np, jnp.float32))
        gt7 = np.asarray(pose_lib.matrix_to_cam_pose(
            jnp.asarray(gt_c2w, jnp.float32)[None])[0])

        # ---- tracking (const-speed init in quat+trans space) ----
        if idx == 0:
            est7[idx] = gt7
        else:
            init = (2.0 * est7[idx - 1] - est7[idx - 2] if idx >= 2
                    else est7[idx - 1])
            pose = rep({"R": jnp.asarray(init[:4]),
                        "T": jnp.asarray(init[4:])})
            opt_state = track_opt.init(pose)
            best7 = track_frame_fn(
                params, pose, opt_state, depth, color,
                rep(jax.random.PRNGKey(1000 + idx)),
                rep(jnp.int32(tc.iters)))[2]
            est7[idx] = fetch(best7)

        # ---- mapping every `every_frame` ----
        if idx % mc.every_frame == 0 or idx == n_frames - 1:
            count = int(fetch(bank.count))
            if count > 2:
                est_c2w = np.asarray(pose_lib.cam_pose_to_matrix(
                    jnp.asarray(est7[idx])[None])[0])
                res = select_fn(bank, depth, color,
                                rep(jnp.asarray(est_c2w)),
                                rep(jnp.int32(idx)),
                                rep(jax.random.PRNGKey(2000 + idx)))
                sel_mask = fetch(res.normal_mask)
            else:
                sel_mask = np.zeros(max_kf, bool)
            probs, extra = selection_lib.window_probs(max_kf, count, sel_mask)
            pg = np.zeros((max_kf + 1, 1), np.float32)
            if count > 2:
                window = probs[:max_kf] > 0
                slots = np.nonzero(window)[0]
                if len(slots):
                    window[slots[0]] = False
                pg[:max_kf, 0] = window
                pg[max_kf, 0] = 1.0

            opt_tree = {"scene": params,
                        "poses": jnp.concatenate(
                            [bank.pose7, rep(jnp.asarray(est7[idx]))[None]],
                            axis=0)}
            opt_state = map_opt.init(opt_tree)
            iters = mc.iters_first if init_phase else mc.iters
            lr_scale = mc.lr_first_factor if init_phase else 1.0
            opt_tree, opt_state, loss = map_phase(
                opt_tree, opt_state, bank, depth, color, rays_d_cam,
                rep(jnp.asarray(probs, jnp.float32)),
                rep(jnp.asarray(extra, jnp.float32)), rep(jnp.asarray(pg)),
                rep(jax.random.PRNGKey(3000 + idx)), rep(jnp.int32(iters)),
                rep(jnp.float32(lr_scale)))
            params = opt_tree["scene"]
            if pg.any():
                bank = bank._replace(pose7=opt_tree["poses"][:max_kf])
                est7[idx] = fetch(opt_tree["poses"][max_kf])
            losses.append(float(fetch(loss)))
            init_phase = False

            # ---- keyframe add on the mapping cadence ----
            if idx % mc.keyframe_every == 0 and count < max_kf:
                est_c2w = np.asarray(pose_lib.cam_pose_to_matrix(
                    jnp.asarray(est7[idx])[None])[0])
                bank = add_kf(bank, depth, color, rays_d_cam,
                              rep(jnp.asarray(est_c2w)),
                              rep(jnp.asarray(gt_c2w, jnp.float32)),
                              rep(jnp.int32(idx)),
                              rep(jax.random.PRNGKey(4000 + idx)))
    return est7, losses
