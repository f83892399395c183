"""Surgical breakdown of the real mapping loss's value_and_grad on TPU.

Variants disable one stage each; the deltas localize the ~39 ms that the
component profiles (profile_map/2/3) could not account for.

Usage: python examples/profile_map4.py
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

jax.config.update("jax_compilation_cache_dir", "/root/.cache/jax_comp")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)


def _fetch(out):
    leaves = jax.tree_util.tree_leaves(out)
    float(jnp.asarray(leaves[0]).reshape(-1)[0])


def timeit(fn, *args, reps=8, warm=2):
    for _ in range(warm):
        out = fn(*args)
    _fetch(out)
    t0 = time.time()
    for _ in range(reps):
        out = fn(*args)
    _fetch(out)
    return (time.time() - t0) / reps, out


def main():
    from unislam_tpu.core import losses as losses_lib
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core import rays as rays_lib
    from unislam_tpu.core import sampling
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine import mapper as mapper_lib
    from unislam_tpu.engine import selection as selection_lib
    from unislam_tpu.engine.slam import UniSLAM
    from unislam_tpu.models import scene as scene_lib
    from unislam_tpu.render import renderer

    print("device:", jax.devices()[0])
    intr = Intrinsics(H=680, W=1200, fx=600.0, fy=600.0, cx=599.5, cy=339.5)
    ds = SyntheticRoom(n_frames=16, intr=intr, half=3.5, orbit_r=1.2,
                       sphere_c=(1.0, -1.0, 0.0), sphere_r=0.8,
                       deg_per_frame=1.0)
    cfg = make_config(ds, {
        "tracking": {"pixels": 2000, "iters": 8, "ignore_edge_W": 75,
                     "ignore_edge_H": 75},
        "mapping": {"pixels": 4000, "iters": 15, "iters_first": 15,
                    "every_frame": 4, "keyframe_every": 4},
        "rendering": {"n_stratified": 32, "n_importance": 8},
        "grid": {"hash_size_sdf": 16, "hash_size_color": 19,
                 "voxel_sdf": 0.01, "voxel_color": 0.01,
                 "encoding": "brick", "brick_levels": 4,
                 "brick_features": 8, "brick_hash_size": 16},
    })
    slam = UniSLAM(cfg, ds, seed=0)
    slam.step_frame(0)
    slam.step_frame(1)

    sc, rc, mc = slam.sc, slam.rc, slam.mc
    color, depth, _ = slam._frame(2)
    count = int(slam.bank.count)
    probs, extra = selection_lib.window_probs(
        slam.max_kf, count, np.zeros(slam.max_kf, bool))
    pg = np.zeros((slam.max_kf + 1, 1), np.float32)
    pg[[0, slam.max_kf], 0] = 1.0
    opt_tree = {"scene": slam.params,
                "poses": jnp.concatenate(
                    [slam.bank.pose7,
                     pose_lib.matrix_to_cam_pose(
                         jnp.asarray(slam.est_c2w[1])[None])], axis=0)}
    probs_j = jnp.asarray(probs, jnp.float32)
    extra_j = jnp.asarray(extra, jnp.float32)
    pg_j = jnp.asarray(pg)
    key = jax.random.PRNGKey(42)
    args = (opt_tree, slam.bank, depth, color, slam.cam_rays_d, probs_j,
            extra_j, pg_j, key)

    # A. full loss_fn value_and_grad
    loss_fn = mapper_lib.make_loss_fn(sc, rc, mc, intr, slam.max_kf,
                                      slam.bank_size)
    vg = jax.jit(jax.value_and_grad(loss_fn))
    t, _ = timeit(vg, *args)
    print(f"A full loss v&g            {t * 1e3:8.2f} ms")

    # A2. loss only (no grad)
    lf = jax.jit(loss_fn)
    t, _ = timeit(lf, *args)
    print(f"A2 full loss fwd only      {t * 1e3:8.2f} ms")

    # shared batch assembly (outside the variants)
    bound = jnp.asarray(sc.bound)
    n_rays = mc.pixels + mc.extra_rays
    HW = intr.H * intr.W

    def assemble(opt_tree, bank, cur_depth, cur_color, cur_rays_d, sel_probs,
                 extra_probs, pose_grad_mask, key):
        poses = opt_tree["poses"]
        poses = poses * pose_grad_mask + \
            jax.lax.stop_gradient(poses) * (1.0 - pose_grad_mask)
        k_slot, k_extra, k_pix_b, k_pix_c, k_render = jax.random.split(key, 5)
        slot_main = jax.random.categorical(
            k_slot, jnp.log(sel_probs + 1e-20), shape=(mc.pixels,))
        slot_extra = jax.random.categorical(
            k_extra, jnp.log(extra_probs + 1e-20), shape=(mc.extra_rays,))
        slot = jnp.concatenate([slot_main, slot_extra])
        pix_b = jax.random.randint(k_pix_b, (n_rays,), 0, slam.bank_size)
        pix_c = jax.random.randint(k_pix_c, (n_rays,), 0, HW)
        is_cur = slot == slam.max_kf
        kf_slot = jnp.minimum(slot, slam.max_kf - 1)
        gt_depth = jnp.where(is_cur, cur_depth.reshape(-1)[pix_c],
                             bank.depth[kf_slot, pix_b])
        gt_color = jnp.where(is_cur[:, None], cur_color.reshape(-1, 3)[pix_c],
                             bank.color[kf_slot, pix_b])
        dir_cam = jnp.where(is_cur[:, None], cur_rays_d.reshape(-1, 3)[pix_c],
                            bank.rays_d[kf_slot, pix_b])
        c2w = pose_lib.cam_pose_to_matrix(poses)
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dir_cam)
        rays_o = c2w[slot, :3, 3]
        return rays_o, rays_d, gt_depth, gt_color, k_render

    # B. assembly + render + sum outputs (no losses/masks)
    def loss_B(opt_tree, *rest):
        rays_o, rays_d, gt_depth, gt_color, k_render = assemble(opt_tree,
                                                                *rest)
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o, rays_d,
                                   gt_depth, k_render)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_B)), *args)
    print(f"B no-losses v&g            {t * 1e3:8.2f} ms")

    # C. fixed rays + render + real losses (no assembly under grad)
    rays_o0, rays_d0, gtd0, gtc0, krender0 = jax.jit(assemble)(*args)

    # C2. rays as TRACED jit arguments (no constant folding) + sum loss —
    # isolates assembly cost from the render fwd+bwd proper.
    def loss_C2(opt_tree, rays_o, rays_d, gtd, k):
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o, rays_d,
                                   gtd, k)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_C2)), opt_tree, rays_o0,
                  rays_d0, gtd0, krender0)
    print(f"C2 traced-rays no-loss v&g {t * 1e3:8.2f} ms")

    # C3. same but differentiate wrt rays too (the BA/tracking wiring)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_C2, argnums=(0, 1, 2))),
                  opt_tree, rays_o0, rays_d0, gtd0, krender0)
    print(f"C3 +ray grads v&g          {t * 1e3:8.2f} ms")
    w_sdf = losses_lib.SdfLossWeights(mc.w_sdf_fs, mc.w_sdf_center,
                                      mc.w_sdf_tail)

    def loss_C(opt_tree):
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o0,
                                   rays_d0, gtd0, krender0)
        pixel_unc = jax.lax.stop_gradient(out.pixel_unc)
        alpha_mask = (1.0 - pixel_unc) > 0.99
        far = rays_lib.ray_aabb_far(rays_o0, rays_d0, bound)
        inside = far >= gtd0
        depth_mask = (gtd0 > 0) & alpha_mask & inside
        m_sdf = depth_mask.astype(jnp.float32)
        loss = losses_lib.sdf_losses(out.sdf, out.z_vals, gtd0, m_sdf,
                                     sc.truncation, w_sdf)
        loss = loss + mc.w_color * losses_lib.color_loss(
            gtc0, out.rgb, inside.astype(jnp.float32))
        loss = loss + mc.w_depth * losses_lib.depth_loss(gtd0, out.depth,
                                                         m_sdf)
        return loss
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_C)), opt_tree)
    print(f"C fixed-rays v&g           {t * 1e3:8.2f} ms")

    # D. fixed rays/z + query + pseudo losses (no sampling/compositing)
    z0 = sampling.z_vals_with_depth(jax.random.PRNGKey(7),
                                    jnp.maximum(gtd0, 1e-6), sc.truncation,
                                    rc.n_stratified, rc.n_importance, True)

    def loss_D(opt_tree):
        pts = rays_o0[:, None, :] + rays_d0[:, None, :] * z0[..., None]
        p_nor = scene_lib.normalize_points(sc, pts.reshape(-1, 3))
        raw = scene_lib.query(opt_tree["scene"], sc, p_nor).reshape(
            z0.shape[0], -1, 4)
        sdf = raw[..., 3]
        m = jnp.ones_like(gtd0)
        loss = losses_lib.sdf_losses(sdf, z0, gtd0, m, sc.truncation, w_sdf)
        loss = loss + jnp.mean(jnp.square(raw[..., :3]))
        return loss
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_D)), opt_tree)
    print(f"D query+sdfloss v&g        {t * 1e3:8.2f} ms")

    # E. C without perturb (kills one random uniform + lerp)
    rc_np = rc._replace(perturb=False)

    def loss_E(opt_tree):
        out = renderer.render_rays(opt_tree["scene"], sc, rc_np, rays_o0,
                                   rays_d0, gtd0, krender0)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_E)), opt_tree)
    print(f"E no-perturb no-loss v&g   {t * 1e3:8.2f} ms")

    # F. gt_depth strictly >0 so the no-depth cond branch predicate is
    #    False at runtime; verify by timing with a forced-positive depth
    def loss_F(opt_tree):
        gtd = jnp.maximum(gtd0, 0.1)
        out = renderer.render_rays(opt_tree["scene"], sc, rc, rays_o0,
                                   rays_d0, gtd, krender0)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_F)), opt_tree)
    print(f"F forced-depth v&g         {t * 1e3:8.2f} ms")

    print("gtd0 min/max:", float(jnp.min(gtd0)), float(jnp.max(gtd0)),
          " zeros:", int(jnp.sum(gtd0 <= 0)))


if __name__ == "__main__":
    main()
