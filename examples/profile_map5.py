"""Bisect the mapping batch assembly's 48 ms overhead (see profile_map4:
B=80ms vs C2=32ms). Incrementally re-enable assembly stages under the grad.

Usage: python examples/profile_map5.py
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
    from unislam_tpu.core import pose as pose_lib
    from unislam_tpu.core.rays import Intrinsics
    from unislam_tpu.data.synthetic import SyntheticRoom, make_config
    from unislam_tpu.engine.slam import UniSLAM
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
    bank = slam.bank
    max_kf = slam.max_kf
    bank_size = slam.bank_size
    n_rays = mc.pixels + mc.extra_rays
    HW = intr.H * intr.W

    poses = jnp.concatenate(
        [bank.pose7, pose_lib.matrix_to_cam_pose(
            jnp.asarray(slam.est_c2w[1])[None])], axis=0)
    opt_tree = {"scene": slam.params, "poses": poses}
    key = jax.random.PRNGKey(42)

    # precomputed concrete draws
    k_slot, k_extra, k_pix_b, k_pix_c, k_render = jax.random.split(key, 5)
    probs = np.zeros(max_kf + 1, np.float32)
    probs[[0, 1, max_kf]] = 1 / 3
    probs_j = jnp.asarray(probs)
    slot0 = jax.random.categorical(k_slot, jnp.log(probs_j + 1e-20),
                                   shape=(n_rays,))
    pix_b0 = jax.random.randint(k_pix_b, (n_rays,), 0, bank_size)
    pix_c0 = jax.random.randint(k_pix_c, (n_rays,), 0, HW)
    cur_depth, cur_color, cur_rays_d = depth, color, slam.cam_rays_d

    def gather_gt(slot, pix_b, pix_c):
        is_cur = slot == max_kf
        kf_slot = jnp.minimum(slot, max_kf - 1)
        gtd = jnp.where(is_cur, cur_depth.reshape(-1)[pix_c],
                        bank.depth[kf_slot, pix_b])
        gtc = jnp.where(is_cur[:, None], cur_color.reshape(-1, 3)[pix_c],
                        bank.color[kf_slot, pix_b])
        dirc = jnp.where(is_cur[:, None], cur_rays_d.reshape(-1, 3)[pix_c],
                         bank.rays_d[kf_slot, pix_b])
        return gtd, gtc, dirc

    gtd0, gtc0, dirc0 = jax.jit(gather_gt)(slot0, pix_b0, pix_c0)

    def render_sum(scene, rays_o, rays_d, gtd, k):
        out = renderer.render_rays(scene, sc, rc, rays_o, rays_d, gtd, k)
        return jnp.sum(out.rgb) + jnp.sum(out.depth) + jnp.sum(out.sdf)

    # V0 = C2 baseline: everything precomputed
    rot0 = pose_lib.cam_pose_to_matrix(poses)[slot0, :3, :3]
    rayd0 = jnp.einsum("nij,nj->ni", rot0, dirc0)
    rayo0 = pose_lib.cam_pose_to_matrix(poses)[slot0, :3, 3]

    def loss_V0(opt_tree, rays_o, rays_d, gtd, k):
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, k)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V0)), opt_tree, rayo0,
                  rayd0, gtd0, k_render)
    print(f"V0 baseline (=C2)          {t * 1e3:8.2f} ms")

    # V1: + pose chain (slot/pix/dir/gt concrete)
    def loss_V1(opt_tree, slot, dirc, gtd, k):
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, k)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V1)), opt_tree, slot0,
                  dirc0, gtd0, k_render)
    print(f"V1 +pose chain             {t * 1e3:8.2f} ms")

    # V2: + bank gathers (slot/pix concrete)
    def loss_V2(opt_tree, slot, pix_b, pix_c, k):
        gtd, gtc, dirc = gather_gt(slot, pix_b, pix_c)
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, k) \
            + 0.0 * jnp.sum(gtc)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V2)), opt_tree, slot0,
                  pix_b0, pix_c0, k_render)
    print(f"V2 +bank gathers           {t * 1e3:8.2f} ms")

    # V3: + RNG draws inside (full assembly)
    def loss_V3(opt_tree, sel_probs, k):
        ks, ke, kb, kc, kr = jax.random.split(k, 5)
        slot_main = jax.random.categorical(
            ks, jnp.log(sel_probs + 1e-20), shape=(mc.pixels,))
        slot_extra = jax.random.categorical(
            ke, jnp.log(sel_probs + 1e-20), shape=(mc.extra_rays,))
        slot = jnp.concatenate([slot_main, slot_extra])
        pix_b = jax.random.randint(kb, (n_rays,), 0, bank_size)
        pix_c = jax.random.randint(kc, (n_rays,), 0, HW)
        gtd, gtc, dirc = gather_gt(slot, pix_b, pix_c)
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd, kr) \
            + 0.0 * jnp.sum(gtc)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V3)), opt_tree, probs_j,
                  key)
    print(f"V3 +rng draws (=B)         {t * 1e3:8.2f} ms")

    # V3b: RNG draws but gt/dir STILL concrete (only slot used downstream)
    def loss_V3b(opt_tree, sel_probs, k):
        ks, ke, kb, kc, kr = jax.random.split(k, 5)
        slot_main = jax.random.categorical(
            ks, jnp.log(sel_probs + 1e-20), shape=(mc.pixels,))
        slot_extra = jax.random.categorical(
            ke, jnp.log(sel_probs + 1e-20), shape=(mc.extra_rays,))
        slot = jnp.concatenate([slot_main, slot_extra])
        c2w = pose_lib.cam_pose_to_matrix(opt_tree["poses"])
        rot = c2w[slot, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dirc0)
        rays_o = c2w[slot, :3, 3]
        return render_sum(opt_tree["scene"], rays_o, rays_d, gtd0, kr)
    t, _ = timeit(jax.jit(jax.value_and_grad(loss_V3b)), opt_tree, probs_j,
                  key)
    print(f"V3b rng slot only          {t * 1e3:8.2f} ms")

    # V4: RNG draws alone (no render): how slow is threefry here?
    def draws(k):
        ks, ke, kb, kc, kr = jax.random.split(k, 5)
        slot_main = jax.random.categorical(
            ks, jnp.log(probs_j + 1e-20), shape=(mc.pixels,))
        pix_b = jax.random.randint(kb, (n_rays,), 0, bank_size)
        pix_c = jax.random.randint(kc, (n_rays,), 0, HW)
        return (jnp.sum(slot_main) + jnp.sum(pix_b) + jnp.sum(pix_c))
    t, _ = timeit(jax.jit(draws), key)
    print(f"V4 rng draws alone fwd     {t * 1e3:8.2f} ms")


if __name__ == "__main__":
    main()
