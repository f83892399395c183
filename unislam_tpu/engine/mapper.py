"""Map optimization: scene params (+ keyframe poses, local BA) against a
keyframe-window ray batch.

TPU-native rewrite of /root/reference/src/Mapper.py:276-459. One jitted step:
draw a fixed-size (frame, pixel) batch from the keyframe bank + current
frame, render, masked SDF/color/depth losses, Adam over
{hash tables, decoders, poses} with per-group learning rates.

Design deltas (behavior-preserving):
- The reference allocates `pixels // n_window_frames` rays to each window
  frame (Mapper.py:315, get_samples_all); we draw each ray's frame slot from
  a uniform categorical over the selected set — same marginal distribution,
  fully static shapes for any window size.
- The "+200 extra rays from the 10 newest keyframes when >20 kfs"
  (Mapper.py:385-393) is a second 200-ray draw from a separate probability
  vector the driver fills (zeros -> the draw falls back to the main set).
- Joint BA (Mapper.py:359-361,447-458): pose gradients are masked per-slot
  (oldest window frame fixed); non-window slots receive no rays hence no
  gradient. Updated poses are written straight back to the bank pytree.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp
import optax

from unislam_tpu.core import losses as losses_lib
from unislam_tpu.core import pose as pose_lib
from unislam_tpu.core import rays as rays_lib
from unislam_tpu.core.rays import Intrinsics
from unislam_tpu.engine.keyframes import KeyframeBank
from unislam_tpu.models.scene import SceneConfig
from unislam_tpu.render import renderer
from unislam_tpu.render.renderer import RenderConfig


class MapperConfig(NamedTuple):
    pixels: int = 4000
    iters: int = 15
    iters_first: int = 10
    every_frame: int = 4
    keyframe_every: int = 4
    mapping_window_size: int = 20
    joint_opt: bool = True
    joint_opt_cam_lr: float = 0.001
    lr_decoders: float = 0.001
    lr_hash: float = 0.05
    lr_c_hash: float = 0.05
    lr_factor: float = 1.0
    lr_first_factor: float = 5.0
    w_sdf_fs: float = 5.0
    w_sdf_center: float = 200.0
    w_sdf_tail: float = 10.0
    w_depth: float = 0.1
    w_color: float = 5.0
    extra_rays: int = 200
    extra_newest: int = 10
    mask_mode: str = "original"
    # Upper bound on fori_loop iterations per fused map_phase dispatch
    # (0 = unlimited). Long single dispatches (hash mode: 15 iters x
    # ~40 ms) can trip the TPU runtime's execution watchdog; chunked
    # dispatches draw identical ray batches via map_phase's iter0 arg.
    max_fused_iters: int = 0
    # Moment-state dtype for the grid-table Adam groups ("bfloat16" with
    # stochastic rounding, or "float32" = exact optax.adam). bf16-SR state
    # cuts ~30% of the per-iter Adam-sweep HBM bytes (~0.2 ms/iter at room0
    # scale) but the round-4 same-code A/B measured a consistent small
    # quality cost (ATE 1.94 -> 2.20 cm, PSNR 33.8 -> 33.4, depth-L1
    # 1.69 -> 1.88 cm; BASELINE.md) — ~1.3% combined throughput is not
    # worth 13% ATE, so f32 is the default and bf16 is opt-in. The
    # reference keeps f32 Adam state everywhere (src/Mapper.py:111-139).
    adam_state_dtype: str = "float32"


def from_cfg(cfg) -> MapperConfig:
    m = cfg["mapping"]
    return MapperConfig(
        pixels=m["pixels"], iters=m["iters"], iters_first=m["iters_first"],
        every_frame=m["every_frame"], keyframe_every=m["keyframe_every"],
        mapping_window_size=m["mapping_window_size"],
        joint_opt=m.get("joint_opt", True),
        joint_opt_cam_lr=m.get("joint_opt_cam_lr", 0.001),
        lr_decoders=m["lr"]["decoders_lr"], lr_hash=m["lr"]["hash_grids_lr"],
        lr_c_hash=m["lr"]["c_hash_grids_lr"],
        lr_factor=m.get("lr_factor", 1.0),
        lr_first_factor=m.get("lr_first_factor", 5.0),
        w_sdf_fs=m["w_sdf_fs"], w_sdf_center=m["w_sdf_center"],
        w_sdf_tail=m["w_sdf_tail"], w_depth=m["w_depth"],
        w_color=m["w_color"], mask_mode=cfg.get("m_mask_mode", "original"),
        max_fused_iters=int(m.get("max_fused_iters", 0)),
        adam_state_dtype=m.get("adam_state_dtype", "float32"),
    )


def make_optimizer(mc: MapperConfig, lr_factor: float = 1.0):
    """Per-group Adam mirroring Mapper.create_optimizer (Mapper.py:111-139):
    decoders (incl. beta), grid tables, and BA poses. Labels are derived
    from the opt_tree structure so both encodings (separate sdf/color hash
    tables, or one shared brick table) get the right groups.

    `lr_factor` bakes a static scene-group LR multiplier into the optimizer
    (kept for tests/tools); the jitted phases instead take a *runtime*
    `lr_scale` (see make_mapping_step) so the reference's first-frame x5
    factor (Mapper.py:512-516) doesn't need a second compiled program."""

    def label_fn(opt_tree):
        def scene_label(key):
            if key == "sdf_table" or key == "table":
                return "hash"
            if key == "color_table":
                return "c_hash"
            return "dec"

        return {
            "scene": {k: jax.tree_util.tree_map(
                lambda _: scene_label(k), v)
                for k, v in opt_tree["scene"].items()},
            "poses": "poses",
        }

    if mc.adam_state_dtype == "bfloat16":
        from unislam_tpu.core.optim import adam_lp
        table_adam = partial(adam_lp, state_dtype=jnp.bfloat16)
    elif mc.adam_state_dtype == "float32":
        table_adam = optax.adam
    else:
        # reject typos ("bf16", "float16", ...) loudly instead of silently
        # switching the table optimizer to exact-f32 adam
        raise ValueError(
            f"mapping.adam_state_dtype must be 'bfloat16' or 'float32', "
            f"got {mc.adam_state_dtype!r}")
    return optax.multi_transform(
        {"dec": optax.adam(mc.lr_decoders * lr_factor),
         "hash": table_adam(mc.lr_hash * lr_factor),
         "c_hash": table_adam(mc.lr_c_hash * lr_factor),
         "poses": optax.adam(mc.joint_opt_cam_lr)},
        label_fn)


def make_loss_fn(sc: SceneConfig, rc: RenderConfig, mc: MapperConfig,
                 intr: Intrinsics, max_kf: int, bank_size: int, mesh=None):
    """The mapping loss over a freshly drawn keyframe-window ray batch.
    Factored out of make_mapping_step so profiling/tests can time it alone."""
    bound = jnp.asarray(sc.bound)
    w_sdf = losses_lib.SdfLossWeights(mc.w_sdf_fs, mc.w_sdf_center,
                                      mc.w_sdf_tail)
    n_rays = mc.pixels + mc.extra_rays
    HW = intr.H * intr.W

    def loss_fn(opt_tree, bank: KeyframeBank, cur_depth, cur_color,
                cur_rays_d, sel_probs, extra_probs, pose_grad_mask, key):
        scene = opt_tree["scene"]
        poses = opt_tree["poses"]
        # BA gradient gating: fixed slots see only the stop-gradient value.
        poses = poses * pose_grad_mask + \
            jax.lax.stop_gradient(poses) * (1.0 - pose_grad_mask)

        k_slot, k_extra, k_pix_b, k_pix_c, k_render = jax.random.split(key, 5)
        slot_main = jax.random.categorical(
            k_slot, jnp.log(sel_probs + 1e-20), shape=(mc.pixels,))
        slot_extra = jax.random.categorical(
            k_extra, jnp.log(extra_probs + 1e-20), shape=(mc.extra_rays,))
        slot = jnp.concatenate([slot_main, slot_extra])
        pix_b = jax.random.randint(k_pix_b, (n_rays,), 0, bank_size)
        pix_c = jax.random.randint(k_pix_c, (n_rays,), 0, HW)
        if mesh is not None:
            from unislam_tpu.parallel.sharding import shard_rays
            slot, pix_b, pix_c = shard_rays(mesh, slot, pix_b, pix_c)

        is_cur = slot == max_kf
        kf_slot = jnp.minimum(slot, max_kf - 1)
        gt_depth = jnp.where(is_cur, cur_depth.reshape(-1)[pix_c],
                             bank.depth[kf_slot, pix_b])
        gt_color = jnp.where(is_cur[:, None], cur_color.reshape(-1, 3)[pix_c],
                             bank.color[kf_slot, pix_b])
        dir_cam = jnp.where(is_cur[:, None], cur_rays_d.reshape(-1, 3)[pix_c],
                            bank.rays_d[kf_slot, pix_b])

        c2w = pose_lib.cam_pose_to_matrix(poses)           # (max_kf+1, 4, 4)
        # Per-ray pose selection as a one-hot matmul, NOT c2w[slot]: the
        # gather's VJP is a scatter-add of R ray-gradients colliding into
        # ~max_kf slots, which XLA serializes (measured 48 ms/iter on TPU,
        # BENCHLOG.md); the matmul's VJP is a segment-sum on the MXU.
        onehot = (slot[:, None] == jnp.arange(max_kf + 1, dtype=slot.dtype)
                  ).astype(jnp.float32)                    # (R, max_kf+1)
        c2w_rays = (onehot @ c2w.reshape(max_kf + 1, 16)).reshape(-1, 4, 4)
        rot = c2w_rays[:, :3, :3]
        rays_d = jnp.einsum("nij,nj->ni", rot, dir_cam)
        rays_o = c2w_rays[:, :3, 3]

        far = rays_lib.ray_aabb_far(jax.lax.stop_gradient(rays_o),
                                    jax.lax.stop_gradient(rays_d), bound)
        inside = far >= gt_depth                 # Mapper.py:396-402 (gd==0 ok)

        out = renderer.render_rays(scene, sc, rc, rays_o, rays_d, gt_depth,
                                   k_render)

        pixel_unc = jax.lax.stop_gradient(out.pixel_unc)
        alpha_mask = (1.0 - pixel_unc) > 0.99
        depth_mask = (gt_depth > 0) & alpha_mask & inside

        if mc.mask_mode == "original":
            m_sdf = depth_mask.astype(jnp.float32)
            m_col = inside.astype(jnp.float32)   # color loss over all rays
            m_dep = depth_mask.astype(jnp.float32)
        else:  # "no_mask"
            m_sdf = m_col = m_dep = inside.astype(jnp.float32)

        loss = losses_lib.sdf_losses(out.sdf, out.z_vals, gt_depth, m_sdf,
                                     sc.truncation, w_sdf)
        loss = loss + mc.w_color * losses_lib.color_loss(gt_color, out.rgb,
                                                         m_col)
        loss = loss + mc.w_depth * losses_lib.depth_loss(gt_depth, out.depth,
                                                         m_dep)
        return loss

    return loss_fn


def make_mapping_step(sc: SceneConfig, rc: RenderConfig, mc: MapperConfig,
                      intr: Intrinsics, max_kf: int, bank_size: int,
                      mesh=None):
    """Build the jitted mapping step.

    step(opt_tree, opt_state, bank, cur_depth, cur_color, cur_rays_d,
         sel_probs, extra_probs, pose_grad_mask, key, lr_scale)
      -> (opt_tree', opt_state', loss)

    opt_tree = {"scene": scene params, "poses": (max_kf+1, 7)} where slot
    max_kf is the current frame's pose. sel_probs/extra_probs: (max_kf+1,)
    frame-slot sampling distributions. pose_grad_mask: (max_kf+1, 1) with 1
    where BA may move the pose.

    `lr_scale` is a RUNTIME scalar multiplying the scene-group updates
    (Adam's update is linear in its LR, so update*s == adam(lr*s) exactly,
    state included). The reference's first-mapping x5 LR factor
    (Mapper.py:512-516) previously forced a second compiled copy of the
    whole phase — on the axon-tunneled TPU each copy costs minutes of
    remote compile. Pose updates are deliberately NOT scaled (the reference
    never scales joint_opt_cam_lr).
    """
    loss_fn = make_loss_fn(sc, rc, mc, intr, max_kf, bank_size, mesh)
    opt = make_optimizer(mc)

    def _scaled(updates, lr_scale):
        return {
            "scene": jax.tree_util.tree_map(lambda u: u * lr_scale,
                                            updates["scene"]),
            "poses": updates["poses"],
        }

    @jax.jit
    def step(opt_tree, opt_state, bank, cur_depth, cur_color, cur_rays_d,
             sel_probs, extra_probs, pose_grad_mask, key, lr_scale):
        loss, grads = jax.value_and_grad(loss_fn)(
            opt_tree, bank, cur_depth, cur_color, cur_rays_d, sel_probs,
            extra_probs, pose_grad_mask, key)
        updates, opt_state = opt.update(grads, opt_state, opt_tree)
        opt_tree = optax.apply_updates(opt_tree, _scaled(updates, lr_scale))
        return opt_tree, opt_state, loss

    # opt_tree/opt_state are donated: the driver always rebinds them, and
    # donation lets XLA update the ~60 MB table + 120 MB Adam state in
    # place instead of copying per phase dispatch.
    @partial(jax.jit, donate_argnums=(0, 1))
    def map_phase(opt_tree, opt_state, bank, cur_depth, cur_color,
                  cur_rays_d, sel_probs, extra_probs, pose_grad_mask, key,
                  n_iters, lr_scale, iter0=jnp.int32(0)):
        """Whole mapping phase in ONE device dispatch: `n_iters`
        (dynamic, lax.fori_loop) Adam iterations over the window batch
        (the reference's joint_iter loop, Mapper.py:366-445).

        `iter0` offsets the per-iteration key folding so a phase split
        across several dispatches (mc.max_fused_iters, used to bound
        single-dispatch duration on hash-mode graphs) draws the exact same
        ray batches as one fused dispatch."""

        def body(i, carry):
            opt_tree, opt_state, _ = carry
            it_key = jax.random.fold_in(key, iter0 + i)
            loss, grads = jax.value_and_grad(loss_fn)(
                opt_tree, bank, cur_depth, cur_color, cur_rays_d,
                sel_probs, extra_probs, pose_grad_mask, it_key)
            updates, opt_state = opt.update(grads, opt_state, opt_tree)
            opt_tree = optax.apply_updates(opt_tree,
                                           _scaled(updates, lr_scale))
            return (opt_tree, opt_state, loss)

        opt_tree, opt_state, loss = jax.lax.fori_loop(
            0, n_iters, body, (opt_tree, opt_state, jnp.float32(0.0)))
        return opt_tree, opt_state, loss

    return step, opt, map_phase
