"""Camera tracking: per-frame 7-dof pose optimization against the frozen map.

TPU-native rewrite of /root/reference/src/Tracker.py:34-388. One jitted step
does: sample pixels in the inner image region -> build rays *from the pose
being optimized* -> render against the (frozen) scene params -> masked
SDF/color/depth loss -> Adam update on (quat, trans) with separate LRs.

Design deltas:
- The reference filters rays by the inside-bound test before rendering
  (Tracker.py:177-202, variable shapes); we render the fixed batch and fold
  the filter into the loss masks — identical loss value, zero recompiles.
- Rays the reference would have dropped get a dummy positive render depth
  (their gt depth is 0) so the renderer's no-depth probe never fires during
  tracking.
- The depth-error median filter (Tracker.py:213-218) uses a masked median.
- The iteration loop, best-of-iters pose keeping, and the activated-mapping
  trigger (Tracker.py:331-363) live in the host driver around this step.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax

from unislam_tpu.core import losses as losses_lib
from unislam_tpu.core import pose as pose_lib
from unislam_tpu.core import rays as rays_lib
from unislam_tpu.core.rays import Intrinsics
from unislam_tpu.models.scene import SceneConfig
from unislam_tpu.render import renderer
from unislam_tpu.render.renderer import RenderConfig


class TrackerConfig(NamedTuple):
    pixels: int = 2000
    iters: int = 8
    lr_T: float = 0.001
    lr_R: float = 0.001
    ignore_edge_W: int = 75
    ignore_edge_H: int = 75
    w_sdf_fs: float = 10.0
    w_sdf_center: float = 200.0
    w_sdf_tail: float = 50.0
    w_depth: float = 1.0
    w_color: float = 5.0
    const_speed_assumption: bool = True
    gt_camera: bool = False
    activated_mapping_mode: bool = True
    uncertainty_ts: float = 0.001
    mask_mode: str = "original"


def from_cfg(cfg) -> TrackerConfig:
    t = cfg["tracking"]
    return TrackerConfig(
        pixels=t["pixels"], iters=t["iters"], lr_T=t["lr_T"], lr_R=t["lr_R"],
        ignore_edge_W=t["ignore_edge_W"], ignore_edge_H=t["ignore_edge_H"],
        w_sdf_fs=t["w_sdf_fs"], w_sdf_center=t["w_sdf_center"],
        w_sdf_tail=t["w_sdf_tail"], w_depth=t["w_depth"],
        w_color=t["w_color"],
        const_speed_assumption=t.get("const_speed_assumption", True),
        gt_camera=t.get("gt_camera", False),
        activated_mapping_mode=t.get("activated_mapping_mode", True),
        uncertainty_ts=t.get("uncertainty_ts", 0.001),
        mask_mode=cfg.get("t_mask_mode", "original"),
    )


def make_optimizer(tc: TrackerConfig):
    """Adam with betas (0.5, 0.999) and separate R/T learning rates
    (Tracker.py:328-329). Operates on the dict {'R': (4,), 'T': (3,)}."""
    return optax.multi_transform(
        {"R": optax.adam(tc.lr_R, b1=0.5, b2=0.999),
         "T": optax.adam(tc.lr_T, b1=0.5, b2=0.999)},
        {"R": "R", "T": "T"})


def make_tracking_step(sc: SceneConfig, rc: RenderConfig, tc: TrackerConfig,
                       intr: Intrinsics, mesh=None):
    """Build the jitted tracking step.

    step(params, pose, opt_state, depth_img, color_img, key) ->
        (pose', opt_state', loss, mean_pixel_unc)
    where pose = {'R': (4,), 'T': (3,)} and loss/unc are evaluated at the
    *input* pose (pre-update), matching the reference's best-pose bookkeeping.
    """
    opt = make_optimizer(tc)
    bound = jnp.asarray(sc.bound)
    w_sdf = losses_lib.SdfLossWeights(tc.w_sdf_fs, tc.w_sdf_center,
                                      tc.w_sdf_tail)

    def loss_fn(pose, params, depth_img, color_img, key):
        k_pix, k_render = jax.random.split(key)
        pose7 = jnp.concatenate([pose["R"], pose["T"]])
        c2w = pose_lib.cam_pose_to_matrix(pose7[None])[0]

        i, j, gt_depth, gt_color = rays_lib.sample_pixels(
            k_pix, tc.pixels, tc.ignore_edge_H, intr.H - tc.ignore_edge_H,
            tc.ignore_edge_W, intr.W - tc.ignore_edge_W, depth_img, color_img)
        if mesh is not None:
            from unislam_tpu.parallel.sharding import shard_rays
            i, j, gt_depth, gt_color = shard_rays(mesh, i, j, gt_depth,
                                                  gt_color)
        rays_o, rays_d = rays_lib.rays_from_uv(i, j, c2w, intr)

        far = rays_lib.ray_aabb_far(jax.lax.stop_gradient(rays_o),
                                    jax.lax.stop_gradient(rays_d), bound)
        inside = (far >= gt_depth) & (gt_depth > 0)

        # dummy depth for excluded rays keeps every ray on the cheap
        # depth-guided sampling path; they are masked out of all losses.
        render_depth = jnp.where(gt_depth > 0, gt_depth, 1.0)
        out = renderer.render_rays(params, sc, rc, rays_o, rays_d,
                                   render_depth, k_render)

        pixel_unc = jax.lax.stop_gradient(out.pixel_unc)
        alpha_mask = (1.0 - pixel_unc) > 0.99
        depth_err = jnp.abs(gt_depth - jax.lax.stop_gradient(out.depth))
        err_median = losses_lib.masked_median(depth_err, inside)
        depth_mask = (depth_err < 10.0 * err_median) & alpha_mask & inside

        if tc.mask_mode == "original":
            m = depth_mask.astype(jnp.float32)
        else:  # "no_mask"
            m = inside.astype(jnp.float32)
        loss = losses_lib.sdf_losses(out.sdf, out.z_vals, gt_depth, m,
                                     sc.truncation, w_sdf)
        loss = loss + tc.w_color * losses_lib.color_loss(gt_color, out.rgb, m)
        loss = loss + tc.w_depth * losses_lib.depth_loss(gt_depth, out.depth,
                                                         m)
        mean_unc = losses_lib.masked_mean(out.pixel_unc, inside)
        return loss, mean_unc

    @jax.jit
    def step(params, pose, opt_state, depth_img, color_img, key):
        (loss, mean_unc), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(pose, params, depth_img, color_img, key)
        updates, opt_state = opt.update(grads, opt_state, pose)
        pose = optax.apply_updates(pose, updates)
        return pose, opt_state, loss, mean_unc

    @jax.jit
    def track_frame(params, pose, opt_state, depth_img, color_img, key,
                    n_iters, iter0=0, carry=None):
        """Whole-frame tracking in ONE device dispatch: `n_iters` (dynamic,
        lax.fori_loop) optimization iterations, keeping the best-loss pose
        (Tracker.py:331-365).

        `iter0` + `carry=(best7, min_loss, unc_prev, unc_last)` continue the
        SAME frame from a previous dispatch with an unchanged fold_in key
        schedule, so two chained dispatches are bit-identical to one fused
        dispatch of the combined length. The host driver uses this for the
        reference's mid-loop activated-mapping doubling (Tracker.py:352-357:
        the trigger extends the CURRENT frame's while-loop 8 -> 16).

        Returns (pose, opt_state, best_pose7, min_loss, unc_penultimate,
        unc_last)."""

        def body(i, c):
            pose, opt_state, best7, min_loss, unc_prev, unc_last = c
            # iter0 offsets the key schedule only; the loop itself stays
            # 0-based (a dynamic LOWER bound hits a TPU backend
            # INVALID_ARGUMENT — same pattern as mapper.map_phase)
            it_key = jax.random.fold_in(key, iter0 + i)
            cur7 = jnp.concatenate([pose["R"], pose["T"]])
            (loss, unc), grads = jax.value_and_grad(loss_fn, has_aux=True)(
                pose, params, depth_img, color_img, it_key)
            updates, opt_state = opt.update(grads, opt_state, pose)
            pose = optax.apply_updates(pose, updates)
            better = loss < min_loss
            best7 = jnp.where(better, cur7, best7)
            min_loss = jnp.where(better, loss, min_loss)
            return (pose, opt_state, best7, min_loss, unc_last, unc)

        if carry is None:
            init7 = jnp.concatenate([pose["R"], pose["T"]])
            carry = (init7, jnp.float32(jnp.inf),
                     jnp.float32(0.0), jnp.float32(0.0))
        c = (pose, opt_state) + tuple(carry)
        return jax.lax.fori_loop(0, n_iters, body, c)

    return step, opt, track_frame


def init_pose_const_speed(prev: jnp.ndarray, prev2: jnp.ndarray) -> jnp.ndarray:
    """Linear motion model in quat+trans space: 2*p[t-1] - p[t-2]
    (Tracker.py:315-319). prev/prev2: (4,4) c2w."""
    p = pose_lib.matrix_to_cam_pose(jnp.stack([prev2, prev]))
    return 2.0 * p[1] - p[0]
