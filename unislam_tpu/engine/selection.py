"""Co-visibility keyframe selection + loop-closure detection.

TPU-native rewrite of Mapper.keyframe_selection_LC
(/root/reference/src/Mapper.py:177-273): cast `num_rays` rays from the
current frame, place `num_samples` points along each between 0.8*depth and
depth+0.5, project the points into every stored keyframe, and measure the
fraction that lands inside the (edge-margined) image with negative camera z
(OpenGL forward).

Everything is computed for all `max_kf` slots with validity masks — one jit,
any keyframe count. Returns masks; the host driver turns them into sampling
probabilities (and counts loop closures).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from unislam_tpu.core import pose as pose_lib
from unislam_tpu.core import rays as rays_lib
from unislam_tpu.core.rays import Intrinsics
from unislam_tpu.engine.keyframes import KeyframeBank


class SelectionResult(NamedTuple):
    percent_inside: jnp.ndarray  # (max_kf,) overlap with each keyframe slot
    normal_mask: jnp.ndarray     # (max_kf,) bool: the non-LC window
    lc_mask: jnp.ndarray         # (max_kf,) bool: loop-closure window
    lc_flag: jnp.ndarray         # () bool: loop closure fired
    back_mask: jnp.ndarray       # (max_kf,) bool: tracking-back top-k window


def make_selection_fn(intr: Intrinsics, max_kf: int, num_rays: int = 50,
                      num_samples: int = 8, lc_enabled: bool = True,
                      lc_ts: float = 0.95, lc_min_gap: int = 100,
                      window_size: int = 20, edge: int = 20):
    """Build the jitted selection function.

    select(bank, cur_depth, cur_color, cur_c2w, frame_idx, key)
        -> SelectionResult
    """
    K = jnp.asarray([[intr.fx, 0.0, intr.cx],
                     [0.0, intr.fy, intr.cy],
                     [0.0, 0.0, 1.0]], jnp.float32)

    @jax.jit
    def select(bank: KeyframeBank, cur_depth, cur_color, cur_c2w, frame_idx,
               key) -> SelectionResult:
        i, j, gd, _ = rays_lib.sample_pixels(
            key, num_rays, 0, intr.H, 0, intr.W, cur_depth, cur_color)
        rays_o, rays_d = rays_lib.rays_from_uv(i, j, cur_c2w, intr)
        ray_valid = gd > 0                                     # (R,)

        t_vals = jnp.linspace(0.0, 1.0, num_samples)
        near = (gd * 0.8)[:, None]
        far = (gd + 0.5)[:, None]
        z = near * (1.0 - t_vals)[None, :] + far * t_vals[None, :]   # (R, S)
        pts = rays_o[:, None, :] + rays_d[:, None, :] * z[..., None]
        pts = pts.reshape(-1, 3)                               # (R*S, 3)
        pt_valid = jnp.repeat(ray_valid, num_samples)          # (R*S,)

        kf_c2w = pose_lib.cam_pose_to_matrix(bank.pose7)       # (max_kf,4,4)
        w2c = jnp.linalg.inv(kf_c2w)
        homo = jnp.concatenate([pts, jnp.ones_like(pts[:, :1])], axis=-1)
        cam = jnp.einsum("kij,nj->kni", w2c, homo)[..., :3]    # (max_kf,N,3)
        cam = cam.at[..., 0].multiply(-1.0)                    # Mapper.py:224
        uv = jnp.einsum("ij,knj->kni", K, cam)
        zc = uv[..., 2:] + 1e-5
        uv = uv[..., :2] / zc

        inside = (uv[..., 0] < intr.W - edge) & (uv[..., 0] > edge) & \
                 (uv[..., 1] < intr.H - edge) & (uv[..., 1] > edge) & \
                 (zc[..., 0] < 0) & pt_valid[None, :]
        denom = jnp.maximum(jnp.sum(pt_valid), 1)
        percent_inside = jnp.sum(inside, axis=1) / denom       # (max_kf,)

        slots = jnp.arange(max_kf)
        active = slots < bank.count
        # reference excludes the last two keyframes from selection (they are
        # always in the window), Mapper.py:215,307
        old = slots < bank.count - 2
        percent_inside = jnp.where(old, percent_inside, 0.0)

        normal_mask = old

        best = jnp.argmax(percent_inside)
        best_gap = frame_idx - bank.frame_idx[best]
        lc_flag = lc_enabled & (percent_inside[best] > lc_ts) & \
            (best_gap > lc_min_gap)
        lc_mask = old & (slots >= best)

        # tracking-back: top-(window_size-1) by overlap among >0 slots
        # (Mapper.py:262-271)
        order = jnp.argsort(-percent_inside)
        rank = jnp.zeros(max_kf, jnp.int32).at[order].set(slots)
        back_mask = (rank < window_size - 1) & (percent_inside > 0.0) & old

        return SelectionResult(percent_inside, normal_mask, lc_mask,
                               jnp.asarray(lc_flag), back_mask)

    return select


def window_probs(max_kf: int, count: int, sel_mask, extra_newest: int = 10,
                 use_extra_threshold: int = 20):
    """Host-side: turn a keyframe-slot mask into (max_kf+1,) frame-sampling
    probabilities for the mapping step (slot max_kf = current frame).

    The window is sel_mask + the last two keyframes + the current frame,
    all uniformly weighted (the reference's per-frame equal ray allocation,
    Mapper.py:309-315). Also returns the newest-`extra_newest` distribution
    for the +200-ray draw (Mapper.py:385-393), falling back to the main
    window when count <= use_extra_threshold.
    """
    import numpy as np

    mask = np.zeros(max_kf + 1, dtype=np.float64)
    mask[:max_kf] = np.asarray(sel_mask, dtype=np.float64)
    if count >= 1:
        mask[count - 1] = 1.0
    if count >= 2:
        mask[count - 2] = 1.0
    mask[max_kf] = 1.0  # current frame
    probs = mask / mask.sum()

    extra = np.zeros(max_kf + 1, dtype=np.float64)
    if count > use_extra_threshold:
        newest = np.arange(max(0, count - extra_newest), count)
        extra[newest] = 1.0
        extra /= extra.sum()
    else:
        extra = probs
    return probs, extra
