"""SDF / color / depth losses with static-shape mask weighting.

The reference indexes tensors by boolean masks (variable shapes,
/root/reference/src/Tracker.py:113-147,210-238 and src/Mapper.py:141-175);
here every loss is a weighted mean with 0/1 weights so jitted steps never
recompile. Weighted means equal the reference's masked means exactly.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


def masked_mean(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Mean of x over elements where mask is truthy (0 if mask empty)."""
    mask = mask.astype(x.dtype)
    denom = jnp.maximum(jnp.sum(mask), 1.0)
    return jnp.sum(x * mask) / denom


def masked_median(x: jnp.ndarray, mask: jnp.ndarray) -> jnp.ndarray:
    """Median of x over masked elements, matching torch.median's lower-middle
    convention for even counts (used for the tracker's depth-error filter,
    /root/reference/src/Tracker.py:214-216)."""
    big = jnp.asarray(jnp.finfo(x.dtype).max, dtype=x.dtype)
    vals = jnp.where(mask, x, big)
    vals = jnp.sort(vals)
    count = jnp.sum(mask.astype(jnp.int32))
    idx = jnp.maximum(count - 1, 0) // 2
    return vals[idx]


class SdfLossWeights(NamedTuple):
    fs: float
    center: float
    tail: float


def sdf_losses(sdf: jnp.ndarray, z_vals: jnp.ndarray, gt_depth: jnp.ndarray,
               ray_mask: jnp.ndarray, truncation: float,
               w: SdfLossWeights) -> jnp.ndarray:
    """Free-space / center / tail SDF supervision.

    sdf, z_vals: (R, N); gt_depth: (R,); ray_mask: (R,) 0/1 — rays excluded by
    the caller's uncertainty/depth filters contribute to no region.

    Mirrors /root/reference/src/Tracker.py:113-147 == src/Mapper.py:141-175:
      front:  z < gt - trunc          -> (sdf - 1)^2
      center: |z - gt| < 0.4 * trunc  -> (z + sdf*trunc - gt)^2
      tail:   remaining band          -> (z + sdf*trunc - gt)^2
    each averaged over its own mask, then weighted-summed.
    """
    gd = gt_depth[:, None]
    rm = ray_mask[:, None].astype(jnp.bool_)
    front = (z_vals < (gd - truncation)) & rm
    back = (z_vals > (gd + truncation)) & rm
    center = (z_vals > (gd - 0.4 * truncation)) & \
             (z_vals < (gd + 0.4 * truncation)) & rm
    tail = (~front) & (~back) & (~center) & rm

    fs_loss = masked_mean(jnp.square(sdf - 1.0), front)
    est_depth = z_vals + sdf * truncation
    center_loss = masked_mean(jnp.square(est_depth - gd), center)
    tail_loss = masked_mean(jnp.square(est_depth - gd), tail)
    return w.fs * fs_loss + w.center * center_loss + w.tail * tail_loss


def color_loss(gt_color: jnp.ndarray, color: jnp.ndarray,
               ray_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean squared RGB error; gt/color (R, 3), ray_mask (R,)."""
    sq = jnp.square(gt_color - color)
    return masked_mean(sq, jnp.broadcast_to(ray_mask[:, None], sq.shape))


def depth_loss(gt_depth: jnp.ndarray, depth: jnp.ndarray,
               ray_mask: jnp.ndarray) -> jnp.ndarray:
    """Masked mean squared depth error; (R,) each."""
    return masked_mean(jnp.square(gt_depth - depth), ray_mask)
