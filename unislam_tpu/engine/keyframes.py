"""Device-resident keyframe pixel bank (preallocated ring of arrays).

TPU-native replacement for the reference's python list of per-keyframe dicts
holding 10%-of-pixels tensors (/root/reference/src/Mapper.py:528-541, and the
dead-code KeyFrameDatabase, src/utils/keyframe.py). All storage is
preallocated jnp arrays of static shape, so the mapping step jits once:

    depth   (max_kf, B)       sampled sensor depths
    color   (max_kf, B, 3)    sampled RGB
    rays_d  (max_kf, B, 3)    camera-frame ray dirs of the sampled pixels
    pose7   (max_kf, 7)       estimated c2w (quat+trans) — BA updates these
    gt_c2w  (max_kf, 4, 4)    ground-truth poses (eval only)
    frame_idx (max_kf,)       source frame id, -1 = empty slot

B = round(H*W * keep_frac) mirrors the reference's 10% pixel subsample.
"""

from __future__ import annotations

from typing import Any, Dict, NamedTuple

import jax
import jax.numpy as jnp

from unislam_tpu.core import pose as pose_lib


class KeyframeBank(NamedTuple):
    depth: jnp.ndarray
    color: jnp.ndarray
    rays_d: jnp.ndarray
    pose7: jnp.ndarray
    gt_c2w: jnp.ndarray
    frame_idx: jnp.ndarray
    count: jnp.ndarray  # scalar int32


def init_bank(max_kf: int, bank_size: int) -> KeyframeBank:
    return KeyframeBank(
        depth=jnp.zeros((max_kf, bank_size), jnp.float32),
        color=jnp.zeros((max_kf, bank_size, 3), jnp.float32),
        rays_d=jnp.zeros((max_kf, bank_size, 3), jnp.float32),
        pose7=jnp.tile(
            jnp.asarray([1, 0, 0, 0, 0, 0, 0], jnp.float32), (max_kf, 1)),
        gt_c2w=jnp.tile(jnp.eye(4, dtype=jnp.float32), (max_kf, 1, 1)),
        frame_idx=jnp.full((max_kf,), -1, jnp.int32),
        count=jnp.zeros((), jnp.int32),
    )


def make_add_keyframe(H: int, W: int, bank_size: int):
    """Jitted: subsample a frame into the next free slot.

    Pixels are drawn without replacement (the reference's randperm,
    Mapper.py:535) via jax.random.permutation.
    """

    @jax.jit
    def add(bank: KeyframeBank, depth: jnp.ndarray, color: jnp.ndarray,
            rays_d: jnp.ndarray, est_c2w: jnp.ndarray, gt_c2w: jnp.ndarray,
            frame_idx: jnp.ndarray, key: jax.Array) -> KeyframeBank:
        perm = jax.random.permutation(key, H * W)[:bank_size]
        slot = jnp.minimum(bank.count, bank.depth.shape[0] - 1)
        p7 = pose_lib.matrix_to_cam_pose(est_c2w[None])[0]
        return KeyframeBank(
            depth=bank.depth.at[slot].set(depth.reshape(-1)[perm]),
            color=bank.color.at[slot].set(color.reshape(-1, 3)[perm]),
            rays_d=bank.rays_d.at[slot].set(rays_d.reshape(-1, 3)[perm]),
            pose7=bank.pose7.at[slot].set(p7),
            gt_c2w=bank.gt_c2w.at[slot].set(gt_c2w),
            frame_idx=bank.frame_idx.at[slot].set(frame_idx),
            count=jnp.minimum(bank.count + 1, bank.depth.shape[0]),
        )

    return add


def make_evict_keyframe(max_kf: int):
    """Jitted compacting eviction: remove `slot`, shift newer keyframes down
    one, decrement count.

    Compaction (not a ring overwrite) preserves the slot-order == temporal-
    order invariant that window selection relies on ("last two keyframes" =
    slots count-1/count-2, selection.py:84). The reference never evicts (its
    keyframe list is unbounded, /root/reference/src/Mapper.py:528-541); a
    preallocated bank needs a policy once `count == max_kf` — the driver
    prefers evicting tracking-back extras, then the oldest cadence keyframe
    after the anchor (slam.py)."""

    def _compact(a: jnp.ndarray, slot: jnp.ndarray) -> jnp.ndarray:
        idx = jnp.arange(max_kf)
        src = jnp.minimum(jnp.where(idx < slot, idx, idx + 1), max_kf - 1)
        return a[src]

    @jax.jit
    def evict(bank: KeyframeBank, slot: jnp.ndarray) -> KeyframeBank:
        return KeyframeBank(
            depth=_compact(bank.depth, slot),
            color=_compact(bank.color, slot),
            rays_d=_compact(bank.rays_d, slot),
            pose7=_compact(bank.pose7, slot),
            gt_c2w=_compact(bank.gt_c2w, slot),
            frame_idx=_compact(bank.frame_idx, slot).at[max_kf - 1].set(-1),
            count=jnp.maximum(bank.count - 1, 0),
        )

    return evict
