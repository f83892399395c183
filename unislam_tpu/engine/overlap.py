"""Tracker-parallel-mapper wall-clock overlap on a multi-device mesh.

The reference overlaps tracking and mapping as two PROCESSES over shared
CUDA tensors with spin-wait handshakes
(/root/reference/src/UNISLAM.py:90-94,287-301): the tracker reads a map
snapshot that lags by up to `every_frame` frames while the mapper
optimizes. The TPU-native redesign keeps ONE host process and gets the
same wall-clock overlap from JAX async dispatch over disjoint device sets:

  * mapping phases, selection, and the keyframe bank live on
    `map_devices` — a single chip, or a ray-sharded sub-mesh when more
    than one chip is left over (`parallel/sharding.py`);
  * tracking runs on `track_device` against a params snapshot that is
    refreshed by an async ICI copy dispatched right after each mapping
    phase (it executes as soon as the phase finishes, overlapping the
    next frames' tracking) and swapped in as soon as it is ready.

Python never blocks on an in-flight mapping phase: the loss fetch and the
BA pose write-back are deferred to the next mapping dispatch (the natural
sync point — exactly where the reference's window-boundary handshake
sits, Tracker.py:297-300). The tracker therefore sees a map lagging by up
to `every_frame` frames, the reference's documented semantics, while both
device queues stay busy.

Scheduling (cadence, activated mapping, iteration doubling, LC, keyframe
policy) is inherited unchanged from the sequential driver.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import numpy as np

from unislam_tpu.core import pose as pose_lib
from unislam_tpu.engine import mapper as mapper_lib
from unislam_tpu.engine.slam import UniSLAM
from unislam_tpu.parallel import sharding as sharding_lib


def _all_ready(tree) -> bool:
    """True when every leaf of a pytree of jax.Arrays has materialized
    (non-blocking); conservatively False if the runtime lacks is_ready."""
    for leaf in jax.tree_util.tree_leaves(tree):
        is_ready = getattr(leaf, "is_ready", None)
        if is_ready is None:
            return False
        if not is_ready():
            return False
    return True


class OverlappedSLAM(UniSLAM):
    """UniSLAM with tracking and mapping on disjoint device sets.

    Requires >= 2 local devices (falls back is the caller's choice; see
    `runtime.SLAMRuntime`, which selects this driver only when
    cfg['parallel']['overlap'] is set and devices are available).
    """

    def __init__(self, cfg: Dict[str, Any], dataset,
                 output: Optional[str] = None, seed: int = 0,
                 track_device=None, map_devices=None):
        super().__init__(cfg, dataset, output=output, seed=seed)
        devs = jax.devices()
        if track_device is None and map_devices is None and len(devs) < 2:
            raise ValueError(
                f"OverlappedSLAM needs >= 2 devices, found {len(devs)}; "
                "use the sequential UniSLAM driver on one chip")
        self.track_device = track_device if track_device is not None \
            else devs[0]
        map_devs = list(map_devices) if map_devices is not None else devs[1:]

        if len(map_devs) > 1:
            # leftover chips form a ray-sharded mapping sub-mesh: per-ray
            # arrays split over ICI, table/MLP grads all-reduced by XLA
            self.map_mesh = sharding_lib.make_mesh(devices=map_devs)
            self.map_step, self.map_opt, self.map_phase = \
                mapper_lib.make_mapping_step(
                    self.sc, self.rc, self.mc, self.intr, self.max_kf,
                    self.bank_size, mesh=self.map_mesh)
            self._map_placement = sharding_lib.replicated(self.map_mesh)
        else:
            self.map_mesh = None
            self._map_placement = map_devs[0]

        # heavy state is committed to the mapping device(s); the tracker
        # holds a snapshot on its own chip
        self.params = jax.device_put(self.params, self._map_placement)
        self.bank = jax.device_put(self.bank, self._map_placement)
        self.cam_rays_d = jax.device_put(self.cam_rays_d,
                                         self._map_placement)
        self._track_params = jax.device_put(self.params, self.track_device)
        self._next_snapshot = None
        self._pending_ba = None
        self._pending_loss = None
        self.last_map_loss = None
        self._map_frame_cache = (-1, None, None)

    # -- deferred-fetch hooks ------------------------------------------
    def _tracking_params(self):
        # adopt the freshest completed snapshot without ever blocking
        if self._next_snapshot is not None and \
                _all_ready(self._next_snapshot):
            self._track_params = self._next_snapshot
            self._next_snapshot = None
        return self._track_params

    def _writeback_ba_pose(self, idx: int, pose7):
        self._pending_ba = (idx, pose7)

    def _finish_loss(self, loss):
        self._pending_loss = loss
        return loss  # device scalar; materialized at the next sync point

    def sync(self):
        """Materialize everything deferred from the last mapping phase."""
        if self._pending_ba is not None:
            idx, pose7 = self._pending_ba
            self.est_c2w[idx] = np.asarray(
                pose_lib.cam_pose_to_matrix(pose7[None])[0])
            self._pending_ba = None
        if self._pending_loss is not None:
            self.last_map_loss = float(self._pending_loss)
            self._pending_loss = None
        if self._next_snapshot is not None:
            self._track_params = self._next_snapshot
            self._next_snapshot = None

    # -- device placement of per-frame inputs ---------------------------
    def _map_inputs(self, idx: int, depth_img, color_img):
        if self._map_frame_cache[0] != idx:
            self._map_frame_cache = (
                idx,
                jax.device_put(depth_img, self._map_placement),
                jax.device_put(color_img, self._map_placement))
        return self._map_frame_cache[1], self._map_frame_cache[2]

    def track_frame(self, idx: int, depth_img, color_img) -> np.ndarray:
        d = jax.device_put(depth_img, self.track_device)
        c = jax.device_put(color_img, self.track_device)
        return super().track_frame(idx, d, c)

    def map_frame(self, idx: int, depth_img, color_img, gt_c2w: np.ndarray):
        self.sync()  # previous phase's loss / BA pose land here
        d, c = self._map_inputs(idx, depth_img, color_img)
        out = super().map_frame(idx, d, c, gt_c2w)
        # refresh the tracker snapshot: the copy is dispatched now and
        # executes (over ICI) the moment the mapping phase finishes,
        # overlapping the next frames' tracking on the other chip
        self._next_snapshot = jax.device_put(self.params, self.track_device)
        return out

    def maybe_add_keyframe(self, idx: int, depth_img, color_img,
                           gt_c2w: np.ndarray):
        d, c = self._map_inputs(idx, depth_img, color_img)
        super().maybe_add_keyframe(idx, d, c, gt_c2w)

    def run(self, progress: bool = True):
        out = super().run(progress)
        self.sync()
        return out
