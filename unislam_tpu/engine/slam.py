"""The SLAM driver: one process, two jitted phases, one scene pytree.

Replaces the reference's two-process orchestration (UNISLAM.run spawning
Tracker.run / Mapper.run with shared CUDA tensors and spin-wait handshakes,
/root/reference/src/UNISLAM.py:90-137,261-301) with a sequential host loop:

    for idx: track(idx)  ->  [map(idx) every `every_frame` / on activation]

The tracker therefore always sees the freshest map (the reference's tracker
reads a map that lags by up to `every_frame` frames — the handshake at
Tracker.py:297-300 only syncs at window boundaries); scheduling semantics
(activated mapping, tracking_back, iteration doubling, keyframe cadence,
loop closure) are preserved exactly.

Host-side state is tiny (pose lists, counters); all heavy state (scene
params, keyframe bank) lives on device across the whole run.
"""

from __future__ import annotations

import os
from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from unislam_tpu.core import pose as pose_lib
from unislam_tpu.core.rays import Intrinsics, camera_ray_dirs
from unislam_tpu.engine import keyframes as kf_lib
from unislam_tpu.engine import mapper as mapper_lib
from unislam_tpu.engine import selection as selection_lib
from unislam_tpu.engine import tracker as tracker_lib
from unislam_tpu.models import scene as scene_lib
from unislam_tpu.render.renderer import RenderConfig


def intrinsics_from_cfg(cfg) -> Intrinsics:
    """Apply crop_size / crop_edge intrinsic updates
    (/root/reference/src/UNISLAM.py:168-190)."""
    cam = cfg["cam"]
    H, W = cam["H"], cam["W"]
    fx, fy, cx, cy = cam["fx"], cam["fy"], cam["cx"], cam["cy"]
    if "crop_size" in cam:
        sy = cam["crop_size"][0] / H
        sx = cam["crop_size"][1] / W
        fx, fy, cx, cy = sx * fx, sy * fy, sx * cx, sy * cy
        H, W = cam["crop_size"][0], cam["crop_size"][1]
    edge = cam.get("crop_edge", 0)
    if edge > 0:
        H, W = H - 2 * edge, W - 2 * edge
        cx, cy = cx - edge, cy - edge
    return Intrinsics(H=H, W=W, fx=fx, fy=fy, cx=cx, cy=cy)


class UniSLAM:
    """Sequential tracker+mapper over a frame source.

    `dataset` yields (color (H,W,3) float [0,1], depth (H,W) float meters,
    gt_c2w (4,4)) numpy arrays via `dataset[i]` and defines `len`.
    """

    def __init__(self, cfg: Dict[str, Any], dataset, output: Optional[str] = None,
                 seed: int = 0):
        self.cfg = cfg
        self.dataset = dataset
        self.n_img = len(dataset)
        # background look-ahead decode (reference: 4-worker DataLoader with
        # pinned memory, Tracker.py:96-97; here a 1-worker prefetch suffices
        # because the driver is frame-sequential)
        if cfg.get("data", {}).get("prefetch", True):
            from unislam_tpu.data.prefetch import FramePrefetcher
            self._frames = FramePrefetcher(dataset)
        else:
            self._frames = dataset
        self._staged_frame = None  # (idx, color_dev, depth_dev, gt) or None
        self.verbose = cfg.get("verbose", False)
        self.output = output or cfg.get("data", {}).get("output", "output/run")

        self.intr = intrinsics_from_cfg(cfg)
        self.sc = scene_lib.make_scene_config(cfg)
        r = cfg["rendering"]
        self.rc = RenderConfig(n_stratified=r["n_stratified"],
                               n_importance=r["n_importance"],
                               perturb=bool(r.get("perturb", True)),
                               n_fine=int(r.get("n_fine", 0)),
                               lod_split=str(r.get("lod_split", "cost")),
                               lod_select=str(r.get("lod_select", "depth")),
                               n_fine_mid=int(r.get("n_fine_mid", 0)),
                               dedup_band=float(r.get("dedup_band", 0.0)))
        # tracking may query the map at a different LOD than mapping
        # (tracking.n_fine: -1 = coarse levels only, 0 = full ladder,
        # >0 = surface-LOD band; tracking.lod_split: which levels the band
        # gates — see brick_encoding.coarse_fine_split). Defaults: same
        # n_fine as rendering, but always the tracking-safe "cost" split
        # (query-gating a matmul level corrupts the pose gradient,
        # BENCHLOG.md round 3).
        t_nf = cfg["tracking"].get("n_fine", None)
        self.rc_track = self.rc._replace(
            n_fine=int(self.rc.n_fine if t_nf is None else t_nf),
            lod_split=str(cfg["tracking"].get("lod_split", "cost")),
            lod_select=str(cfg["tracking"].get("lod_select", "depth")),
            # scatter-row dedup only pays off where table gradients exist;
            # tracking freezes the scene, so its dedup would be pure
            # forward overhead (z-sort ops) — measured -11% track rays/s
            dedup_band=0.0)
        self.tc = tracker_lib.from_cfg(cfg)
        self.mc = mapper_lib.from_cfg(cfg)

        # optional multi-device execution (cfg["parallel"], TPU-specific —
        # the reference has no data parallelism, SURVEY §2.3): ray batches
        # sharded over a 1-D mesh, scene grads all-reduced by XLA; grid
        # tables optionally row-sharded.
        par = cfg.get("parallel", {})
        self.mesh = None
        if par.get("data_parallel", False):
            from unislam_tpu.parallel import sharding as par_sh
            self.mesh = par_sh.make_mesh(par.get("n_devices", None))

        self.key = jax.random.PRNGKey(seed)
        self.params = scene_lib.init_params(self._next_key(), self.sc)
        if self.mesh is not None:
            from unislam_tpu.parallel import sharding as par_sh
            shardings = par_sh.scene_param_shardings(
                self.mesh, self.params,
                shard_tables=bool(par.get("shard_tables", False)))
            self.params = jax.tree_util.tree_map(jax.device_put,
                                                 self.params, shardings)

        # keyframe bank (device-resident)
        self.bank_size = max(1, int(self.intr.H * self.intr.W * 0.1))
        self.max_kf = min(self.n_img,
                          self.n_img // self.mc.keyframe_every + 65)
        self.bank = kf_lib.init_bank(self.max_kf, self.bank_size)
        self._add_kf = kf_lib.make_add_keyframe(self.intr.H, self.intr.W,
                                                self.bank_size)
        self._evict_kf = kf_lib.make_evict_keyframe(self.max_kf)
        # host mirrors: which slots hold cadence keyframes (vs tracking-back
        # extras), and the bank's slot count — both fully host-predictable.
        # The count mirror matters for wall-clock overlap: fetching
        # bank.count right after a mapping dispatch blocks on the mapping
        # device's FIFO queue until the whole phase finishes (the round-5
        # overlap-proof test caught exactly this sync).
        self.kf_is_cadence = np.zeros(self.max_kf, dtype=bool)
        self.kf_count = 0
        self._evict_warned = False

        # jitted steps (single-iteration + fused whole-frame variants)
        self.track_step, self.track_opt, self.track_frame_fn = \
            tracker_lib.make_tracking_step(self.sc, self.rc_track, self.tc,
                                           self.intr, mesh=self.mesh)
        self.map_step, self.map_opt, self.map_phase = \
            mapper_lib.make_mapping_step(self.sc, self.rc, self.mc,
                                         self.intr, self.max_kf,
                                         self.bank_size, mesh=self.mesh)
        self.select_fn = selection_lib.make_selection_fn(
            self.intr, self.max_kf,
            lc_enabled=bool(cfg["mapping"].get("LC", True)),
            lc_ts=float(cfg["mapping"].get("LC_ts", 0.95)),
            window_size=self.mc.mapping_window_size)

        # camera-frame ray dirs (cached once, like datasets.py:134-135)
        self.cam_rays_d = camera_ray_dirs(self.intr)

        # host-side trajectory state
        self.est_c2w = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self.gt_c2w = np.zeros((self.n_img, 4, 4), dtype=np.float32)
        self.tracking_weights = np.zeros(self.n_img, dtype=np.float32)
        self.additional_map_records = np.zeros(self.n_img, dtype=np.int32)
        self.t_iters = self.tc.iters
        self.m_iters = self.mc.iters
        self.last_track_iters = 0   # iterations the LAST frame executed
        self.tracking_back = False
        self.lc_cnt = 0
        self.mapping_cnt = 0
        self.init_phase = True

        # hooks (set by runtime wrappers): called as f(self, idx)
        self.on_frame_done = None
        self.on_mapping_done = None
        # per-iteration visualization hooks (consume the reference's
        # vis_inside_freq knob, which it reads but never uses —
        # Frame_Visualizer.py:45). Each is None or an object with
        # .wants(idx) -> bool, .inside_freq, and __call__(slam, idx, it, x)
        # where x is the current pose7 (tracking) / opt_tree (mapping).
        # A frame they claim runs on the single-iteration step path
        # (identical numerics: same key folding, same best-of-iters
        # bookkeeping) instead of the fused whole-phase dispatch.
        self.tracking_iter_vis = None
        self.mapping_iter_vis = None

        # per-phase wall-time / rays/s counters (opt-in: adds one device
        # sync per phase; the reference has no profiling at all, SURVEY §5)
        prof_cfg = cfg.get("profiling", {})
        if prof_cfg.get("enabled", False):
            from unislam_tpu.utils.profiling import PhaseStats
            self.stats = PhaseStats()
        else:
            self.stats = None

    # ------------------------------------------------------------------
    def _next_key(self) -> jax.Array:
        self.key, sub = jax.random.split(self.key)
        return sub

    def _frame(self, idx: int):
        if self._staged_frame is not None and self._staged_frame[0] == idx:
            _, color_j, depth_j, gt = self._staged_frame
            self._staged_frame = None
        else:
            color, depth, gt_c2w = self._frames[idx]
            color_j = jnp.asarray(color, jnp.float32)
            depth_j = jnp.asarray(depth, jnp.float32)
            gt = np.asarray(gt_c2w, np.float32)
        # stage the NEXT frame's ~13 MB host->device transfer now if its
        # decode already finished: jnp.asarray dispatches the copy
        # asynchronously, so it rides along the frame's compute instead of
        # sitting on the next step's critical path (the device-side half of
        # the reference's pin_memory + non_blocking copies,
        # /root/reference/src/Tracker.py:288-290)
        try_get = getattr(self._frames, "try_get", None)
        if try_get is not None and self._staged_frame is None:
            nxt = try_get(idx + 1)
            if nxt is not None:
                c, d, g = nxt
                self._staged_frame = (idx + 1,
                                      jnp.asarray(c, jnp.float32),
                                      jnp.asarray(d, jnp.float32),
                                      np.asarray(g, np.float32))
        return color_j, depth_j, gt

    # ------------------------------------------------------------------
    def track_frame(self, idx: int, depth_img, color_img) -> np.ndarray:
        """Optimize the frame's pose; returns the best 4x4 c2w.
        Mirrors Tracker.run's inner loop (/root/reference/src/Tracker.py:309-365)."""
        if self.tc.const_speed_assumption and idx >= 2:
            prev = jnp.asarray(self.est_c2w[idx - 1])
            prev2 = jnp.asarray(self.est_c2w[idx - 2])
            pose7 = tracker_lib.init_pose_const_speed(prev, prev2)
        else:
            pose7 = pose_lib.matrix_to_cam_pose(
                jnp.asarray(self.est_c2w[idx - 1])[None])[0]

        pose = {"R": pose7[:4], "T": pose7[4:]}
        opt_state = self.track_opt.init(pose)
        key = self._next_key()

        vis = self.tracking_iter_vis
        use_vis = vis is not None and vis.wants(idx)
        n1 = int(self.t_iters)
        self.last_track_iters = n1
        # params pinned ONCE per frame (reference refreshes from mapping
        # before the loop, Tracker.py:302) so a doubling continuation never
        # adopts a newer overlap-driver snapshot mid-frame
        params = self._tracking_params()
        state = self._run_tracking(idx, params, pose, opt_state, depth_img,
                                   color_img, key, n1, 0, None,
                                   vis if use_vis else None)

        # activated-mapping trigger (Tracker.py:350-363): checked at
        # cam_iter == num_cam_iters-1 using the PENULTIMATE iteration's
        # uncertainty (unc_prev). A first-time fire (this frame started at
        # the base iteration count) extends the CURRENT frame's loop
        # 8 -> 16 — a second dispatch continues the same frame with the
        # key schedule intact (bit-identical to one fused 16-iter
        # dispatch) — and the trigger is RE-CHECKED at the new
        # penultimate iteration, which decides tracking_back / doubled
        # iters for this frame's mapping phase and the next frame
        # (Tracker.py:352-363: the while-loop re-enters the
        # cam_iter == num_cam_iters-1 branch at 15).
        if idx > 0:
            mean_unc = float(state[4])
            triggered = (self.tc.activated_mapping_mode
                         and mean_unc > self.tc.uncertainty_ts)
            if triggered and n1 == self.tc.iters:
                self.additional_map_records[idx] = 1
                self.last_track_iters = n1 + self.tc.iters
                state = self._run_tracking(
                    idx, params, state[0], state[1], depth_img, color_img,
                    key, self.tc.iters, n1, state[2:],
                    vis if use_vis else None)
                mean_unc = float(state[4])
                triggered = mean_unc > self.tc.uncertainty_ts
            self.tracking_weights[idx] = mean_unc
            if triggered:
                self.t_iters = self.tc.iters * 2
                self.m_iters = self.mc.iters * 2
                self.tracking_back = True
                self.additional_map_records[idx] = 1
            else:
                self.t_iters = self.tc.iters
                self.m_iters = self.mc.iters
                self.tracking_back = False

        best7 = state[2]
        return np.asarray(pose_lib.cam_pose_to_matrix(best7[None])[0])

    def _run_tracking(self, idx, params, pose, opt_state, depth_img,
                      color_img, key, n_iters, iter0, carry, vis):
        """Run `n_iters` tracking iterations starting at schedule index
        `iter0`, fused (vis=None) or instrumented. Returns the full state
        tuple (pose, opt_state, best7, min_loss, unc_prev, unc_last)."""
        if vis is None:
            return self.track_frame_fn(params, pose, opt_state, depth_img,
                                       color_img, key, jnp.int32(n_iters),
                                       jnp.int32(iter0), carry)
        return self._track_instrumented(idx, params, pose, opt_state,
                                        depth_img, color_img, key, n_iters,
                                        iter0, carry, vis)

    def _track_instrumented(self, idx, params, pose, opt_state, depth_img,
                            color_img, key, n_iters, iter0, carry, vis):
        """Per-iteration tracking with visualization callbacks: the Python
        loop over the single-iteration step reproduces the fused
        track_frame_fn exactly (same fold_in key schedule, best-of-iters
        pose, penultimate-iter uncertainty) while `vis` fires every
        `vis.inside_freq` iterations and on the last one (the reference
        renders at cam_iter == num_cam_iters-1, Tracker.py:336-338)."""
        if carry is None:
            best7 = jnp.concatenate([pose["R"], pose["T"]])
            min_loss, unc_prev, unc_last = np.inf, 0.0, 0.0
        else:
            best7, min_loss, unc_prev, unc_last = carry
            min_loss, unc_prev, unc_last = (float(min_loss), float(unc_prev),
                                            float(unc_last))
        for it in range(iter0, iter0 + n_iters):
            cur7 = jnp.concatenate([pose["R"], pose["T"]])
            if it % vis.inside_freq == 0 or it == iter0 + n_iters - 1:
                vis(self, idx, it, cur7)
            pose, opt_state, loss, unc = self.track_step(
                params, pose, opt_state, depth_img, color_img,
                jax.random.fold_in(key, it))
            loss = float(loss)
            if loss < min_loss:
                min_loss, best7 = loss, cur7
            unc_prev, unc_last = unc_last, float(unc)
        return (pose, opt_state, best7, jnp.float32(min_loss),
                jnp.float32(unc_prev), jnp.float32(unc_last))

    # ------------------------------------------------------------------
    def map_frame(self, idx: int, depth_img, color_img, gt_c2w: np.ndarray):
        """One mapping phase over the keyframe window + current frame.
        Mirrors Mapper.optimize_mapping (/root/reference/src/Mapper.py:276-459)."""
        count = self.kf_count
        cur_pose7 = pose_lib.matrix_to_cam_pose(
            jnp.asarray(self.est_c2w[idx])[None])[0]

        # --- window selection ---
        if count > 2:
            res = self.select_fn(self.bank, depth_img, color_img,
                                 jnp.asarray(self.est_c2w[idx]), idx,
                                 self._next_key())
            if self.tracking_back and self.tc.activated_mapping_mode:
                sel_mask = np.asarray(res.back_mask)
            elif bool(res.lc_flag):
                sel_mask = np.asarray(res.lc_mask)
                self.lc_cnt += 1
                if self.verbose:
                    print(f"[LC] loop closure at frame {idx} "
                          f"(covis {float(jnp.max(res.percent_inside)):.3f})")
            else:
                sel_mask = np.asarray(res.normal_mask)
        else:
            sel_mask = np.zeros(self.max_kf, dtype=bool)

        probs, extra = selection_lib.window_probs(self.max_kf, count, sel_mask)

        # --- BA pose gradient mask ---
        joint_opt = self.mc.joint_opt and count > 4
        pose_grad_mask = np.zeros((self.max_kf + 1, 1), dtype=np.float32)
        if joint_opt:
            window = probs[:self.max_kf] > 0
            slots = np.nonzero(window)[0]
            if len(slots):
                window[slots[0]] = False  # oldest window frame stays fixed
            pose_grad_mask[:self.max_kf, 0] = window.astype(np.float32)
            pose_grad_mask[self.max_kf, 0] = 1.0  # current frame pose

        opt_tree = {
            "scene": self.params,
            "poses": jnp.concatenate([self.bank.pose7, cur_pose7[None]],
                                     axis=0),
        }
        first = self.init_phase
        iters = self.mc.iters_first if first else self.m_iters
        lr_scale = self.mc.lr_first_factor if first else self.mc.lr_factor
        opt_state = self.map_opt.init(opt_tree)

        probs_j = jnp.asarray(probs, jnp.float32)
        extra_j = jnp.asarray(extra, jnp.float32)
        mask_j = jnp.asarray(pose_grad_mask)
        vis = self.mapping_iter_vis
        if vis is not None and vis.wants(idx):
            # per-iteration path (same key schedule as the fused phase)
            key = self._next_key()
            loss = jnp.float32(0.0)
            for it in range(int(iters)):
                if it % vis.inside_freq == 0 or it == int(iters) - 1:
                    vis(self, idx, it, opt_tree)
                opt_tree, opt_state, loss = self.map_step(
                    opt_tree, opt_state, self.bank, depth_img, color_img,
                    self.cam_rays_d, probs_j, extra_j, mask_j,
                    jax.random.fold_in(key, it), jnp.float32(lr_scale))
        else:
            # whole mapping phase in one fused device dispatch; the first
            # phase's x5 LR factor rides the runtime lr_scale argument (one
            # compiled program for both, see make_mapping_step). A
            # max_fused_iters bound splits the phase into several
            # dispatches with identical numerics (iter0 keeps the key
            # schedule): long hash-mode dispatches can trip the TPU
            # runtime's execution watchdog.
            key = self._next_key()
            chunk = self.mc.max_fused_iters or int(iters)
            done = 0
            loss = jnp.float32(0.0)
            while done < int(iters):
                n = min(chunk, int(iters) - done)
                opt_tree, opt_state, loss = self.map_phase(
                    opt_tree, opt_state, self.bank, depth_img, color_img,
                    self.cam_rays_d, probs_j, extra_j, mask_j, key,
                    jnp.int32(n), jnp.float32(lr_scale), jnp.int32(done))
                done += n

        self.params = opt_tree["scene"]
        if joint_opt:
            poses = opt_tree["poses"]
            self.bank = self.bank._replace(pose7=poses[:self.max_kf])
            self._writeback_ba_pose(idx, poses[self.max_kf])
        self.mapping_cnt += 1
        self.init_phase = False
        return self._finish_loss(loss)

    def _writeback_ba_pose(self, idx: int, pose7):
        """Record the BA-refined current-frame pose in the trajectory.
        The overlapped driver (engine/overlap.py) defers this device fetch
        so Python never blocks on an in-flight mapping phase."""
        self.est_c2w[idx] = np.asarray(
            pose_lib.cam_pose_to_matrix(pose7[None])[0])

    def _finish_loss(self, loss):
        """Materialize the mapping loss (deferred by the overlapped driver)."""
        return float(loss)

    def _tracking_params(self):
        """Scene params the tracker optimizes against. The overlapped driver
        returns a snapshot lagging by up to `every_frame` frames — the
        reference's documented tracker lag (Tracker.py:297-300)."""
        return self.params

    # ------------------------------------------------------------------
    def _evict_slot(self) -> int:
        """Pick the bank slot to recycle when full: the oldest tracking-back
        extra if any exist (they are transient densification, not trajectory
        backbone), else the oldest cadence keyframe after the slot-0 anchor
        (kept for loop-closure reach)."""
        count = self.kf_count
        extras = np.nonzero(~self.kf_is_cadence[:count])[0]
        if len(extras):
            return int(extras[0])
        return 1 if count > 1 else 0

    def maybe_add_keyframe(self, idx: int, depth_img, color_img,
                           gt_c2w: np.ndarray):
        """Add a keyframe on cadence / tracking-back. Deliberately fetch-
        free (kf_count host mirror): a bank.count fetch here would block on
        the mapping device's queue right after the phase dispatch and
        serialize the overlapped driver."""
        if idx % self.mc.keyframe_every == 0 or self.tracking_back:
            if self.kf_count >= self.max_kf:
                slot = self._evict_slot()
                self.bank = self._evict_kf(self.bank, jnp.int32(slot))
                self.kf_is_cadence[slot:-1] = self.kf_is_cadence[slot + 1:]
                self.kf_count -= 1
                if not self._evict_warned:
                    print(f"[keyframes] bank full ({self.max_kf} slots) at "
                          f"frame {idx}: evicting (oldest-extra-first "
                          "policy). Raise max_kf headroom if this recurs.")
                    self._evict_warned = True
            self.bank = self._add_kf(
                self.bank, depth_img, color_img, self.cam_rays_d,
                jnp.asarray(self.est_c2w[idx]), jnp.asarray(gt_c2w),
                jnp.int32(idx), self._next_key())
            self.kf_count += 1
            self.kf_is_cadence[self.kf_count - 1] = (
                idx % self.mc.keyframe_every == 0)

    # ------------------------------------------------------------------
    def step_frame(self, idx: int):
        """Process one frame end-to-end (track -> map -> keyframe)."""
        if self.stats is not None:
            self.stats.begin_frame(idx)
            # proves prefetch keeps decode off the critical path: with the
            # background loader this phase is ~0 on disk-backed datasets
            with self.stats.phase("frame_fetch"):
                color, depth, gt_c2w = self._frame(idx)
        else:
            color, depth, gt_c2w = self._frame(idx)
        self.gt_c2w[idx] = gt_c2w

        if idx == 0 or self.tc.gt_camera:
            self.est_c2w[idx] = gt_c2w
        else:
            if self.stats is not None:
                with self.stats.phase("tracking"):
                    # track_frame fetches unc scalars -> already synced
                    self.est_c2w[idx] = self.track_frame(idx, depth, color)
                # rays credited AFTER the body: a mid-frame doubling
                # continuation changes the executed count inside track_frame
                self.stats.add_rays(
                    "tracking", self.last_track_iters * self.tc.pixels)
            else:
                self.est_c2w[idx] = self.track_frame(idx, depth, color)

        mapped = False
        if idx % self.mc.every_frame == 0 or self.tracking_back or \
                idx == self.n_img - 1:
            iters = self.mc.iters_first if self.init_phase else self.m_iters
            if self.stats is not None:
                with self.stats.phase(
                        "mapping",
                        rays=iters * (self.mc.pixels + self.mc.extra_rays)):
                    # map_frame fetches the loss scalar -> already synced
                    self.map_frame(idx, depth, color, gt_c2w)
            else:
                self.map_frame(idx, depth, color, gt_c2w)
            self.maybe_add_keyframe(idx, depth, color, gt_c2w)
            mapped = True
            if self.on_mapping_done is not None:
                if self.stats is not None:
                    with self.stats.phase("hooks"):
                        self.on_mapping_done(self, idx)
                else:
                    self.on_mapping_done(self, idx)

        if self.on_frame_done is not None:
            if self.stats is not None:
                # hook time (vis / ATE plots / live feed / ckpt / mesh) is
                # charged separately so frame-time spikes attribute to the
                # right subsystem
                with self.stats.phase("hooks"):
                    self.on_frame_done(self, idx)
            else:
                self.on_frame_done(self, idx)
        if self.stats is not None:
            # t_iters = iterations THIS frame executed (incl. a mid-frame
            # doubling continuation), not the next frame's schedule
            self.stats.end_frame(t_iters=int(self.last_track_iters),
                                 mapped=mapped, kf=self.kf_count)
        return mapped

    def run(self, progress: bool = True):
        frames = range(self.n_img)
        if progress:
            try:
                from tqdm import tqdm
                frames = tqdm(frames, smoothing=0.05, desc="uni-slam-tpu")
            except ImportError:
                pass
        for idx in frames:
            self.step_frame(idx)
        return self.est_c2w
