"""Full-system runtime: dataset + SLAM core + logging/meshing/eval/vis.

This is the layer the reference spreads across UNISLAM.__init__/run and the
tails of Tracker.run / Mapper.run (periodic ATE plots, checkpoints, meshing,
final rendering + reconstruction evaluation). The SLAM core (engine/slam.py)
stays free of file IO; this wrapper attaches the side subsystems via hooks.
"""

from __future__ import annotations

import json
import os
from typing import Optional

import numpy as np

from unislam_tpu.data.datasets import get_dataset
from unislam_tpu.engine.slam import UniSLAM, intrinsics_from_cfg
from unislam_tpu.tools import eval_ate
from unislam_tpu.utils.logger import Logger, latest_checkpoint, load_into
from unislam_tpu.utils.mesher import Mesher
from unislam_tpu.utils.visualizer import FrameVisualizer


class SLAMRuntime:
    def __init__(self, cfg, input_folder: Optional[str] = None,
                 output: Optional[str] = None, n_frames: Optional[int] = None,
                 dataset=None, seed: int = 0):
        self.cfg = cfg
        self.output = output or cfg["data"]["output"]
        os.makedirs(self.output, exist_ok=True)
        os.makedirs(os.path.join(self.output, "ckpts"), exist_ok=True)
        os.makedirs(os.path.join(self.output, "mesh"), exist_ok=True)

        if dataset is None:
            dataset = get_dataset(cfg, input_folder, cfg.get("scale", 1))
        if n_frames is not None:
            dataset = _Truncated(dataset, n_frames)
        self.dataset = dataset

        overlap = cfg.get("parallel", {}).get("overlap", False)
        if overlap:
            import jax
            if len(jax.devices()) >= 2:
                from unislam_tpu.engine.overlap import OverlappedSLAM
                self.slam = OverlappedSLAM(cfg, dataset, output=self.output,
                                           seed=seed)
                print(f"INFO: overlapped driver — tracking on "
                      f"{self.slam.track_device}, mapping on "
                      f"{self.slam.map_mesh or self.slam._map_placement}")
            else:
                print("INFO: parallel.overlap requested but only one device "
                      "is visible; using the sequential driver")
                self.slam = UniSLAM(cfg, dataset, output=self.output,
                                    seed=seed)
        else:
            self.slam = UniSLAM(cfg, dataset, output=self.output, seed=seed)
        self.logger = Logger(self.slam, os.path.join(self.output, "ckpts"))
        self.mesher = Mesher(cfg, self.slam.sc, self.slam.intr)

        t, m = cfg["tracking"], cfg["mapping"]
        self.track_vis = FrameVisualizer(
            t.get("vis_freq", 50), os.path.join(self.output, "tracking_vis"),
            self.slam.sc, self.slam.rc, self.slam.intr)
        self.map_vis = FrameVisualizer(
            m.get("vis_freq", 50), os.path.join(self.output, "mapping_vis"),
            self.slam.sc, self.slam.rc, self.slam.intr)
        # per-iteration visualization (vis_inside_freq; 0/absent disables).
        # Frames it claims run on the single-iteration step path — identical
        # numerics, extra renders — so it is opt-in debug instrumentation.
        if int(t.get("vis_inside_freq", 0)) > 0 and \
                not cfg.get("parallel", {}).get("overlap", False):
            self.slam.tracking_iter_vis = _InsideVis(
                self.track_vis.freq, int(t["vis_inside_freq"]),
                self._tracking_iter_panel)
        if int(m.get("vis_inside_freq", 0)) > 0 and \
                not cfg.get("parallel", {}).get("overlap", False):
            self.slam.mapping_iter_vis = _InsideVis(
                self.map_vis.freq, int(m["vis_inside_freq"]),
                self._mapping_iter_panel)
        self.vis_pose_freq = t.get("vis_pose_freq", 100)
        self.mesh_freq = m.get("mesh_freq", 100000)
        # live observability feed (visualizer.py --live); every N frames,
        # 0 disables. Mesh snapshots still follow mesh_freq.
        self.live_freq = cfg.get("live_freq", 1)
        self.ckpt_freq = m.get("ckpt_freq", 500)
        self.eval_rec = cfg["meshing"].get("eval_rec", False)
        self.no_vis_first = t.get("no_vis_on_first_frame", True)
        self._start_idx = 0

        self.slam.on_frame_done = self._on_frame_done
        self.slam.on_mapping_done = self._on_mapping_done

        self._print_output_desc()

    # ------------------------------------------------------------------
    def _print_output_desc(self):
        print(f"INFO: The output folder is {self.output}")
        print(f"INFO: tracking/mapping visualizations under "
              f"{self.output}/tracking_vis and {self.output}/mapping_vis")
        print(f"INFO: meshes under {self.output}/mesh, checkpoints under "
              f"{self.output}/ckpts")

    def resume(self):
        path = latest_checkpoint(os.path.join(self.output, "ckpts"))
        if path is None:
            print("INFO: no checkpoint found; starting fresh")
            return
        self._start_idx = load_into(self.slam, path)
        print(f"INFO: resumed from {path} at frame {self._start_idx}")

    # ------------------------------------------------------------------
    def _frame_for_vis(self, idx: int):
        """Decode-once cache for the per-iteration vis callbacks (several
        fire per frame)."""
        if getattr(self, "_vis_frame_cache", None) is None or \
                self._vis_frame_cache[0] != idx:
            color, depth, _ = self.dataset[idx]
            self._vis_frame_cache = (idx, color, depth)
        return self._vis_frame_cache[1], self._vis_frame_cache[2]

    def _tracking_iter_panel(self, slam: UniSLAM, idx: int, it: int, pose7):
        """Full diagnostic panel at the CURRENT in-optimization pose
        (reference Tracker.py:336-338)."""
        import jax.numpy as jnp

        from unislam_tpu.core import pose as pose_lib
        color, depth = self._frame_for_vis(idx)
        c2w = np.asarray(pose_lib.cam_pose_to_matrix(
            jnp.asarray(pose7)[None])[0])
        self.track_vis.save_imgs(idx, it, depth, color, c2w, slam.params)

    def _mapping_iter_panel(self, slam: UniSLAM, idx: int, it: int, opt_tree):
        """Per-mapping-iteration render of the frame being mapped
        (reference Frame_Visualizer.save_mapping_imgs:65-100), using the
        mid-optimization scene params + BA pose."""
        import jax.numpy as jnp

        from unislam_tpu.core import pose as pose_lib
        color, depth = self._frame_for_vis(idx)
        cur7 = opt_tree["poses"][-1]
        c2w = np.asarray(pose_lib.cam_pose_to_matrix(
            jnp.asarray(cur7)[None])[0])
        self.map_vis.save_mapping_imgs(idx, it, color, c2w,
                                       opt_tree["scene"], gt_depth=depth)

    # ------------------------------------------------------------------
    def _on_frame_done(self, slam: UniSLAM, idx: int):
        n = slam.n_img
        if idx > 0 and (idx % self.vis_pose_freq == 0 or idx == n - 1):
            # the overlapped driver defers BA pose write-backs; land them
            # before reading the trajectory
            getattr(slam, "sync", lambda: None)()
            plot_path = os.path.join(self.output, "pose_vis",
                                     f"pose_{idx}.png")
            _, results = eval_ate.pose_evaluation(
                slam.gt_c2w[:idx + 1], slam.est_c2w[:idx + 1],
                slam.tracking_weights[:idx + 1], plot_path,
                scale=self.cfg.get("scale", 1),
                pose_alignment=self.cfg["tracking"].get("pose_alignment",
                                                        False))
            if idx == n - 1:
                with open(os.path.join(self.output, "output.txt"), "a") as f:
                    f.write(json.dumps(results) + "\n")
                    f.write(f"normal mapping frames: "
                            f"{n / slam.mc.every_frame}\n")
                    f.write(f"total mapping frames: {slam.mapping_cnt}\n")
                    f.write(f"total LC: {slam.lc_cnt}\n")
                eval_ate.vis_unc_mapstep(slam.tracking_weights,
                                         slam.additional_map_records,
                                         self.output)
        if idx > 0 and idx % self.track_vis.freq == 0:
            color, depth, _ = self.dataset[idx]
            self.track_vis.save_imgs(idx, 0, depth, color, slam.est_c2w[idx],
                                     slam.params)
        if self.live_freq and (idx % self.live_freq == 0 or idx == n - 1):
            # headless live feed (reference: visualizer_util.py:26-230 GUI
            # queue); cost is one small atomic JSON write per frame
            from unislam_tpu.utils import playback
            playback.write_live_state(
                self.output, idx, n, slam.est_c2w, slam.gt_c2w,
                mesh_dir=os.path.join(self.output, "mesh"))
            if slam.stats is not None and slam.stats.frames:
                # per-frame wall-time series, refreshed live so a hung or
                # spiking run can be diagnosed while still in flight
                slam.stats.dump_frames(
                    os.path.join(self.output, "frame_times.json"))

    def _on_mapping_done(self, slam: UniSLAM, idx: int):
        n = slam.n_img
        if (idx % self.ckpt_freq == 0 and idx > 0) or idx == n - 1:
            self.logger.log(idx)
        if idx % self.mesh_freq == 0 and idx > 0:
            self.mesher.get_mesh(
                os.path.join(self.output, "mesh", f"{idx:05d}_mesh.ply"),
                slam.params, slam.bank, verbose=True)
        if idx > 0 and idx % self.map_vis.freq == 0:
            color, depth, _ = self.dataset[idx]
            self.map_vis.save_imgs(idx, 0, depth, color, slam.est_c2w[idx],
                                   slam.params)
        if idx == n - 1:
            self._finalize()

    def _finalize(self):
        from unislam_tpu.tools.cull_mesh import cull_mesh
        from unislam_tpu.tools.eval_recon import eval_rendering

        slam = self.slam
        getattr(slam, "sync", lambda: None)()
        if slam.stats is not None:
            print(slam.stats.summary())
            with open(os.path.join(self.output, "output.txt"), "a") as f:
                f.write(json.dumps({"profile": slam.stats.report()}) + "\n")
            if slam.stats.frames:
                slam.stats.dump_frames(
                    os.path.join(self.output, "frame_times.json"))
        eval_rendering(slam, self.output)
        name = ("final_mesh_eval_rec.ply" if self.eval_rec
                else "final_mesh.ply")
        mesh_file = os.path.join(self.output, "mesh", name)
        out = self.mesher.get_mesh(mesh_file, slam.params, slam.bank,
                                   verbose=True)
        if out is not None:
            cull_mesh(out, self.cfg, slam.intr, frames=self.dataset,
                      estimate_c2w_list=slam.est_c2w, eval_rec=self.eval_rec)

    # ------------------------------------------------------------------
    def run(self):
        n = self.slam.n_img
        frames = range(self._start_idx, n)
        try:
            from tqdm import tqdm
            frames = tqdm(frames, smoothing=0.05, desc="uni-slam-tpu")
        except ImportError:
            pass
        for idx in frames:
            self.slam.step_frame(idx)
        return self.slam.est_c2w


class _InsideVis:
    """Per-iteration visualization policy: which frames get the
    instrumented (single-iteration-step) optimization path, and how often
    inside the iteration loop the callback fires."""

    def __init__(self, frame_freq: int, inside_freq: int, fn):
        self.frame_freq = max(1, frame_freq)
        self.inside_freq = max(1, inside_freq)
        self._fn = fn

    def wants(self, idx: int) -> bool:
        return idx > 0 and idx % self.frame_freq == 0

    def __call__(self, slam, idx, it, x):
        self._fn(slam, idx, it, x)


class _Truncated:
    def __init__(self, ds, n):
        self._ds = ds
        self._n = min(n, len(ds))

    def __len__(self):
        return self._n

    def __getitem__(self, i):
        return self._ds[i]

    def __getattr__(self, name):
        return getattr(self._ds, name)
