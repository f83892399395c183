"""Per-frame diagnostic panels during tracking/mapping.

Rewrite of /root/reference/src/utils/Frame_Visualizer.py:25-253: renders the
current frame against the live map and saves a 2x4 matplotlib panel — gt /
rendered / residual depth + termination probability on the top row, gt /
rendered / residual RGB + depth uncertainty on the bottom row, with PSNR in
the title. Frequencies mirror the reference (`vis_freq` frames).
"""

from __future__ import annotations

import os

import numpy as np


def mse2psnr(mse: float) -> float:
    return -10.0 * np.log10(mse + 1e-12)


class FrameVisualizer:
    def __init__(self, freq: int, vis_dir: str, sc, rc, intr,
                 verbose: bool = False):
        self.freq = max(1, freq)
        self.vis_dir = vis_dir
        self.sc = sc
        self.rc = rc._replace(perturb=False)
        self.intr = intr
        self.verbose = verbose
        self._render_fn = None
        os.makedirs(vis_dir, exist_ok=True)

    def save_imgs(self, idx: int, it: int, gt_depth, gt_color, c2w, params,
                  key=None):
        if idx % self.freq != 0:
            return None
        import jax

        from unislam_tpu.render import renderer as renderer_lib

        if self._render_fn is None:
            self._render_fn = renderer_lib.make_render_fn(self.sc, self.rc)
        if key is None:
            key = jax.random.PRNGKey(idx)
        depth, color, term, unc, depth_std = renderer_lib.render_img(
            params, self.sc, self.rc, self.intr, np.asarray(c2w), key,
            gt_depth=np.asarray(gt_depth), render_fn=self._render_fn)
        out = self._panel(idx, it, np.asarray(gt_depth), np.asarray(gt_color),
                          np.asarray(depth), np.asarray(color),
                          np.asarray(term), np.asarray(unc),
                          np.asarray(depth_std))
        if self.verbose:
            print(f"saved frame visualization {out}")
        return out

    def _panel(self, idx, it, gt_depth, gt_color, depth, color, term, unc,
               depth_std):
        import matplotlib
        matplotlib.use("Agg")
        import matplotlib.pyplot as plt

        depth_residual = np.abs(gt_depth - depth)
        depth_residual[gt_depth == 0] = 0.0
        color_residual = np.abs(gt_color - color)
        color_residual[gt_depth == 0] = 0.0
        valid = gt_depth > 0
        mse = np.mean((gt_color[valid] - color[valid]) ** 2) if valid.any() \
            else np.nan
        psnr = mse2psnr(mse)

        max_depth = max(np.max(gt_depth), 1e-3)
        fig, axs = plt.subplots(2, 4, figsize=(16, 7))
        fig.suptitle(f"frame {idx:05d} iter {it:04d}  PSNR {psnr:.2f} dB")
        panels = [
            (gt_depth, "Input depth", "plasma", (0, max_depth)),
            (depth, "Rendered depth", "plasma", (0, max_depth)),
            (depth_residual, "Depth residual", "plasma", (0, max_depth)),
            (term, "Termination prob", "viridis", (0, 1)),
            (gt_color, "Input RGB", None, (0, 1)),
            (color, "Rendered RGB", None, (0, 1)),
            (color_residual, "RGB residual", None, (0, 1)),
            (depth_std, "Depth uncertainty", "jet", (0, 1)),
        ]
        for ax, (img, title, cmap, clim) in zip(axs.ravel(), panels):
            if cmap is None:
                ax.imshow(np.clip(img, 0, 1))
            else:
                ax.imshow(img, cmap=cmap, vmin=clim[0], vmax=clim[1])
            ax.set_title(title, fontsize=9)
            ax.set_xticks([])
            ax.set_yticks([])
        out = os.path.join(self.vis_dir, f"{idx:05d}_{it:04d}.jpg")
        plt.savefig(out, bbox_inches="tight", pad_inches=0.2, dpi=90)
        plt.close(fig)

        with open(os.path.join(self.vis_dir, "psnr_record.txt"), "a") as f:
            f.write(f"frame {idx:05d} iter {it:04d} psnr {psnr:.3f}\n")
        return out
