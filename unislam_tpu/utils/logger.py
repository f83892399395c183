"""Checkpointing with resume.

The reference's Logger (/root/reference/src/utils/Logger.py:21-49) saves
decoder weights + pose lists but NOT the hash grids, so its checkpoints
cannot reconstruct the map and there is no resume path (SURVEY.md §5).
Here a checkpoint carries the full scene pytree, the keyframe bank, and all
host trajectory state — `load_into` restores a UniSLAM mid-run.

Format: one .npz holding every array leaf keyed by its pytree path, plus
scalars in a JSON sidecar blob inside the archive.
"""

from __future__ import annotations

import json
import os
import re
from typing import Any, Dict, Optional

import jax
import numpy as np


def _flatten(tree, prefix: str) -> Dict[str, np.ndarray]:
    leaves = {}
    flat, _ = jax.tree_util.tree_flatten_with_path(tree)
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        leaves[key] = np.asarray(leaf)
    return leaves


def _unflatten_like(template, archive, prefix: str):
    flat, treedef = jax.tree_util.tree_flatten_with_path(template)
    leaves = []
    for path, leaf in flat:
        key = prefix + jax.tree_util.keystr(path)
        leaves.append(archive[key])
    return jax.tree_util.tree_unflatten(treedef, leaves)


def save_checkpoint(path: str, slam, idx: int) -> str:
    """Save scene params + bank + trajectory state at frame `idx`."""
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    arrays = {}
    arrays.update(_flatten(slam.params, "params"))
    arrays.update(_flatten(slam.bank, "bank"))
    arrays["est_c2w"] = slam.est_c2w
    arrays["gt_c2w"] = slam.gt_c2w
    arrays["tracking_weights"] = slam.tracking_weights
    arrays["additional_map_records"] = slam.additional_map_records
    arrays["kf_is_cadence"] = slam.kf_is_cadence
    meta = {
        "idx": int(idx),
        "t_iters": int(slam.t_iters),
        "m_iters": int(slam.m_iters),
        "tracking_back": bool(slam.tracking_back),
        "lc_cnt": int(slam.lc_cnt),
        "mapping_cnt": int(slam.mapping_cnt),
        "init_phase": bool(slam.init_phase),
    }
    arrays["__meta__"] = np.frombuffer(
        json.dumps(meta).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrays)
    return path


def load_checkpoint(path: str) -> Dict[str, Any]:
    """Load a checkpoint archive into a dict (arrays + parsed meta)."""
    with np.load(path, allow_pickle=False) as z:
        out = {k: z[k] for k in z.files}
    out["meta"] = json.loads(bytes(out.pop("__meta__")).decode())
    return out


def load_into(slam, path: str) -> int:
    """Restore a UniSLAM instance from `path`; returns the frame index at
    which to resume (idx + 1)."""
    import jax.numpy as jnp

    ckpt = load_checkpoint(path)
    slam.params = jax.tree_util.tree_map(
        jnp.asarray, _unflatten_like(slam.params, ckpt, "params"))
    # the bank's slot count (max_kf) is derived from n_img, so a resumed
    # run with a different frame budget allocates a different-sized bank:
    # prefix-copy each leaf along its slot axis into the template shape
    # (empty-slot init preserved) instead of adopting the archive shapes,
    # which would break the jitted selection/mapping programs
    bank = _unflatten_like(slam.bank, ckpt, "bank")
    max_kf = int(np.shape(slam.bank.pose7)[0])
    src_slots = int(np.shape(bank.pose7)[0])
    src_count = int(np.asarray(bank.count)) if hasattr(bank, "count") \
        else src_slots
    # slot order == temporal order (compacting eviction), and selection
    # anchors on slots count-1/count-2 as the most recent keyframes — so
    # when SHRINKING keep the NEWEST valid keyframes (the tail of the
    # occupied prefix), never the oldest, and never empty-init tail slots
    valid = min(src_count, src_slots)
    keep = min(max_kf, valid)

    def _fit(tpl, src):
        tpl = np.asarray(tpl)
        src = np.asarray(src)
        if tpl.shape == src.shape:
            return src
        if tpl.ndim == 0:
            return src
        out = tpl.copy()
        if src.shape[0] == src_slots and tpl.shape[0] == max_kf:
            out[:keep] = src[valid - keep:valid]
        else:   # non-slot-indexed leaf: plain prefix copy
            n = min(tpl.shape[0], src.shape[0])
            out[:n] = src[:n]
        return out

    bank = jax.tree_util.tree_map(_fit, slam.bank, bank)
    if hasattr(bank, "count"):
        bank = bank._replace(count=np.asarray(bank.count).dtype.type(keep))
    slam.bank = jax.tree_util.tree_map(jnp.asarray, bank)
    slam.kf_count = keep
    if "kf_is_cadence" in ckpt:
        src_cad = list(ckpt["kf_is_cadence"])
        if len(src_cad) == src_slots and len(slam.kf_is_cadence) == max_kf:
            slam.kf_is_cadence[:keep] = src_cad[valid - keep:valid]
        else:
            n = min(len(slam.kf_is_cadence), len(src_cad))
            slam.kf_is_cadence[:n] = src_cad[:n]
    # prefix-copy the trajectory state instead of adopting the archive's
    # arrays: the resumed run may see MORE frames than the checkpointing
    # run did (e.g. run.py --n_frames raised on resume), and its
    # pre-allocated (n_img, ...) arrays must keep that length
    for name in ("est_c2w", "gt_c2w", "tracking_weights",
                 "additional_map_records"):
        dst = getattr(slam, name)
        src = ckpt[name]
        n = min(len(dst), len(src))
        dst[:n] = src[:n]
    meta = ckpt["meta"]
    slam.t_iters = meta["t_iters"]
    slam.m_iters = meta["m_iters"]
    slam.tracking_back = meta["tracking_back"]
    slam.lc_cnt = meta["lc_cnt"]
    slam.mapping_cnt = meta["mapping_cnt"]
    slam.init_phase = meta["init_phase"]
    return meta["idx"] + 1


def latest_checkpoint(ckpt_dir: str) -> Optional[str]:
    if not os.path.isdir(ckpt_dir):
        return None
    ckpts = [f for f in sorted(os.listdir(ckpt_dir))
             if re.match(r".*\.npz$", f)]
    return os.path.join(ckpt_dir, ckpts[-1]) if ckpts else None


class Logger:
    """Periodic checkpoint writer (reference Logger.log cadence,
    /root/reference/src/utils/Logger.py:36-46; files are 05d-numbered)."""

    def __init__(self, slam, ckpt_dir: str):
        self.slam = slam
        self.ckpt_dir = ckpt_dir

    def log(self, idx: int):
        path = os.path.join(self.ckpt_dir, f"{idx:05d}.npz")
        save_checkpoint(path, self.slam, idx)
        if self.slam.verbose:
            print(f"Saved checkpoint at {path}")
