"""Overlapped tracker/mapper driver (engine/overlap.py) on the 8-device
virtual CPU mesh: device placement, deferred sync protocol, and end-to-end
convergence with the reference's stale-tracker-params semantics."""

import jax
import numpy as np
import pytest

from unislam_tpu.core.rays import Intrinsics
from unislam_tpu.data.synthetic import SyntheticRoom, make_config
from unislam_tpu.engine.overlap import OverlappedSLAM
from unislam_tpu.engine.slam import UniSLAM
from unislam_tpu.tools.eval_ate import evaluate_ate


def _small(n_frames=9, **overrides):
    ds = SyntheticRoom(n_frames=n_frames,
                       intr=Intrinsics(H=40, W=52, fx=45.0, fy=45.0,
                                       cx=25.5, cy=19.5),
                       deg_per_frame=1.5)
    base = {"tracking": {"pixels": 600, "iters": 16, "ignore_edge_W": 3,
                         "ignore_edge_H": 3, "lr_T": 0.01, "lr_R": 0.004},
            "mapping": {"pixels": 800, "iters": 8, "iters_first": 25,
                        "every_frame": 2, "keyframe_every": 2},
            "rendering": {"n_stratified": 16, "n_importance": 4}}
    from unislam_tpu.config import update_recursive
    update_recursive(base, overrides)
    return ds, make_config(ds, base)


def test_placement_and_deferred_sync():
    ds, cfg = _small(n_frames=5)
    slam = OverlappedSLAM(cfg, ds, seed=0)

    devs = jax.devices()
    assert slam.track_device == devs[0]
    # 7 leftover devices -> ray-sharded mapping sub-mesh
    assert slam.map_mesh is not None
    assert set(slam.map_mesh.devices.flat) == set(devs[1:])
    # heavy state is off the tracking chip
    table = jax.tree_util.tree_leaves(slam.params)[0]
    assert devs[0] not in table.sharding.device_set
    snap = jax.tree_util.tree_leaves(slam._track_params)[0]
    assert snap.sharding.device_set == {devs[0]}

    # frames 0..4 with every_frame=2: mapping at 0,2,4 (+ final)
    for i in range(4):
        slam.step_frame(i)
    # a BA phase ran (count>4 not yet -> pending loss at least)
    assert slam._pending_loss is not None
    pending = float(jax.device_get(slam._pending_loss))
    slam.step_frame(4)  # next mapping dispatch syncs the previous one
    assert slam.last_map_loss is not None
    assert np.isfinite(pending) and np.isfinite(slam.last_map_loss)
    slam.sync()
    assert slam._pending_loss is None and slam._pending_ba is None


@pytest.mark.slow
def test_overlap_e2e_matches_sequential_quality():
    """Stale tracker params (the reference's two-process lag) must not
    break convergence: both drivers land sub-5cm ATE on the same scene."""
    ds, cfg = _small(n_frames=9)
    seq = UniSLAM(cfg, ds, seed=0)
    est_seq = seq.run(progress=False)
    _, r_seq = evaluate_ate(seq.gt_c2w[:, :3, 3], est_seq[:, :3, 3])

    ds2, cfg2 = _small(n_frames=9)
    ovl = OverlappedSLAM(cfg2, ds2, seed=0)
    est_ovl = ovl.run(progress=False)
    _, r_ovl = evaluate_ate(ovl.gt_c2w[:, :3, 3], est_ovl[:, :3, 3])

    assert r_seq["error.rmse"] < 5.0, r_seq
    assert r_ovl["error.rmse"] < 5.0, r_ovl
    # BA write-backs landed (trajectory not left at tracker-only poses)
    assert ovl.mapping_cnt >= 5
    assert int(ovl.bank.count) >= 4


@pytest.mark.slow
def test_overlap_single_map_device():
    """map_devices pinned to one chip (no sub-mesh): same protocol."""
    ds, cfg = _small(n_frames=7)
    devs = jax.devices()
    slam = OverlappedSLAM(cfg, ds, seed=0, track_device=devs[0],
                          map_devices=[devs[1]])
    assert slam.map_mesh is None
    est = slam.run(progress=False)
    _, r = evaluate_ate(slam.gt_c2w[:, :3, 3], est[:, :3, 3])
    assert r["error.rmse"] < 5.0, r




def test_tracking_completes_while_mapping_in_flight():
    """The wall-clock-overlap proof (VERDICT r4 #7): after a mapping frame,
    step_frame returns with the mapping phase still EXECUTING on the
    mapping sub-mesh (async dispatch, nothing materialized), and the next
    frame's tracking runs to completion on the tracking device while that
    phase is still in flight — true concurrency, not just equal quality."""
    ds, cfg = _small(
        n_frames=6,
        # heavy mapping vs light tracking so the in-flight window is wide;
        # no activated-mapping so frame 3 stays track-only
        mapping={"iters": 300, "iters_first": 300, "pixels": 2000},
        tracking={"iters": 4, "pixels": 200, "uncertainty_ts": 1e9})
    slam = OverlappedSLAM(cfg, ds, seed=0)
    slam.step_frame(0)   # compiles mapping; dispatched async
    slam.step_frame(1)   # compiles tracking
    slam.sync()

    slam.step_frame(2)   # mapping frame: dispatch, no host block
    assert slam._pending_loss is not None
    assert not slam._pending_loss.is_ready(), \
        "mapping phase already finished at dispatch return - workload too " \
        "small to prove overlap"
    slam.step_frame(3)   # tracking COMPLETES (track_frame fetches its unc)
    still_in_flight = not slam._pending_loss.is_ready()
    slam.sync()
    assert still_in_flight, \
        "mapping finished before tracking - no overlap demonstrated"
    assert np.isfinite(slam.last_map_loss)
