"""bench.py --assert-floor history parsing (VERDICT r3 #4 regression guard)."""

import json
import sys
import os

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def test_best_recorded_vs_baseline(tmp_path):
    import bench
    for i, v in enumerate([0.55, 1.015, 0.99]):
        with open(tmp_path / f"BENCH_r{i:02d}.json", "w") as f:
            json.dump({"metric": "rays_per_s_per_chip_map_track",
                       "value": v * 8e5, "vs_baseline": v}, f)
    (tmp_path / "BENCH_r99.json").write_text("not json")
    assert bench.best_recorded_vs_baseline(str(tmp_path)) == 1.015
    assert bench.best_recorded_vs_baseline(str(tmp_path / "empty")) == 0.0


def test_repo_history_has_floor():
    import bench
    repo = os.path.dirname(os.path.abspath(bench.__file__))
    # the committed BENCH_r*.json history must keep the target met
    assert bench.best_recorded_vs_baseline(repo) >= 1.0


def test_extract_from_driver_wrapper(tmp_path):
    import bench
    tail = ('WARNING: noise\n{"metric": "rays_per_s_per_chip_map_track", '
            '"value": 894121.8, "unit": "rays/s", "vs_baseline": 1.118}\n')
    with open(tmp_path / "BENCH_r04.json", "w") as f:
        json.dump({"n": 4, "cmd": "python bench.py", "rc": 0, "tail": tail}, f)
    assert bench.best_recorded_vs_baseline(str(tmp_path)) == 1.118


def test_preset_records_do_not_inflate_replica_floor(tmp_path):
    """A tum/scannet preset record (different metric name) must be ignored
    by the replica floor history — both as a raw line and inside a driver
    wrapper — so a fast preset can never raise the replica floor and a
    preset run never trips on replica history."""
    import bench
    with open(tmp_path / "BENCH_r01.json", "w") as f:
        json.dump({"metric": "rays_per_s_per_chip_map_track",
                   "value": 8.8e5, "vs_baseline": 1.10}, f)
    with open(tmp_path / "BENCH_r02.json", "w") as f:
        json.dump({"metric": "rays_per_s_per_chip_map_track_tum",
                   "value": 9.6e5, "vs_baseline": 1.20}, f)
    tail = ('{"metric": "rays_per_s_per_chip_map_track_scannet", '
            '"value": 9.9e5, "vs_baseline": 1.30}\n')
    with open(tmp_path / "BENCH_r03.json", "w") as f:
        json.dump({"cmd": "python bench.py --preset scannet", "rc": 0,
                   "tail": tail}, f)
    assert bench.best_recorded_vs_baseline(str(tmp_path)) == 1.10
