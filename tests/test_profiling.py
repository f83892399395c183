"""PhaseStats counters and the device_trace no-op path."""

import time

from unislam_tpu.utils.profiling import PhaseStats, device_trace


def test_phase_stats_accumulates():
    st = PhaseStats()
    with st.phase("tracking", rays=100):
        time.sleep(0.01)
    with st.phase("tracking", rays=50):
        pass
    with st.phase("mapping", rays=200, sync=lambda: 1.0):
        pass
    rep = st.report()
    assert rep["tracking"]["calls"] == 2
    assert rep["tracking"]["rays"] == 150
    assert rep["tracking"]["time_s"] >= 0.01
    assert rep["mapping"]["rays"] == 200
    assert rep["total"]["rays"] == 350
    assert rep["tracking"]["rays_per_s"] > 0
    assert "tracking" in st.summary() and "rays/s" in st.summary()


def test_phase_stats_records_time_on_exception():
    st = PhaseStats()
    try:
        with st.phase("meshing"):
            raise ValueError("boom")
    except ValueError:
        pass
    assert st.calls["meshing"] == 1


def test_device_trace_noop_paths():
    with device_trace(None):
        x = 1
    with device_trace(""):
        x += 1
    assert x == 2


def test_per_frame_timeline(tmp_path):
    """Frame brackets capture wall time + per-phase attribution + driver
    extras, and dump_frames writes valid JSON atomically."""
    import json

    st = PhaseStats()
    st.begin_frame(0)
    with st.phase("tracking", rays=10):
        time.sleep(0.005)
    with st.phase("mapping", rays=20):
        pass
    st.end_frame(t_iters=8, mapped=True, kf=3)
    st.begin_frame(1)
    with st.phase("tracking", rays=10):
        pass
    st.end_frame(t_iters=16, mapped=False, kf=3)

    assert len(st.frames) == 2
    f0 = st.frames[0]
    assert f0["idx"] == 0 and f0["mapped"] and f0["t_iters"] == 8
    assert f0["t"] >= f0["phases"]["tracking"] >= 0.005
    assert "mapping" in f0["phases"]
    assert "mapping" not in st.frames[1]["phases"]
    # a phase outside any bracket still accumulates globally, no frame tag
    with st.phase("meshing"):
        pass
    assert st.calls["meshing"] == 1

    path = str(tmp_path / "frame_times.json")
    st.dump_frames(path)
    data = json.load(open(path))
    assert [r["idx"] for r in data["frames"]] == [0, 1]


def test_per_frame_disabled():
    st = PhaseStats(per_frame=False)
    st.begin_frame(0)
    with st.phase("tracking"):
        pass
    st.end_frame()
    assert st.frames == []
