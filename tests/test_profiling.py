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
