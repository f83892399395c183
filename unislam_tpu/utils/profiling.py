"""Profiling hooks: per-phase wall-time / ray-throughput counters and a JAX
profiler trace context.

The reference has NO profiling (dead `time.time()` captures,
/root/reference/src/Tracker.py:343, src/Mapper.py:367). Here throughput is a
first-class observable: the SLAM driver feeds a `PhaseStats` when
`cfg["profiling"]["enabled"]` is true, and `report()` yields the same
rays/s accounting bench.py publishes.

Note (BENCHLOG.md): under the axon TPU relay `block_until_ready` does not
actually wait — timing forces a scalar fetch instead. Enabling profiling
therefore adds one device sync per phase; keep it off for production runs.
"""

from __future__ import annotations

import contextlib
import time
from collections import defaultdict
from typing import Dict, Optional


class PhaseStats:
    """Accumulates wall time + ray counts per phase ('tracking', 'mapping',
    'meshing', ...), plus an optional PER-FRAME time series.

    The per-frame series exists to diagnose wall-time pathologies that
    aggregate stats hide (round-4: hash-mode 2 s frames interleaved with
    30-90 s spikes late in the run, invisible in the phase totals). The
    driver brackets each frame with begin_frame/end_frame; every phase()
    that closes inside the bracket is also charged to that frame's record.
    Cost: one small dict append per frame."""

    def __init__(self, per_frame: bool = True):
        self.time_s: Dict[str, float] = defaultdict(float)
        self.rays: Dict[str, int] = defaultdict(int)
        self.calls: Dict[str, int] = defaultdict(int)
        self.per_frame = per_frame
        self.frames: list = []          # [{"idx", "t", "phases", ...}, ...]
        self._cur: Optional[dict] = None
        self._cur_t0 = 0.0

    def begin_frame(self, idx: int):
        if self.per_frame:
            self._cur = {"idx": int(idx), "phases": {}}
            self._cur_t0 = time.time()

    def end_frame(self, **extra):
        """Close the frame record; `extra` lands in it verbatim (driver
        state like t_iters / mapped / eviction that explains outliers)."""
        if self._cur is not None:
            cur, self._cur = self._cur, None
            cur["t"] = round(time.time() - self._cur_t0, 4)
            cur.update(extra)
            self.frames.append(cur)

    @contextlib.contextmanager
    def phase(self, name: str, rays: int = 0, sync=None):
        """Time a phase. `sync`: a zero-dim array (or callable returning one)
        fetched after the body to force device completion."""
        t0 = time.time()
        try:
            yield
        finally:
            if sync is not None:
                val = sync() if callable(sync) else sync
                try:
                    float(val)
                except TypeError:
                    pass
            dt = time.time() - t0
            self.time_s[name] += dt
            self.rays[name] += rays
            self.calls[name] += 1
            if self._cur is not None:
                ph = self._cur["phases"]
                ph[name] = round(ph.get(name, 0.0) + dt, 4)

    def add_rays(self, name: str, rays: int):
        """Credit rays to a phase after the fact — for phases whose ray
        count is only known once the body ran (mid-frame tracking-iteration
        doubling changes the count inside track_frame)."""
        self.rays[name] += rays

    def dump_frames(self, path: str):
        """Atomically write the per-frame series as JSON (one object with a
        'frames' list; ~100 B/frame)."""
        import json
        import os
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"frames": self.frames}, f)
        os.replace(tmp, path)

    def report(self) -> Dict[str, Dict[str, float]]:
        out = {}
        for name, t in self.time_s.items():
            out[name] = {
                "time_s": round(t, 4),
                "calls": self.calls[name],
                "rays": self.rays[name],
                "rays_per_s": round(self.rays[name] / t, 1) if t else 0.0,
            }
        total_t = sum(self.time_s.values())
        total_r = sum(self.rays.values())
        out["total"] = {
            "time_s": round(total_t, 4),
            "calls": sum(self.calls.values()),
            "rays": total_r,
            "rays_per_s": round(total_r / total_t, 1) if total_t else 0.0,
        }
        return out

    def summary(self) -> str:
        rows = ["phase         time_s   calls        rays      rays/s"]
        for name, r in self.report().items():
            rows.append(f"{name:12s} {r['time_s']:8.2f} {r['calls']:7d} "
                        f"{r['rays']:11d} {r['rays_per_s']:11.1f}")
        return "\n".join(rows)


@contextlib.contextmanager
def device_trace(log_dir: Optional[str]):
    """JAX profiler trace context (view with tensorboard / xprof). No-op when
    log_dir is falsy or the profiler is unavailable on this backend."""
    if not log_dir:
        yield
        return
    import jax
    try:
        with jax.profiler.trace(log_dir):
            yield
    except Exception:   # profiling must never break a run
        yield
