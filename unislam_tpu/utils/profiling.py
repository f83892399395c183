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
    'meshing', ...)."""

    def __init__(self):
        self.time_s: Dict[str, float] = defaultdict(float)
        self.rays: Dict[str, int] = defaultdict(int)
        self.calls: Dict[str, int] = defaultdict(int)

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
            self.time_s[name] += time.time() - t0
            self.rays[name] += rays
            self.calls[name] += 1

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
