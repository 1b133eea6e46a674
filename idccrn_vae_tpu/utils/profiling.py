"""Profiling / tracing / memory observability.

The reference has essentially none of this (SURVEY.md §5.1: wall-time
via datetime, a never-called log_memory). Here it is first-class:

  * `trace(dir)` — context manager around jax.profiler.trace; view the
    result in TensorBoard/XProf (works on TPU: captures HLO + device
    timeline).
  * `StepTimer` — wall-time per step with jax.block_until_ready on a
    probe output, EMA + percentile summary.
  * `log_memory` — host RSS + per-device HBM stats
    (device.memory_stats()), the working equivalent of the reference's
    dead supervised_dccrn/train.py:39-44 helper.
"""

from __future__ import annotations

import contextlib
import time
from typing import Dict, List, Optional

import jax
import numpy as np


@contextlib.contextmanager
def trace(log_dir: str):
    """Capture a device trace: `with trace('/tmp/prof'): step(...)`."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StepTimer:
    """Per-step wall timing with blocking on a probe value."""

    def __init__(self, name: str = "step"):
        self.name = name
        self.times: List[float] = []
        self._t0: Optional[float] = None

    def __enter__(self):
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.times.append(time.perf_counter() - self._t0)

    def block_and_stop(self, probe):
        """Block on a device value then record (use as the last call in a
        manual start/stop pattern)."""
        jax.block_until_ready(probe)
        self.times.append(time.perf_counter() - self._t0)

    def summary(self) -> Dict[str, float]:
        if not self.times:
            return {}
        t = np.asarray(self.times)
        return {
            "count": int(t.size),
            "mean_s": float(t.mean()),
            "p50_s": float(np.percentile(t, 50)),
            "p95_s": float(np.percentile(t, 95)),
            "total_s": float(t.sum()),
        }


def log_memory(logger=None) -> Dict[str, float]:
    """Host RSS + per-device memory stats (bytes)."""
    out: Dict[str, float] = {}
    try:
        import resource
        import sys

        rss = resource.getrusage(resource.RUSAGE_SELF).ru_maxrss
        # ru_maxrss is kilobytes on Linux but BYTES on macOS
        out["host_rss_mb"] = rss / (1024.0 * 1024.0
                                    if sys.platform == "darwin" else 1024.0)
    except Exception:  # pragma: no cover
        pass
    for d in jax.devices():
        try:
            stats = d.memory_stats()
        except Exception:
            continue
        if stats:
            out[f"{d.id}_bytes_in_use_mb"] = (
                stats.get("bytes_in_use", 0) / 1e6)
            out[f"{d.id}_peak_bytes_mb"] = (
                stats.get("peak_bytes_in_use", 0) / 1e6)
    if logger is not None:
        logger.info("memory: %s", {k: round(v, 1) for k, v in out.items()})
    return out
