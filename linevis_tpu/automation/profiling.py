"""Tracing/profiling harness (SURVEY §5 'Tracing/profiling').

The reference compiles Tracy zones into the frame/update/load paths and
attaches per-pass GPU timers feeding the perf CSVs
(`AutomaticPerformanceMeasurer.hpp:64-65,98`).  TPU equivalents:

- `trace(path)` — a `jax.profiler` trace context writing a TensorBoard /
  Perfetto trace of everything dispatched inside (XLA ops, Pallas
  kernels, transfers).
- `FrameProfiler` — named per-pass wall timers with block-until-ready
  semantics, written to a CSV with one row per (frame, pass) — the
  reference's per-pass timer CSV schema.
"""

from __future__ import annotations

import contextlib
import csv
import time
from typing import Dict, List

import jax

__all__ = ["trace", "FrameProfiler"]


@contextlib.contextmanager
def trace(log_dir: str):
    """jax.profiler trace context: view with TensorBoard or Perfetto."""
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class FrameProfiler:
    """Named pass timers (reference per-pass GPU timer role).

    with prof.pass_("gather"):
        out = kernel(...)
    `pass_` blocks on the pass's outputs, so the measured wall time
    includes the device work dispatched inside (on axon, pass outputs
    must be consumed or chained for this to hold — prefer returning
    arrays from the block and letting the next pass consume them, then
    use `force` on the final output).
    """

    def __init__(self):
        self.rows: List[Dict] = []
        self.frame = 0

    @contextlib.contextmanager
    def pass_(self, name: str, force=None):
        t0 = time.time()
        yield
        if force is not None:
            jax.block_until_ready(force)
        self.rows.append({
            "Frame": self.frame,
            "Pass": name,
            "Time (ms)": (time.time() - t0) * 1000.0,
        })

    def next_frame(self) -> None:
        self.frame += 1

    def summary(self) -> Dict[str, float]:
        """Average ms per pass name."""
        acc: Dict[str, List[float]] = {}
        for r in self.rows:
            acc.setdefault(r["Pass"], []).append(r["Time (ms)"])
        return {k: sum(v) / len(v) for k, v in acc.items()}

    def write_csv(self, path: str) -> None:
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=["Frame", "Pass", "Time (ms)"])
            w.writeheader()
            w.writerows(self.rows)
