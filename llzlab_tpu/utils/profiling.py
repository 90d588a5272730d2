"""Tracing / roofline profiling (SURVEY.md §5 tracing).

Reference counterpart: ``llz_timeprofile`` wall-clock accumulators (mount
empty).  Here: ``jax.profiler`` trace capture (XLA/TensorBoard format),
``block_until_ready`` stage timers, and a roofline report comparing
achieved bytes/s and flop/s to chip peaks — verifying the BASELINE.json:5
"speed-of-light" claims (HBM-bound long filters, MXU-bound block conv).
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Optional

import jax

__all__ = ["StageTimer", "trace", "CHIP_PEAKS", "roofline_report"]

# Peak specs per device kind (bf16 matmul TFLOP/s, HBM GB/s).  f32 matmul
# at Precision.HIGHEST runs at roughly peak/6 on these parts.
CHIP_PEAKS = {
    "TPU v5 lite": {"tflops_bf16": 197.0, "hbm_gbps": 819.0},
    "TPU v5e": {"tflops_bf16": 197.0, "hbm_gbps": 819.0},
    "TPU v5p": {"tflops_bf16": 459.0, "hbm_gbps": 2765.0},
    "TPU v4": {"tflops_bf16": 275.0, "hbm_gbps": 1228.0},
    "cpu": {"tflops_bf16": 1.0, "hbm_gbps": 50.0},
}


@dataclass
class StageTimer:
    """Accumulating per-stage wall timers (device-synchronised)."""

    totals: Dict[str, float] = field(default_factory=dict)
    counts: Dict[str, int] = field(default_factory=dict)

    @contextlib.contextmanager
    def stage(self, name: str, sync_on=None):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            if sync_on is not None:
                jax.block_until_ready(sync_on)
            dt = time.perf_counter() - t0
            self.totals[name] = self.totals.get(name, 0.0) + dt
            self.counts[name] = self.counts.get(name, 0) + 1

    def time_fn(self, name: str, fn, *args, **kw):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        jax.block_until_ready(out)
        dt = time.perf_counter() - t0
        self.totals[name] = self.totals.get(name, 0.0) + dt
        self.counts[name] = self.counts.get(name, 0) + 1
        return out

    def report(self) -> str:
        lines = []
        for k in sorted(self.totals, key=lambda k: -self.totals[k]):
            n = self.counts[k]
            lines.append(
                f"{k:30s} {self.totals[k]*1e3:9.2f} ms total  "
                f"{self.totals[k]/n*1e3:8.2f} ms/call  x{n}"
            )
        return "\n".join(lines)


@contextlib.contextmanager
def trace(logdir: str):
    """Capture an XLA profiler trace viewable in TensorBoard/Perfetto."""
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def roofline_report(
    *, seconds: float, flops: float = 0.0, bytes_moved: float = 0.0,
    device_kind: Optional[str] = None,
) -> Dict[str, float]:
    """Achieved vs peak: fraction of HBM bandwidth and MXU throughput."""
    kind = device_kind or jax.devices()[0].device_kind
    peaks = CHIP_PEAKS.get(kind, CHIP_PEAKS["cpu"])
    out = {
        "seconds": seconds,
        "achieved_gbps": bytes_moved / seconds / 1e9 if seconds else 0.0,
        "achieved_tflops": flops / seconds / 1e12 if seconds else 0.0,
        "peak_gbps": peaks["hbm_gbps"],
        "peak_tflops_bf16": peaks["tflops_bf16"],
    }
    out["hbm_fraction"] = out["achieved_gbps"] / peaks["hbm_gbps"]
    out["mxu_fraction_bf16"] = out["achieved_tflops"] / peaks["tflops_bf16"]
    return out
