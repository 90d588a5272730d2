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

__all__ = ["StageTimer", "trace", "CHIP_PEAKS", "roofline_report",
           "collective_traffic"]

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


_DTYPE_BYTES = {
    "f64": 8, "f32": 4, "f16": 2, "bf16": 2, "f8e4m3": 1, "f8e5m2": 1,
    "s64": 8, "s32": 4, "s16": 2, "s8": 1,
    "u64": 8, "u32": 4, "u16": 2, "u8": 1,
    "c64": 8, "c128": 16, "pred": 1,
}

_COLLECTIVES = ("collective-permute", "all-to-all", "all-gather",
                "all-reduce", "reduce-scatter")

_SHAPE_RE = __import__("re").compile(r"(\w+)\[([\d,]*)\]")


def _shape_bytes(shape_str: str) -> int:
    """Byte size of one HLO shape string like ``f32[8,1023]{1,0}`` or a
    tuple ``(f32[8,2], f32[8,2])`` (sums the elements)."""
    total = 0
    for dt, dims in _SHAPE_RE.findall(shape_str):
        if dt not in _DTYPE_BYTES:
            continue
        n = 1
        for d in dims.split(","):
            if d:
                n *= int(d)
        total += n * _DTYPE_BYTES[dt]
    return total


def collective_traffic(compiled_hlo_text: str) -> Dict[str, object]:
    """Measured (compiler-emitted) collective traffic from compiled HLO.

    Parses the post-SPMD-partitioning HLO of a jitted function
    (``fn.lower(*args).compile().as_text()``) and sums, per collective
    kind, the bytes each op moves across the mesh per execution:

    * ``collective-permute``: operand bytes × number of
      ``source_target_pairs`` (each pair is one point-to-point send of
      the per-device shard).
    * ``all-gather`` / ``all-to-all`` / ``reduce-scatter`` /
      ``all-reduce``: per-device PAYLOAD bytes × participants per
      replica group, summed over groups (the bytes injected into the
      interconnect; algorithm-dependent retransmits not modelled).
      The regex captures the op's RESULT shape, which is not the
      payload for the resharding kinds (ADVICE r3): an all-gather's
      result is already ``participants ×`` the per-device shard (so the
      payload is result ÷ group size) and a reduce-scatter's operand is
      ``participants ×`` its result (payload = result × group size);
      all-to-all and all-reduce results equal their per-device payload.

    This is the ground-truth cross-check for analytic comm models
    (VERDICT r2 weak #6): the analytic halo model must agree with what
    XLA actually emitted.  Returns ``{"total_bytes", "ops": [...]}``.
    """
    import re

    ops = []
    for line in compiled_hlo_text.splitlines():
        m = re.search(
            r"=\s*((?:\([^)]*\))|(?:\w+\[[\d,]*\][^ ]*))\s+"
            r"(" + "|".join(_COLLECTIVES) + r")(?:-start)?\(", line)
        if not m:
            continue
        shape_str, kind = m.group(1), m.group(2)
        per_dev = _shape_bytes(shape_str)
        if kind == "collective-permute":
            pairs = re.search(
                r"source_target_pairs=\{((?:\{\d+,\d+\},?)*)\}", line)
            nsend = len(re.findall(r"\{\d+,\d+\}",
                                   pairs.group(1))) if pairs else 1
            total = per_dev * nsend
        else:
            groups = re.search(r"replica_groups=\{(.*?)\}\}", line)
            sizes = [len(g.split(","))
                     for g in re.findall(r"\{([\d,]+)\}",
                                         groups.group(1) + "}")] if groups \
                else [1]
            def payload(s, _k=kind, _b=per_dev):
                if _k == "all-gather":
                    return _b / max(s, 1)
                if _k == "reduce-scatter":
                    return _b * s
                return _b

            total = sum(payload(s) * s for s in sizes)
            per_dev = payload(sizes[0])
        ops.append({"op": kind, "bytes": int(total),
                    "bytes_per_device": int(per_dev)})
    return {"total_bytes": int(sum(o["bytes"] for o in ops)), "ops": ops}


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
