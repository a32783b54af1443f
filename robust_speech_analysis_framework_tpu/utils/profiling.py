"""Tracing and throughput instrumentation.

The reference has no profiling beyond tqdm bars (SURVEY.md §5); here the
framework exposes:

* :class:`ThroughputMeter` — audio-seconds/second counters per pipeline
  stage (the BASELINE.json headline unit), with wall-clock and device-sync
  aware timing;
* :func:`stage_timer` — context manager feeding a meter;
* :func:`trace_to` — wrapper over ``jax.profiler`` emitting an XPlane trace
  viewable in TensorBoard/Perfetto for kernel-level analysis.
"""

from __future__ import annotations

import contextlib
import time
from dataclasses import dataclass, field
from typing import Dict, Iterator, Optional


@dataclass
class StageStats:
    seconds: float = 0.0
    audio_seconds: float = 0.0
    items: int = 0

    @property
    def audio_sec_per_sec(self) -> float:
        return self.audio_seconds / self.seconds if self.seconds > 0 else 0.0


@dataclass
class ThroughputMeter:
    stages: Dict[str, StageStats] = field(default_factory=dict)

    def add(self, stage: str, seconds: float, audio_seconds: float = 0.0,
            items: int = 0) -> None:
        s = self.stages.setdefault(stage, StageStats())
        s.seconds += seconds
        s.audio_seconds += audio_seconds
        s.items += items

    def report(self) -> str:
        lines = []
        for name, s in sorted(self.stages.items()):
            rate = f"{s.audio_sec_per_sec:.1f} audio-s/s" if s.audio_seconds else ""
            lines.append(
                f"{name:30s} {s.seconds:8.2f}s  {s.items:6d} items  {rate}"
            )
        return "\n".join(lines)

    def as_dict(self) -> Dict[str, Dict[str, float]]:
        return {
            k: {
                "seconds": v.seconds,
                "audio_seconds": v.audio_seconds,
                "items": v.items,
                "audio_sec_per_sec": v.audio_sec_per_sec,
            }
            for k, v in self.stages.items()
        }


@contextlib.contextmanager
def stage_timer(
    meter: Optional[ThroughputMeter],
    stage: str,
    audio_seconds: float = 0.0,
    items: int = 0,
    sync=None,
) -> Iterator[None]:
    """Time a block; ``sync`` may be an array/pytree to block on (device
    completion) before stopping the clock."""
    t0 = time.perf_counter()
    try:
        yield
    finally:
        if sync is not None:
            import jax

            jax.block_until_ready(sync)
        if meter is not None:
            meter.add(stage, time.perf_counter() - t0, audio_seconds, items)


@contextlib.contextmanager
def trace_to(log_dir: str) -> Iterator[None]:
    """Capture a jax.profiler device trace for the enclosed block."""
    import jax

    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


# ---------------------------------------------------------------------------
# Fresh-process cost spans: cumulative wall per labeled region, for
# attributing first-pass walls (trace vs AOT-deserialize vs compile vs init
# vs upload) without a full profiler. Enabled whenever imported — overhead
# is two perf_counter calls per span.
# ---------------------------------------------------------------------------

_SPANS: Dict[str, float] = {}
_SPAN_COUNTS: Dict[str, int] = {}


@contextlib.contextmanager
def span(label: str) -> Iterator[None]:
    t0 = time.perf_counter()
    try:
        yield
    finally:
        dt = time.perf_counter() - t0
        _SPANS[label] = _SPANS.get(label, 0.0) + dt
        _SPAN_COUNTS[label] = _SPAN_COUNTS.get(label, 0) + 1


def span_report(reset: bool = False) -> Dict[str, Dict[str, float]]:
    """{label: {seconds, calls}} accumulated since process start (or the
    last reset). benchmarks/suite.py attaches this to first-pass timings so
    a 15 s fresh-process wall decomposes into named costs."""
    out = {
        k: {"seconds": v, "calls": _SPAN_COUNTS.get(k, 0)}
        for k, v in sorted(_SPANS.items(), key=lambda kv: -kv[1])
    }
    if reset:
        _SPANS.clear()
        _SPAN_COUNTS.clear()
    return out
