"""Latency/throughput metrics (≙ LatencyMonitor, design.md:2005-2061;
ExecutionReport design.md:1787-1792).

Batch side: per-stage wall times live in the lineage manifest
(plans/lineage.execution_report). Streaming side: a
StreamingQueryListener records per-micro-batch durations; rolling stats
over the last ``window`` batches mirror the reference's moving window of
100 latencies (design.md:2022-2026) with its 100 ms budget check
(requirements.md:100-103).
"""

from __future__ import annotations

from collections import deque
from dataclasses import dataclass, field

from pyspark.sql.streaming import StreamingQueryListener


@dataclass
class LatencyStats:
    window: int = 100
    budget_ms: float = 100.0
    samples: deque = field(default_factory=deque)
    violations: int = 0
    total: int = 0

    def record(self, ms: float) -> None:
        self.samples.append(ms)
        if len(self.samples) > self.window:
            self.samples.popleft()
        self.total += 1
        if ms > self.budget_ms:
            self.violations += 1

    @property
    def avg_ms(self) -> float:
        return sum(self.samples) / len(self.samples) if self.samples else 0.0

    @property
    def max_ms(self) -> float:
        return max(self.samples) if self.samples else 0.0

    def report(self) -> dict:
        return {
            "n": self.total,
            "window_avg_ms": round(self.avg_ms, 3),
            "window_max_ms": round(self.max_ms, 3),
            "budget_ms": self.budget_ms,
            "violations": self.violations,
        }


class MicroBatchLatencyListener(StreamingQueryListener):
    """Attach with ``spark.streams.addListener`` — collects per-batch
    durations into LatencyStats keyed by query id."""

    def __init__(self, window: int = 100, budget_ms: float = 100.0):
        self.stats: dict[str, LatencyStats] = {}
        self._window = window
        self._budget = budget_ms

    def onQueryStarted(self, event) -> None:  # noqa: N802
        self.stats.setdefault(
            str(event.id), LatencyStats(self._window, self._budget)
        )

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        dur = (p.durationMs or {}).get("triggerExecution")
        if dur is not None:
            self.stats.setdefault(
                str(p.id), LatencyStats(self._window, self._budget)
            ).record(float(dur))

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass
