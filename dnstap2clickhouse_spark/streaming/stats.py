"""A11: pipeline stats counters (SURVEY.md section 2.4).

The reference keeps monotonic per-stage counters drained on read and
reports them on a self-doubling interval: 10s, x1.5 each report, capped
at 4h (main.go:38, 155-178; dnstap.go:380-386; aggregator.go:624-633;
clickhouse.go:417-424).

Spark surfaces the same signal through ``StreamingQueryListener`` /
``query.lastProgress`` — no data-plane operator needed. This module binds
it: a listener accumulating per-query input/processed counts, plus the
reference's reporting-interval ladder for callers that schedule their own
stat dumps.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql.streaming import StreamingQueryListener

MAX_STATS_INTERVAL_S = 4 * 3600  # main.go:38

def stats_intervals(start: float = 10.0, factor: float = 1.5) -> Iterator[float]:
    """10s, x1.5, ... capped at 4h (main.go:155-164)."""
    d = start
    while True:
        yield d
        d = min(d * factor, MAX_STATS_INTERVAL_S)

class EngineStatsListener(StreamingQueryListener):
    """Accumulates per-query batch and row counters (drain-on-read like
    the reference's ReadAndResetStats)."""

    def __init__(self) -> None:
        self._rows: dict[str, int] = {}
        self._batches: dict[str, int] = {}

    def onQueryStarted(self, event) -> None:  # noqa: N802 (Spark API)
        self._rows.setdefault(event.id, 0)
        self._batches.setdefault(event.id, 0)

    def onQueryProgress(self, event) -> None:  # noqa: N802
        p = event.progress
        self._rows[p.id] = self._rows.get(p.id, 0) + int(p.numInputRows)
        self._batches[p.id] = self._batches.get(p.id, 0) + 1

    def onQueryTerminated(self, event) -> None:  # noqa: N802
        pass

    def onQueryIdle(self, event) -> None:  # noqa: N802
        pass

    def read_and_reset(self) -> dict[str, dict[str, int]]:
        """Drain counters (aggregator.go:624-633 semantics)."""
        out = {
            qid: {"rows": self._rows.get(qid, 0), "batches": self._batches.get(qid, 0)}
            for qid in set(self._rows) | set(self._batches)
        }
        self._rows.clear()
        self._batches.clear()
        return out
