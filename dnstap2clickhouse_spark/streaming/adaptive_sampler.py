"""O4: the adaptive bitmask sample-rate controller, streaming flavor.

Reference (``tuneMask``, aggregator.go:455-483): every sample-flush the
controller widens the mask (halving the sample rate) when the join state
overflowed too often or the interval produced more than
``MAX_QUERY_RESPONSE_SAMPLES``, and narrows it (doubling the rate) when
there was no overflow and fewer than ``MIN_QUERY_RESPONSE_SAMPLES``.

The batch engine deliberately uses a *static* mask (deterministic,
oracle-testable — operators/sampling.py); Spark's watermark-bounded state
removes the memory pressure the controller manages (SURVEY.md section
2.7). This module exists to close the semantic gap anyway: the same
control loop, driven per micro-batch from ``foreachBatch`` — controller
state lives on the driver exactly like the reference's aggregator-local
mask, and each batch is filtered JVM-side with the current mask before
any Python sees a row.

Both of the reference's input signals are wired to REAL runtime sources:

- *sample count*: the foreachBatch tap persists the filtered batch and
  counts it ONCE (the count and the sink write share the same
  materialization — no double evaluation);
- *state overflow*: :meth:`AdaptiveSampler.observe_progress` reads
  ``stateOperators[*].numRowsTotal`` out of a genuine
  ``StreamingQuery.lastProgress`` / listener progress event and compares
  it against ``state_rows_cap`` — the Spark analogue of the reference's
  fixed-size hash state filling up (aggregator.go:37, 455-460).
"""

from __future__ import annotations

import json
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

# aggregator.go:37-40
MIN_SAMPLES = 32
MAX_SAMPLES = 256
MAX_EXCEEDS = 3

def _progress_dict(progress: Any) -> dict | None:
    """Coerce the various lastProgress shapes (dict in classic PySpark,
    StreamingQueryProgress object with a .json in newer APIs) to a dict."""
    if progress is None:
        return None
    if isinstance(progress, dict):
        return progress
    raw = getattr(progress, "json", None)
    if raw is not None:
        return json.loads(raw() if callable(raw) else raw)
    return None

class AdaptiveSampler:
    """Driver-side mask controller, one instance per streaming query.

    ``state_rows_cap`` bounds total stream-state rows (summed over
    ``stateOperators``) before the controller treats a batch as an
    overflow — the role the reference's per-key 8-slot array cap plays
    (aggregator.go:37): not a hard limit, a back-pressure signal.
    """

    def __init__(self, match: int = 0x2A, state_rows_cap: int | None = None) -> None:
        self.mask = 0
        self.match = match
        self.exceeds = 0
        self.state_rows_cap = state_rows_cap
        self.history: list[int] = []
        #: rows kept by the most recent foreachBatch tap (single count of
        #: the persisted batch); observe_progress prefers this over the
        #: progress event's sink numOutputRows (which foreachBatch sinks
        #: report as -1).
        self.last_batch_rows: int | None = None

    def apply(self, df: DataFrame, id_col: str = "id") -> DataFrame:
        """Filter a micro-batch with the CURRENT mask (F6 predicate,
        aggregator.go:332-337) — stays a JVM-side filter."""
        if self.mask == 0:
            return df
        return df.filter(
            F.col(id_col).bitwiseAND(F.lit(self.mask)) == F.lit(self.match & self.mask)
        )

    def observe(self, n_samples: int, state_overflowed: bool = False) -> None:
        """tuneMask (aggregator.go:455-483), one call per batch/interval."""
        if state_overflowed:
            self.exceeds += 1
        if self.exceeds > MAX_EXCEEDS or n_samples > MAX_SAMPLES:
            self.mask = (self.mask << 1) | 1  # widen: halve the rate
            self.exceeds = 0
        elif not state_overflowed and n_samples < MIN_SAMPLES and self.mask:
            self.mask >>= 1  # narrow: double the rate
        self.history.append(self.mask)

    def observe_progress(self, progress: Any, n_samples: int | None = None) -> None:
        """Feed tuneMask from a real progress event.

        ``progress`` is ``StreamingQuery.lastProgress`` (or the
        ``.progress`` of a listener's QueryProgressEvent). Overflow =
        ``sum(stateOperators[*].numRowsTotal) > state_rows_cap`` — actual
        observed state pressure, not a caller-supplied boolean. Sample
        count resolution order: explicit ``n_samples`` arg, then the
        foreachBatch tap's single-count (``last_batch_rows``, consumed
        exactly once so an idle stream's empty progress events can't
        re-observe a stale count), then the progress event's
        ``sink.numOutputRows`` (clamped at 0 because foreachBatch sinks
        report -1).
        """
        p = _progress_dict(progress)
        if p is None:
            return
        state_rows = sum(
            int(op.get("numRowsTotal") or 0) for op in (p.get("stateOperators") or [])
        )
        overflowed = self.state_rows_cap is not None and state_rows > self.state_rows_cap
        if n_samples is None:
            n_samples, self.last_batch_rows = self.last_batch_rows, None
        if n_samples is None:
            n_samples = max(0, int((p.get("sink") or {}).get("numOutputRows") or 0))
        self.observe(int(n_samples), overflowed)

def sampled_foreach_batch(sampler: AdaptiveSampler, sink, observe: bool = True) -> "callable":
    """Wrap a foreachBatch sink with the adaptive tap: filter with the
    live mask, persist, count ONCE, ship the same materialized batch to
    the sink, then unpersist. Pass ``observe=False`` when the controller
    is instead driven from progress events (``observe_progress``) so each
    batch is observed exactly once."""

    def run(df: DataFrame, epoch_id: int) -> None:
        kept = sampler.apply(df).persist(StorageLevel.MEMORY_AND_DISK)
        try:
            n = kept.count()
            sampler.last_batch_rows = n
            sink(kept, epoch_id)
        finally:
            kept.unpersist()
        if observe:
            sampler.observe(n)

    return run
