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
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# aggregator.go:37-40
MIN_SAMPLES = 32
MAX_SAMPLES = 256
MAX_EXCEEDS = 3

class AdaptiveSampler:
    """Driver-side mask controller, one instance per streaming query."""

    def __init__(self, match: int = 0x2A) -> None:
        self.mask = 0
        self.match = match
        self.exceeds = 0
        self.history: list[int] = []

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

def sampled_foreach_batch(sampler: AdaptiveSampler, sink) -> "callable":
    """Wrap a foreachBatch sink with the adaptive tap: filter with the
    live mask, ship the batch, feed the count back to the controller."""

    def run(df: DataFrame, epoch_id: int) -> None:
        kept = sampler.apply(df)
        n = kept.count()
        sink(kept, epoch_id)
        sampler.observe(n)

    return run
