"""Tumbling-window dedup-count (A1 + A6/A7).

The reference's core aggregation (``increaseCounter``, aggregator.go:229-238)
is an upsert map: first occurrence stores the row, later occurrences only
add ``Counter`` — drained and cleared every ``WriteInterval``
(aggregator.go:411-453, timer 535/595-601). The map's kept timestamp is the
*first seen* one.

Spark-first port: event-time tumbling ``window()`` + ``groupBy`` with
``sum(counter)`` and ``min(time)`` as the deterministic stand-in for
"first seen" (the reference's processing-time arrival order is
nondeterministic under parallelism; event-time min is the well-defined
upgrade — delta documented in SURVEY.md section 2.9).

Scale note: this is ONE shuffle keyed on (window, keys); partial
aggregation runs map-side, so the shuffle carries one row per distinct key
per input partition, not one per event.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

def window_dedup_count(
    df: DataFrame,
    time_col: str,
    keys: list[str],
    interval: str = "20 seconds",
) -> DataFrame:
    """A1+A6: returns windowStart, *keys, <time_col>=min, counter=sum.

    Streaming-compatible (the ``window()`` group key is what Structured
    Streaming requires for watermark-based state eviction).
    """
    return (
        df.groupBy(F.window(time_col, interval).alias("__w"), *keys)
        .agg(F.min(time_col).alias(time_col), F.sum("counter").alias("counter"))
        .select(F.col("__w.start").alias("windowStart"), *keys, time_col, "counter")
    )

def window_dedup_count_sql(
    inner_sql: str,
    time_col: str,
    keys: list[str],
    interval_s: int = 20,
) -> str:
    """DuckDB-oracle counterpart (epoch-aligned tumbling bucket, same as
    Spark's default window alignment)."""
    key_sql = ", ".join(keys)
    return (
        f"SELECT time_bucket(INTERVAL '{interval_s} seconds', {time_col}) AS windowStart,\n"
        f"       {key_sql},\n"
        f"       min({time_col}) AS {time_col},\n"
        # CAST: DuckDB sum(BIGINT) widens to HUGEINT; Spark keeps BIGINT
        f"       CAST(sum(counter) AS BIGINT) AS counter\n"
        f"FROM ({inner_sql})\n"
        f"GROUP BY ALL"
    )
