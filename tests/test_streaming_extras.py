"""A11 stats listener + O4 adaptive sampler controller behavior."""

from __future__ import annotations

import itertools
import os
import shutil
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark import streaming as st
from dnstap2clickhouse_spark.sources.tables import load_table
from dnstap2clickhouse_spark.streaming.adaptive_sampler import (
    MAX_SAMPLES,
    MIN_SAMPLES,
    AdaptiveSampler,
    sampled_foreach_batch,
)
from dnstap2clickhouse_spark.streaming.stats import EngineStatsListener, stats_intervals

SF = "/root/testdata/sf0.001"

def test_stats_interval_ladder():
    # 10, 15, 22.5, ... capped at 4h (main.go:38, 155-164)
    seq = list(itertools.islice(stats_intervals(), 30))
    assert seq[0] == 10.0 and seq[1] == 15.0
    assert seq[-1] == 4 * 3600

def test_listener_counts_rows(spark, tmp_path):
    listener = EngineStatsListener()
    spark.streams.addListener(listener)
    try:
        d = str(tmp_path / "chunks")
        ev = load_table(spark, SF, "events")
        ev.coalesce(1).write.mode("append").parquet(d)
        sdf = st.streaming_passthrough(st.read_events_stream(spark, d, SF))
        st.run_stream_to_memory(sdf, "append", spark)
        # PySpark delivers listener callbacks asynchronously — poll
        import time

        total_rows = 0
        for _ in range(100):
            total_rows += sum(s["rows"] for s in listener.read_and_reset().values())
            if total_rows >= ev.count():
                break
            time.sleep(0.2)
        assert total_rows == ev.count()
        # drain-on-read semantics: an immediate second read is empty
        assert sum(s["rows"] for s in listener.read_and_reset().values()) == 0
    finally:
        spark.streams.removeListener(listener)

def test_tune_mask_widens_and_narrows():
    s = AdaptiveSampler()
    # flood: repeated over-MAX intervals widen the mask (halve rate)
    s.observe(10_000)
    s.observe(10_000)
    assert s.mask == 0b11
    # starve: under-MIN intervals narrow it back (double rate)
    s.observe(MIN_SAMPLES - 1)
    s.observe(MIN_SAMPLES - 1)
    assert s.mask == 0
    # overflow pressure alone widens after MAX_EXCEEDS
    for _ in range(5):
        s.observe(100, state_overflowed=True)
    assert s.mask > 0

def test_adaptive_foreach_batch_controls_rate(spark):
    """Drive the controller from an actual streaming query: a flood of
    ids must leave the controller with a widened mask and later batches
    smaller than earlier ones."""
    d = tempfile.mkdtemp(prefix="adapt_")
    try:
        ev = load_table(spark, SF, "events").selectExpr("event_id % 65536 AS id")
        for i in range(3):  # 3 micro-batches of ~1600 rows each
            ev.filter(f"id % 3 = {i}").coalesce(1).write.mode("append").parquet(d)
        schema = "id BIGINT"
        sdf = (
            spark.readStream.schema(schema).option("maxFilesPerTrigger", "1").parquet(d)
        )
        sampler = AdaptiveSampler()
        seen: list[int] = []
        q = (
            sdf.writeStream.outputMode("append")
            .foreachBatch(
                sampled_foreach_batch(sampler, lambda df, _e: seen.append(df.count()))
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert len(seen) == 3
        assert sampler.mask > 0, "flood must widen the mask"
        assert seen[-1] < seen[0], "later batches must be sampled down"
        assert seen[-1] <= MAX_SAMPLES * 2  # rate heading into the band
    finally:
        shutil.rmtree(d, ignore_errors=True)
