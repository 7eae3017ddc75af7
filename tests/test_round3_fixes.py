"""Regression tests for the round-3 verdict/advice fixes.

Covers: the 0/1-token repetition-filter crash (ADVICE r2 medium), the
widened + validated max_delay units (ADVICE r2 low), the scalar
sketch-stats output shape, the oracle-checkable pandas-scorer recall,
and the driver-strict local canonicalizer.
"""

from __future__ import annotations

import duckdb
import pandas as pd
import pytest

from dnstap2clickhouse_spark.functions.text import repetition_filter, repetition_filter_sql
from dnstap2clickhouse_spark.operators.join import _interval_us


def test_repetition_filter_survives_short_docs(spark, tmp_path):
    """A 1-token or empty-text document must not blow up the whole query
    (sequence(1, 0) yields the DESCENDING [1, 0] and element_at threw
    INVALID_ARRAY_INDEX_IN_ELEMENT_AT before the zip_with rework); such
    docs drop out of the result in BOTH dialects (no bigrams)."""
    docs = [
        (0, "solo"),
        (1, ""),
        (2, "a b a b"),
    ]
    pdf_rows = [(i, t, "en", "test", len(t)) for i, t in docs]
    spark.createDataFrame(
        pdf_rows,
        "doc_id long, text string, lang string, source string, n_chars long",
    ).write.parquet(str(tmp_path / "documents.parquet"))
    out = {r.doc_id: r for r in repetition_filter(spark, str(tmp_path)).collect()}
    assert set(out) == {2}
    assert out[2].n_bigrams == 3

    # oracle parity on the same corpus: short docs vanish there too
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW documents AS SELECT * FROM read_parquet("
        f"'{tmp_path}/documents.parquet/*.parquet')"
    )
    oracle = con.execute(repetition_filter_sql()).df()
    assert sorted(oracle["doc_id"].tolist()) == [2]


def test_interval_us_units_and_errors():
    assert _interval_us("500 milliseconds") == 500_000
    assert _interval_us("1 week") == 7 * 86400 * 1_000_000
    assert _interval_us("10 minutes") == 600 * 1_000_000
    assert _interval_us("3 seconds") == 3_000_000
    with pytest.raises(ValueError, match="microsecond.*week"):
        _interval_us("10 fortnights")
    with pytest.raises(ValueError, match="expected"):
        _interval_us("soon")


def test_match_accepts_subsecond_delay(spark):
    """A millisecond max_delay flows through banding + INTERVAL literal."""
    from datetime import datetime, timedelta

    from dnstap2clickhouse_spark.operators.join import match_response_times

    t0 = datetime(2024, 1, 1)
    q = spark.createDataFrame(
        [(t0, "ns1", "10.0.0.1", 53, 7)],
        "queryTime timestamp, identity string, queryAddress string, queryPort long, id long",
    )
    r = spark.createDataFrame(
        [
            (t0 + timedelta(milliseconds=300), "ns1", "10.0.0.1", 53, 7),
            (t0 + timedelta(milliseconds=900), "ns1", "10.0.0.1", 53, 7),
        ],
        "responseTime timestamp, identity string, queryAddress string, queryPort long, id long",
    )
    got = match_response_times(q, r, max_delay="500 milliseconds").collect()
    assert [row.delta_us for row in got] == [300_000]


def test_sketch_stats_scalar_columns(spark):
    """Output carries scalar p50/p95 (hashable cells for the driver), not
    an array column (CORRECTNESS_r02: 'unhashable type: list')."""
    from dnstap2clickhouse_spark.plans.events_analytics import sketch_stats

    df = sketch_stats(spark, "/root/testdata/sf0.001")
    dtypes = dict(df.dtypes)
    assert dtypes["approx_p50"] == "double"
    assert dtypes["approx_p95"] == "double"
    assert not any(t.startswith("array") for t in dtypes.values())
    rows = df.collect()
    assert all(r.approx_p50 <= r.approx_p95 for r in rows)


def test_pandas_recall_is_perfect(spark):
    """The numpy scorer's top-k membership equals the exact fold's —
    recall@k == 1.0 for every query (the oracle-checkable form of the
    last-ulp-drift rows-only entry)."""
    from dnstap2clickhouse_spark.functions.similarity import TOP_K, pandas_recall

    rows = pandas_recall(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) > 0
    assert all(r.n_hits == TOP_K and r.recall_at_k == 1.0 for r in rows)


def test_local_canon_is_driver_strict():
    """The local gate must be at least as strict as the driver's: full
    float precision (int 310 vs float 310.0 differ) and hard rejection of
    list-typed cells (VERDICT r2 'What's wrong' #3)."""
    import sys

    sys.path.insert(0, "/root/repo/tools")
    from check_correctness import canon

    ints = canon(pd.DataFrame({"v": [310]}))
    floats = canon(pd.DataFrame({"v": [310.0]}))
    assert not ints.equals(floats)

    # tiny drift below the old %.10g rounding must stay visible
    a = canon(pd.DataFrame({"v": [1.00000000001]}))
    b = canon(pd.DataFrame({"v": [1.0]}))
    assert not a.equals(b)

    with pytest.raises(TypeError, match="unhashable"):
        canon(pd.DataFrame({"v": [[0.5, 0.95]]}))


def test_ntz_events_load_is_session_zone_independent(spark):
    """events.ts (TIMESTAMP_NTZ parquet) must land on the same instants
    even when the session zone is non-UTC and the conf pin is refused
    (locked-down sessions): the cast's session-zone offset is cancelled
    by from_utc_timestamp(current_timezone())."""
    from unittest import mock

    from dnstap2clickhouse_spark.sources import tables

    SF = "/root/testdata/sf0.001"
    ref = [
        r.ts.timestamp()
        for r in tables.load_table(spark, SF, "events")
        .select("ts").orderBy("ts").limit(20).collect()
    ]
    spark.conf.set("spark.sql.session.timeZone", "America/New_York")
    try:
        with mock.patch.object(tables, "_ensure_session_confs", lambda s: None):
            got = [
                r.ts.timestamp()
                for r in tables.load_table(spark, SF, "events")
                .select("ts").orderBy("ts").limit(20).collect()
            ]
    finally:
        spark.conf.set("spark.sql.session.timeZone", "UTC")
    assert got == ref
