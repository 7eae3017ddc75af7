"""Round-6 continuation: findings from the first FULL 259-entry sweep
at the 10x replica (~sf1).

`events_value_quantiles` hash-mismatched there: Spark `percentile` and
DuckDB `quantile_cont` interpolate with algebraically-equal but
floating-point-DIFFERENT evaluation orders (p99 230.53 vs
230.53000000000003) — every gate-scale corpus agreed by luck. The
entry now spells the interpolation out once as ONE shared SQL text
(`v_lo + (v_hi - v_lo) * frac`, nearest-rank lo/hi), so both engines
evaluate the identical double expression.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.plans import events_analytics as ev

SF = "/root/testdata/sf0.001"


def test_value_quantiles_one_shared_text():
    """The fix IS the shared text: any dialect split here reopens the
    door to engine-specific interpolation orders."""
    assert ev._value_quantiles_sql("spark") == ev._value_quantiles_sql("duckdb")


def test_value_quantiles_bit_equal_cross_engine(spark):
    got = ev.value_quantiles(spark, SF).toPandas()
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW events AS SELECT * FROM read_parquet('{SF}/events.parquet')"
    )
    oracle = con.execute(ev.value_quantiles_sql()).df()
    assert got.reset_index(drop=True).equals(oracle.reset_index(drop=True))


def test_value_quantiles_matches_builtin_semantics(spark):
    """The explicit interpolation must still BE linear interpolation:
    agree with Spark's builtin `percentile` to float tolerance."""
    import numpy as np

    got = ev.value_quantiles(spark, SF).toPandas()
    ev.load_table(spark, SF, "events").createOrReplaceTempView("events")
    ref = spark.sql(
        "SELECT event_type, percentile(value, 0.5) AS p50,"
        " percentile(value, 0.95) AS p95, percentile(value, 0.99) AS p99"
        " FROM events GROUP BY event_type ORDER BY event_type"
    ).toPandas()
    for c in ("p50", "p95", "p99"):
        assert np.allclose(got[c], ref[c], rtol=1e-12)


def test_value_quantiles_single_row_group(spark):
    """n=1: idx=0, lo=hi=the value, frac=0 — exact, no NULLs."""
    spark.createDataFrame(
        [(1, "a", 1.5, 10), (2, "b", 2.5, 11), (3, "b", 3.5, 12)],
        "event_id BIGINT, event_type STRING, value DOUBLE, user_id BIGINT",
    ).createOrReplaceTempView("events")
    import unittest.mock as mock

    with mock.patch.object(ev, "load_table", lambda s, d, n: s.table("events")):
        rows = {r.event_type: r for r in ev.value_quantiles(spark, SF).collect()}
    assert rows["a"].p50 == 1.5 and rows["a"].p99 == 1.5
    assert rows["b"].vmin == 2.5 and rows["b"].vmax == 3.5
