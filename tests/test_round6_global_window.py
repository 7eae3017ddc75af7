"""Round-6 continuation: the `global-window` audit hazard and the three
entries it caught.

An unpartitioned WindowExec moves the whole corpus into ONE task ("No
Partition Defined" WARN — 394 occurrences across a full sweep log).
Three contract entries ran one over raw fact rows: the equi-depth
histogram's global value rank, the MAD gate's two nearest-rank medians,
and the vocab-growth doc rank. Each now computes the rank as the
repo's distributed prefix sum (`splits.global_prefix_sum`) on the
Spark side — DuckDB oracle strings untouched — and the audit parses
the window spec properly (partition columns print WITHOUT a sort
direction; a partition-only window prints two bracket groups exactly
like an order-only one, so group counting misclassifies both ways).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.functions import text as ftext
from dnstap2clickhouse_spark.plans import events_analytics as ev
from tools.audit_plans import _window_unpartitioned, audit_plan

SF = "/root/testdata/sf0.001"

ORDER_ONLY = (
    "+- Window [row_number() windowspecdefinition(n_tokens#324L ASC NULLS FIRST, "
    "doc_id#319L ASC NULLS FIRST, specifiedwindowframe(RowFrame, unboundedpreceding$(), "
    "currentrow$())) AS rk#325], [n_tokens#324L ASC NULLS FIRST]"
)
PARTITION_ONLY = (
    "+- Window [min(doc_id#0L) windowspecdefinition(bag_key#9, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), unboundedfollowing$())) "
    "AS canonical_id#15L], [bag_key#9]"
)
NO_SPEC = (
    "+- Window [count(1) windowspecdefinition(specifiedwindowframe(RowFrame, "
    "unboundedpreceding$(), unboundedfollowing$())) AS n#35L]"
)
PART_AND_ORDER = (
    "+- Window [row_number() windowspecdefinition(event_type#5, ts#2 ASC NULLS FIRST, "
    "specifiedwindowframe(RowFrame, unboundedpreceding$(), currentrow$())) AS r#9], "
    "[event_type#5], [ts#2 ASC NULLS FIRST]"
)


def test_window_spec_parsing():
    assert _window_unpartitioned(ORDER_ONLY)
    assert _window_unpartitioned(NO_SPEC)
    assert not _window_unpartitioned(PARTITION_ONLY)
    assert not _window_unpartitioned(PART_AND_ORDER)


def test_audit_plan_flags_global_window_over_fact(spark):
    from dnstap2clickhouse_spark.sources.tables import load_table

    load_table(spark, SF, "documents").createOrReplaceTempView("documents")
    bad = spark.sql(
        "SELECT doc_id, row_number() OVER (ORDER BY n_chars, doc_id) AS r FROM documents"
    )
    plan = bad._jdf.queryExecution().executedPlan().toString()
    assert "global-window" in audit_plan(plan)
    # a rank<=k over the same order rewrites to WindowGroupLimit: bounded
    topk = spark.sql(
        "SELECT * FROM (SELECT doc_id, row_number() OVER "
        "(ORDER BY n_chars, doc_id) AS r FROM documents) WHERE r <= 5"
    )
    plan_k = topk._jdf.queryExecution().executedPlan().toString()
    assert "global-window" not in audit_plan(plan_k)


def _rows(df):
    return sorted(map(tuple, df.collect()))


def test_equidepth_prefix_sum_equals_sql(spark):
    got = _rows(ev.equidepth_histogram(spark, SF))
    ev.load_table(spark, SF, "events").createOrReplaceTempView("events")
    ref = _rows(spark.sql(ev._equidepth_histogram_sql("spark")))
    assert got == ref and len(got) > 0


def test_length_outliers_prefix_sum_equals_sql(spark):
    got = _rows(ftext.length_outliers(spark, SF))
    ftext.load_table(spark, SF, "documents").createOrReplaceTempView("documents")
    ref = _rows(spark.sql(ftext._length_outliers_sql("spark")))
    assert got == ref and len(got) > 0


def test_vocab_growth_prefix_sum_equals_sql(spark):
    got = _rows(ftext.vocab_growth(spark, SF))
    ftext.load_table(spark, SF, "documents").createOrReplaceTempView("documents")
    ref = _rows(spark.sql(ftext._vocab_growth_sql("spark")))
    assert got == ref and len(got) > 0


def test_fixed_entries_audit_clean(spark):
    for df in (
        ev.equidepth_histogram(spark, SF),
        ftext.length_outliers(spark, SF),
        ftext.vocab_growth(spark, SF),
    ):
        plan = df._jdf.queryExecution().executedPlan().toString()
        assert "global-window" not in audit_plan(plan)


def test_vocab_growth_anchor_present_exactly_once():
    assert ftext._vocab_growth_sql("spark").count(ftext._VG_TK_ANCHOR) == 1
    assert ftext._vocab_growth_sql("spark").startswith("\nWITH ordered AS (")


def test_length_outliers_empty_corpus_matches_reference(spark):
    import unittest.mock as mock

    empty = spark.createDataFrame(
        [], "doc_id BIGINT, text STRING, lang STRING, source STRING, n_chars BIGINT"
    )
    empty.createOrReplaceTempView("documents")
    with mock.patch.object(ftext, "load_table", lambda s, d, n: s.table("documents")):
        assert ftext.length_outliers(spark, SF).collect() == []
