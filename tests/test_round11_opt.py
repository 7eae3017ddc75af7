"""Round-11 optimization regression guards.

Pins the r11 optimization-round changes:

1. ``dedup_containment_prefix``'s exact-set-grouped rewrite (group docs
   by sorted shingle array, run the prefix/positional-filter machinery
   per distinct set, expand back) is output-identical to the pre-r11
   per-doc form — checked against a literal reimplementation of the old
   plan, including ordering.
2. The new candidate join carries the PPJoin positional filter and the
   grouped form's plan groups by the sorted shingle array (no hash key
   — exact set identity).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.functions import dedup as fd

SF = "/root/testdata/sf0.001"


def _old_containment_spark_sql() -> str:
    """The pre-r11 Spark form, pinned literally (r10 ground truth): the
    per-doc prefix-filter join with the count-window ``n`` and no
    positional filter."""
    arrays = fd._shingle_arrays("spark")
    tau = fd.CONT_TAU_E6
    return f"""
WITH sh AS ({arrays}),
srows AS (SELECT doc_id, explode(sh) AS s FROM sh),
df AS (SELECT s, CAST(count(*) AS BIGINT) AS df FROM srows GROUP BY s),
ranked AS (
  SELECT r.doc_id, r.s,
         row_number() OVER (PARTITION BY r.doc_id ORDER BY d.df, r.s) AS rk,
         count(*) OVER (PARTITION BY r.doc_id) AS n
  FROM srows r JOIN df d ON r.s = d.s),
prefix AS (
  SELECT doc_id, s, n FROM ranked
  WHERE rk <= (n * {1_000_000 - tau}) div 1000000 + 1),
cand AS (
  SELECT DISTINCT p.doc_id AS doc_a, r.doc_id AS doc_b
  FROM prefix p JOIN ranked r
    ON p.s = r.s AND p.doc_id <> r.doc_id
   AND r.n * 1000000 >= p.n * {tau}),
scored AS (
  SELECT c.doc_a, c.doc_b,
         (CAST(size(array_intersect(a.sh, b.sh)) AS BIGINT) * 1000000) div size(a.sh) AS cont_e6
  FROM cand c
  JOIN sh a ON c.doc_a = a.doc_id
  JOIN sh b ON c.doc_b = b.doc_id)
SELECT doc_a, doc_b, cont_e6 FROM scored
WHERE cont_e6 >= {tau}
ORDER BY doc_a, doc_b
"""


def test_containment_grouped_rewrite_output_identical(spark):
    """The set-grouped + positional-filtered form must reproduce the
    old per-doc form exactly (values AND ordering)."""
    fd._register(spark, SF)
    new = spark.sql(fd._containment_sql("spark")).collect()
    old = spark.sql(_old_containment_spark_sql()).collect()
    assert new == old
    assert len(new) > 0  # a 0-row pair relation would be a red flag


def test_containment_plan_groups_by_exact_set_and_position_filters(spark):
    fd._register(spark, SF)
    sql = fd._containment_sql("spark")
    # exact set identity: the grouping key is the sorted shingle array
    assert "sort_array(sh)" in sql
    # the PPJoin positional filter rides the candidate join
    assert "least(p.n - p.rk, r.n - r.rk)" in sql
    plan = spark.sql(sql)._jdf.queryExecution().optimizedPlan().toString()
    # the window that assigns group representatives partitions by the
    # array key itself, never by a lossy hash of it
    assert "sort_array" in plan


def test_containment_oracle_sql_unchanged_r10_form():
    """The DuckDB referee must stay independent of the Spark rewrite:
    the oracle keeps the per-doc count-window form."""
    sql = fd._containment_sql("duckdb")
    assert "count(*) OVER (PARTITION BY r.doc_id)" in sql
    assert "sort_array" not in sql
    assert "least(" not in sql
