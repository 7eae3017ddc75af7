"""The ``assignment='flat'|'twolevel'`` parameter on ``_kmeans_sql``
(r5 verdict item 3): the 8 production cell-pruned entries pin 'flat'
for oracle stability; 'twolevel' routes BOTH Lloyd assignment steps
through the IVF coarse quantizer (n·(k1 + nprobe·k/k1) folds, never the
flat n·k cross join).

Certified here:

- the default is byte-stable: ``_kmeans_sql(d)`` == ``_kmeans_sql(d,
  'flat')`` and contains no twolevel machinery (the contract entries'
  SQL is unchanged);
- exhaustive equivalence: when nprobe >= the occupied-cell count (true
  at every oracle scale: k1=2) the twolevel result is BIT-IDENTICAL to
  flat in BOTH dialects — the pruning adds no arithmetic drift;
- pruned regime (coarse occupancy shrunk so k1 > nprobe): every vector
  still emits exactly one row (completeness is structural — only
  OCCUPIED cells are probed), both dialects agree bit-for-bit, and
  agreement with flat stays far above the random-probe floor;
- plan shape: no corpus-sized cartesian product, no Python UDFs.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.functions import similarity as fsim

SF = "/root/testdata/sf0.001"


def _spark_assign(spark, assignment):
    fsim._register(spark, SF)
    return {
        r.vec_id: r.cluster
        for r in spark.sql(fsim._kmeans_sql("spark", assignment)).collect()
    }


def _duck_assign(assignment):
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    return dict(con.execute(fsim._kmeans_sql("duckdb", assignment)).fetchall())


def test_flat_default_is_byte_stable():
    for d in ("spark", "duckdb"):
        assert fsim._kmeans_sql(d) == fsim._kmeans_sql(d, "flat")
        assert "k1" not in fsim._kmeans_sql(d)
        assert "cz" not in fsim._kmeans_sql(d)
    with pytest.raises(ValueError):
        fsim._kmeans_sql("spark", "ivf")


def test_twolevel_exhaustive_equals_flat_both_dialects(spark):
    # oracle scale: k1 = max(2, ceil(500/8000)) = 2 occupied cells,
    # nprobe=2 -> every cell probed -> candidate set == all centroids
    flat = _spark_assign(spark, "flat")
    two = _spark_assign(spark, "twolevel")
    assert two == flat
    assert _duck_assign("twolevel") == two


def test_twolevel_pruned_regime_complete_and_dialect_exact(spark, monkeypatch):
    # shrink the coarse occupancy so sf0.001 (500 vectors) derives
    # k1 = ceil(500/150) = 4 > nprobe = 2: genuine pruning
    monkeypatch.setattr(fsim, "KMEANS_COARSE_OCCUPANCY", 150)
    flat = _spark_assign(spark, "flat")
    two = _spark_assign(spark, "twolevel")
    # completeness: one row per vector even though only 2/4 cells probed
    assert sorted(two) == sorted(flat)
    assert set(two.values()) <= set(range(fsim.kmeans_k(len(flat))))
    # both dialects run the SAME pruned plan -> bit-identical output
    assert _duck_assign("twolevel") == two
    # quality: agreement far above the 2/4 random-probe floor on
    # isotropic vectors (the coarse quantizer's worst case)
    agree = sum(1 for v in two if two[v] == flat[v]) / len(two)
    assert agree > 0.6, f"agreement {agree:.3f}"


def test_assignment_plumbed_through_cell_pruned_consumers(spark):
    """The a2-reusing production entries (SemDeDup, kNN graph, hard
    negatives) accept ``assignment`` and pass it to ``_kmeans_sql``:
    default SQL byte-stable; 'twolevel' output equals 'flat' at the
    exhaustive oracle scale (the clustering stage is bit-identical
    there, and the downstream stages key only on the cluster id)."""
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{SF}/embeddings.parquet')"
    )
    for fn_name in ("_semantic_dedup_sql", "_knn_graph_sql", "_hard_negatives_sql"):
        fn = getattr(fsim, fn_name)
        for d in ("spark", "duckdb"):
            assert fn(d) == fn(d, "flat"), fn_name
        assert con.execute(fn("duckdb", "twolevel")).fetchall() == con.execute(
            fn("duckdb")
        ).fetchall(), fn_name
    # the spark side of one consumer, end to end
    flat = fsim.semantic_dedup(spark, SF).collect()
    two = fsim.semantic_dedup(spark, SF, assignment="twolevel").collect()
    assert flat == two


def test_twolevel_plan_shape(spark):
    fsim._register(spark, SF)
    df = spark.sql(fsim._kmeans_sql("spark", "twolevel"))
    phys = df._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in phys
    assert "BatchEvalPython" not in phys


def test_twolevel_audits_clean_in_100tb_regime(spark):
    """Run the repo's own plan-hazard detector (tools/audit_plans.py)
    over the twolevel plan with auto-broadcast disabled — the audit's
    100 TB regime — since the non-contract path is invisible to the
    per-round contract audit. The bounded sides (kk scalar-subquery
    aggregates, DISTINCT cell lists) must keep every remaining
    broadcast/nested-loop legitimate."""
    sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))
    from audit_plans import audit_plan

    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold", "10485760")
    try:
        old_aqe = spark.conf.get("spark.sql.adaptive.autoBroadcastJoinThreshold")
    except Exception:
        old_aqe = None  # unset: falls back to the non-AQE threshold
    try:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
        spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")
        fsim._register(spark, SF)
        for fn, kw in (
            (lambda: spark.sql(fsim._kmeans_sql("spark", "twolevel")), "kmeans"),
            (lambda: fsim.semantic_dedup(spark, SF, assignment="twolevel"), "semdedup"),
        ):
            plan = fn()._jdf.queryExecution().executedPlan().toString()
            assert audit_plan(plan) == [], kw
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)
        if old_aqe is not None:
            spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", old_aqe)
        else:
            spark.conf.unset("spark.sql.adaptive.autoBroadcastJoinThreshold")
