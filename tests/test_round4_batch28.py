"""Round-4 batch-28 operators: text-LSH recall, clustering coefficient,
and the per-source scorecard. Pins: recall consistency with the
standalone pair entries, the transitivity identity against a Python
triangle/wedge recount, and the scorecard's reconciliation with the
yield funnel and v2 output.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from dnstap2clickhouse_spark.functions import dedup as fdedup
from dnstap2clickhouse_spark.plans import curation as pcur
from dnstap2clickhouse_spark.plans import graph as pgraph
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ minhash recall


def test_minhash_recall_consistent_with_pair_entries(spark):
    [row] = fdedup.minhash_recall(spark, SF).collect()
    exact = {(r.doc_a, r.doc_b)
             for r in fdedup.ngram_jaccard_pairs(spark, SF).collect()}
    verified = {(r.doc_a, r.doc_b)
                for r in fdedup.lsh_verified_pairs(spark, SF).collect()}
    assert row.n_true == len(exact)
    assert row.n_found == len(exact & verified)
    assert row.n_false_pos == len(verified - exact)
    assert row.n_false_pos == 0  # precision 1.0, structurally
    assert row.pair_recall == row.n_found / row.n_true
    # the fixed hash family holds banding recall high on this corpus
    assert row.pair_recall >= 0.9


# ------------------------------------------------ clustering coefficient


def test_clustering_python_replay(spark):
    from dnstap2clickhouse_spark.sources.tables import register_views

    register_views(spark, SF, ("lineitem",))
    edges = {
        (r.a, r.b)
        for r in spark.sql(f"SELECT * FROM ({pgraph._copurchase_cte()})").collect()
    }
    adj: dict = defaultdict(set)
    deg: Counter = Counter()
    for a, b in edges:
        adj[a].add(b)
        adj[b].add(a)
        deg[a] += 1
        deg[b] += 1
    triangles = sum(
        1 for a, b in edges for c in adj[a] & adj[b] if c > b
    )
    wedges = sum(d * (d - 1) // 2 for d in deg.values())

    [row] = pgraph.clustering_coefficient(spark, SF).collect()
    assert row.n_triangles == triangles
    assert row.n_wedges_total == wedges
    assert row.transitivity_e6 == 3 * triangles * 1_000_000 // wedges
    assert 0 < row.transitivity_e6 < 1_000_000


def test_clustering_matches_triangle_census(spark):
    """The spliced count must equal the standalone census entry."""
    [tri] = pgraph.triangle_count(spark, SF).collect()
    [cl] = pgraph.clustering_coefficient(spark, SF).collect()
    assert cl.n_triangles == tri.n_triangles


# ------------------------------------------------ source scorecard


def test_scorecard_reconciles_with_funnel_and_v2(spark):
    rows = pcur.source_scorecard(spark, SF).collect()
    funnel = {r.gate: r for r in pcur.yield_report(spark, SF).collect()}
    # corpus coverage: all non-eval sources, doc counts sum to stage 0
    assert sum(r.n_docs for r in rows) == funnel["corpus"].n_out
    # total kept equals the pipeline output
    v2_n = pcur.curate_corpus_v2(spark, SF).count()
    assert sum(r.n_kept for r in rows) == v2_n
    from dnstap2clickhouse_spark.functions.text import EVAL_SOURCE

    assert EVAL_SOURCE not in {r.source for r in rows}


def test_scorecard_mean_quality_replay(spark):
    """Mean quality replays exactly: per-doc e6 quantization then
    integer mean (no float sums)."""
    from dnstap2clickhouse_spark.functions.text import (
        _quality_expr,
        _stats_exprs,
        EVAL_SOURCE,
    )

    stats = ", ".join(_stats_exprs("spark"))
    load_table(spark, SF, "documents").createOrReplaceTempView("documents")
    q = spark.sql(f"""
        SELECT d.source, {_quality_expr()} AS quality
        FROM (SELECT {stats} FROM documents WHERE source <> '{EVAL_SOURCE}') s
        JOIN documents d ON d.doc_id = s.doc_id""").collect()
    per_source: dict = defaultdict(list)
    for r in q:
        per_source[r.source].append(
            int(Decimal(r.quality * 1_000_000).quantize(0, ROUND_HALF_UP))
        )
    out = {r.source: r for r in pcur.source_scorecard(spark, SF).collect()}
    for s, qs in per_source.items():
        assert out[s].mean_q_e6 == sum(qs) // len(qs)
