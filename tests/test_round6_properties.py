"""Property tests for the round-6 semantics, DuckDB-backed so hypothesis
can afford many examples (no JVM in the loop; the Spark side of each
form is separately pinned equal to DuckDB in the round-6 fixture tests).

- cap-equivalence: for ANY corpus, `_jaccard_sql(max_shingle_freq=F)`
  equals the exact verifier whenever F >= the corpus's max shingle
  document frequency — the cap only ever REMOVES hot shingles, never
  perturbs surviving arithmetic.
- cap-monotone-safety: with any F, every returned pair's jaccard is
  still >= the threshold (the capped score is a true Jaccard over the
  capped sets, not a scaled heuristic).
- twolevel-exhaustive: for ANY embedding corpus whose derived k1 <=
  nprobe, the two-level assignment is bit-identical to flat — the
  pruning machinery adds no arithmetic drift, independent of data.
"""

from __future__ import annotations

import os
import sys

import duckdb
from hypothesis import given, settings, strategies as st

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.functions import dedup as fdedup
from dnstap2clickhouse_spark.functions import similarity as fsim


def _docs_con(docs: list[str]) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    con.execute("CREATE TABLE documents (doc_id BIGINT, text VARCHAR)")
    con.executemany(
        "INSERT INTO documents VALUES (?, ?)", list(enumerate(docs))
    )
    return con


# small word alphabet → heavy shingle collisions → the interesting regime
_words = st.sampled_from([f"w{i}" for i in range(8)])
_doc = st.lists(_words, min_size=3, max_size=12).map(" ".join)


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=12))
def test_cap_above_max_df_equals_exact(docs):
    con = _docs_con(docs)
    exact = con.execute(fdedup._jaccard_sql("duckdb")).fetchall()
    capped = con.execute(fdedup._jaccard_sql("duckdb", 10**9)).fetchall()
    assert capped == exact


@settings(max_examples=40, deadline=None)
@given(st.lists(_doc, min_size=2, max_size=12), st.integers(min_value=1, max_value=6))
def test_capped_scores_respect_threshold(docs, cap):
    con = _docs_con(docs)
    for _, _, j in con.execute(fdedup._jaccard_sql("duckdb", cap)).fetchall():
        assert j >= fdedup.JACCARD_THRESHOLD


_dim = st.integers(min_value=-4, max_value=4).map(lambda v: v / 4.0)


@settings(max_examples=15, deadline=None)
@given(
    st.lists(
        st.lists(_dim, min_size=fsim.KMEANS_DIMS, max_size=fsim.KMEANS_DIMS),
        min_size=5,
        max_size=24,
    )
)
def test_twolevel_exhaustive_equals_flat_any_corpus(vecs):
    # n <= 24 << COARSE_OCCUPANCY derives k1 = 2 <= nprobe: exhaustive
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany(
        "INSERT INTO embeddings VALUES (?, ?)", list(enumerate(vecs))
    )
    flat = con.execute(fsim._kmeans_sql("duckdb", "flat")).fetchall()
    two = con.execute(fsim._kmeans_sql("duckdb", "twolevel")).fetchall()
    assert two == flat


def test_materialize_scan_empty_result(spark):
    """A CDC final state (or any materialized aggregate) can be EMPTY;
    the parquet round trip must preserve schema and return 0 rows, not
    fail on a part-file-less directory."""
    from dnstap2clickhouse_spark.sources.tables import materialize_scan

    df = spark.range(5).selectExpr("id AS a", "CAST(id AS STRING) AS s").filter("a < 0")
    out = materialize_scan(spark, df, "round6_empty")
    assert out.count() == 0
    assert [f.name for f in out.schema] == ["a", "s"]
