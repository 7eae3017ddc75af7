"""Regression pins for the round-5 verdict/ADVICE fixes landed in round 6.

- hot-shingle cap (verdict item 4): ``ngram_jaccard_pairs`` gains a
  ``max_shingle_freq`` deployment knob — capped at a frequency above
  every real document frequency it must EQUAL the exact verifier, capped
  at 1 it must return zero pairs (any shared shingle has df >= 2), and
  the capped form must agree across dialects.
- two-level duplicate-seed completeness (r5 ADVICE): with engineered
  EXACT-DUPLICATE embeddings among the coarse seeds (the tie-break
  drains a duplicated seed into the lower id's cell, emptying its own),
  every vector must still emit exactly one assignment row — the probed
  coarse seeds are UNIONed into the candidate set — and both dialects
  must agree bit-for-bit.
- materialize_scan (r5 ADVICE on the CDC fixed path + verdict item 7):
  a scan returned by a previous call must remain readable after a later
  call writes (unique per-run subpaths), and old runs must be pruned to
  the ``keep`` newest.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.functions import dedup as fdedup
from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.sources.tables import materialize_scan

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- hot-shingle cap

def _pairs(df):
    return sorted((r.doc_a, r.doc_b, round(r.jaccard, 12)) for r in df.collect())


def test_jaccard_cap_above_max_freq_equals_exact(spark):
    exact = _pairs(fdedup.ngram_jaccard_pairs(spark, SF))
    capped = _pairs(fdedup.ngram_jaccard_pairs(spark, SF, max_shingle_freq=10**9))
    assert capped == exact
    assert exact  # non-degenerate: the corpus has near-dup pairs


def test_jaccard_cap_one_drops_every_pair(spark):
    # a pair needs a COMMON shingle, and a common shingle has df >= 2 —
    # so the tightest cap removes the entire join mass (the skew-guard
    # limit case)
    capped = fdedup.ngram_jaccard_pairs(spark, SF, max_shingle_freq=1)
    assert capped.count() == 0


def test_jaccard_cap_dialects_agree(spark):
    f = 3  # mid cap: drops real boilerplate shingles, keeps some pairs
    got = _pairs(spark.sql(fdedup._jaccard_sql("spark", f)))
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM read_parquet('{SF}/documents.parquet')"
    )
    oracle = sorted(
        (a, b, round(j, 12))
        for a, b, j in con.execute(fdedup._jaccard_sql("duckdb", f)).fetchall()
    )
    assert got == oracle


def test_jaccard_default_sql_has_no_cap_cte(spark):
    # the contract entry stays the byte-stable exact verifier
    sql = fdedup._jaccard_sql("spark")
    assert "freq" not in sql and "s_all" not in sql


# ----------------------------- two-level duplicate-seed completeness

def _dup_seed_embeddings(n: int, dims: int) -> list[tuple[int, list[float]]]:
    """Deterministic corpus where coarse seeds 0, 2 and 3 are EXACT
    duplicates (seed 1 distinct): the fine/coarse assignment drains
    seeds 2 and 3 into cell 0, leaving cells 2 and 3 with zero fine
    seeds — the r5 ADVICE edge."""
    rows = []
    for i in range(n):
        base = 0 if i in (2, 3) else i  # exact duplicates of vec 0
        vec = [((base * 7 + d * 13) % 23) / 23.0 for d in range(dims)]
        rows.append((i, vec))
    return rows


def test_twolevel_duplicate_seeds_every_vector_assigned(spark, monkeypatch):
    # shrink the coarse occupancy so the 16-vector corpus derives k1=4
    # (= genuine pruning at nprobe=2) without a 24k-row fixture
    monkeypatch.setattr(fsim, "KMEANS_COARSE_OCCUPANCY", 4)
    n, dims = 16, fsim.KMEANS_DIMS
    rows = _dup_seed_embeddings(n, dims)
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).createOrReplaceTempView("embeddings")
    got = {
        r.vec_id: r.cluster
        for r in spark.sql(fsim._twolevel_assign_sql("spark")).collect()
    }
    # completeness: one row per vector, no silent drops from empty cells
    assert sorted(got) == list(range(n))
    assert set(got.values()) <= set(range(4))  # valid fine-seed ids

    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    oracle = dict(con.execute(fsim._twolevel_assign_sql("duckdb")).fetchall())
    assert got == oracle


def test_twolevel_contract_corpus_unchanged_by_fallback(spark):
    """On the real corpus (no duplicate seeds) the candidate-union is a
    pure no-op: the result still equals the flat nearest-seed argmin
    under exhaustive probes (k1=2 <= nprobe at this scale)."""
    import numpy as np

    from dnstap2clickhouse_spark.sources.tables import load_table

    rows = fsim.kmeans_assign_twolevel(spark, SF).collect()
    emb = {
        r.vec_id: np.round(np.array(r.embedding, dtype=np.float64) * 1e9)
        for r in load_table(spark, SF, "embeddings").collect()
    }
    k = fsim.kmeans_k(len(emb))
    seeds = {s: emb[s] for s in range(k)}
    for r in rows:
        ds = {s: float(np.sum((emb[r.vec_id] - sv) ** 2)) for s, sv in seeds.items()}
        md = min(ds.values())
        assert r.cluster == min(s for s, d in ds.items() if d == md)


# --------------------------------------------------- materialize_scan

def test_materialize_scan_prior_scan_survives_and_prunes(spark, tmp_path):
    name = "round6_test"
    base = spark.conf.get("spark.sql.warehouse.dir", "spark-warehouse").rstrip("/")
    local = base
    for pfx in ("file://", "file:"):
        if local.startswith(pfx):
            local = local[len(pfx):]
            break
    root = os.path.join(local, "materialized", name)

    first = materialize_scan(spark, spark.range(5).selectExpr("id AS a"), name)
    second = materialize_scan(spark, spark.range(7).selectExpr("id AS a"), name)
    # the r5 ADVICE failure mode: the second write must NOT invalidate
    # the still-held first scan
    assert first.count() == 5
    assert second.count() == 7
    assert len(os.listdir(root)) == 2  # unique per-run subpaths
    materialize_scan(spark, spark.range(3).selectExpr("id AS a"), name)
    assert len(os.listdir(root)) == 2  # pruned to keep=2 (newest kept)
    assert second.count() == 7  # immediately-previous run still readable


def test_materialize_scan_preserves_schema(spark):
    df = spark.range(3).selectExpr(
        "CAST(id AS INT) AS i",
        "CAST(id AS DECIMAL(18,4)) AS d",
        "CAST(id AS DOUBLE) AS f",
        "CAST(id AS STRING) AS s",
    )
    out = materialize_scan(spark, df, "round6_schema")
    # names + dataTypes must round-trip exactly (nullability may widen —
    # parquet scans are nullable — which the oracle compare ignores)
    assert [(f.name, f.dataType) for f in out.schema] == [
        (f.name, f.dataType) for f in df.schema
    ]
