"""The aggregate-argmin restructure of the Lloyd / IVF assignment
(`similarity._argmin_over`): the Spark dialect computes every
nearest-centroid argmin as a ``min_by(cand, struct(d, cand))`` HASH
AGGREGATE (map-side partial combine — the n·k scored rows are never
sort-shuffled), while DuckDB keeps the historical min-over-window +
exact-equality-filter form byte-for-byte (oracle stability). Same for
`_ivf_cell_ctes`'s ``assign`` (``max_by`` over the cell affinities).

Certified here:

- string shape: the Spark flat k-means carries no window at all, the
  DuckDB strings carry no ``min_by``/``max_by`` (the historical form);
- executed-plan shape: ``_kmeans_sql('spark')`` runs ZERO Window
  operators, and ``sim_ivf_topk``'s plan keeps at most two (the
  query-side probe ranking — whose corpus scan must carry the pushed
  ``vec_id < N_QUERIES`` filter — and the final top-k);
- tie-break equivalence: on an engineered corpus whose k seed
  embeddings are ALL exact duplicates (every distance ties on every
  vector), the aggregate form still picks the window form's answer —
  Spark (min_by) == DuckDB (window) bit-for-bit.
"""

from __future__ import annotations

import os
import re
import sys

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from dnstap2clickhouse_spark.functions import similarity as fsim

SF = "/root/testdata/sf0.001"


def test_spark_argmin_is_aggregate_duckdb_is_window():
    for build in (
        lambda d: fsim._kmeans_sql(d),
        lambda d: fsim._kmeans_sql(d, "twolevel"),
        lambda d: fsim._twolevel_assign_sql(d),
        lambda d: fsim._ood_centroid_sql(d),
    ):
        s, k = build("spark"), build("duckdb")
        assert "min_by" in s and "FILTER (WHERE d = md)" not in s
        assert "min_by" not in k and "FILTER (WHERE d = md)" in k
    frag_s = fsim._ivf_cell_ctes("spark")
    frag_d = fsim._ivf_cell_ctes("duckdb")
    assert "max_by(label, struct(ccos, -label))" in frag_s
    assert "max_by" not in frag_d and "WHERE rn = 1" in frag_d


def _windows(plan: str) -> int:
    return len(re.findall(r"\bWindow \[", plan))


def test_flat_kmeans_plan_runs_zero_windows(spark):
    fsim._register(spark, SF)
    df = spark.sql(fsim._kmeans_sql("spark"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert _windows(plan) == 0
    # the argmin survives optimization as an aggregate, not a sort
    assert "min_by" in plan


def test_ivf_plan_windows_bounded_and_probe_scan_pruned(spark):
    fsim._register(spark, SF)
    df = spark.sql(fsim._ivf_sql("spark"))
    plan = df._jdf.queryExecution().executedPlan().toString()
    # probe ranking (query rows only) + final top-k — never a third,
    # corpus-sized window (the pre-restructure plan ran it twice more)
    assert _windows(plan) <= 2
    # the probe branch's corpus scan carries the pushed query filter
    assert re.search(rf"vec_id#\d+L? < {fsim.N_QUERIES}", plan)


def test_all_ties_aggregate_matches_window_form(spark):
    # every embedding identical to vec 0 among the first k=4 seeds →
    # all k distances tie exactly on every vector → the tie-break (min
    # cluster id) decides EVERY assignment; non-seed vectors are spread
    # so the update step still produces distinct centroids
    n, dims = 24, fsim.KMEANS_DIMS
    rows = []
    for i in range(n):
        base = 0 if i < 4 else i
        vec = [((base * 7 + d * 13) % 23) / 23.0 for d in range(dims)]
        rows.append((i, vec))
    spark.createDataFrame(
        rows, "vec_id BIGINT, embedding ARRAY<DOUBLE>"
    ).createOrReplaceTempView("embeddings")
    got = {
        r.vec_id: r.cluster for r in spark.sql(fsim._kmeans_sql("spark")).collect()
    }
    assert sorted(got) == list(range(n))
    con = duckdb.connect()
    con.execute("CREATE TABLE embeddings (vec_id BIGINT, embedding DOUBLE[])")
    con.executemany("INSERT INTO embeddings VALUES (?, ?)", rows)
    oracle = dict(con.execute(fsim._kmeans_sql("duckdb")).fetchall())
    assert got == oracle
    # the tie actually bound: the first Lloyd round's seed distances all
    # tie, so every first-round assignment collapsed to cluster 0 — the
    # final result must still be a pure function of the shared tie-break
    assert 0 in set(got.values())
