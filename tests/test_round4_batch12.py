"""Round-4 batch-12 operators: theta-sketch set algebra, Matryoshka
two-stage retrieval, bucketed co-located join. The oracle gate proves
value-exactness vs DuckDB; these tests pin the operators' meaning — the
sketch algebra really landing inside its bounds (and exactly, in Theta's
exact mode), a full Python replay of the two-stage MRL pipeline, and the
bucketed entry's self-cleaning idempotence.
"""

from __future__ import annotations

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.plans import bucketed as pbkt
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# --------------------------------------------------- theta set algebra


def test_theta_bounds_and_inclusion_exclusion(spark):
    out = evan.theta_sets(spark, SF).collect()
    types = (
        load_table(spark, SF, "events")
        .selectExpr("event_type", "user_id")
        .distinct()
        .groupBy("event_type")
        .count()
        .collect()
    )
    n = {r.event_type: r["count"] for r in types}
    assert len(out) == len(n) * (len(n) - 1) // 2, "missing type pairs"
    for r in out:
        assert r.union_ok and r.inter_ok and r.diff_ok
        # inclusion-exclusion consistency against independent counts
        assert r.n_union + r.n_inter == n[r.type_a] + n[r.type_b]
        assert r.n_diff == n[r.type_a] - r.n_inter


def test_theta_exact_mode_union_is_exact(spark):
    """Below k=4096 distincts a Theta sketch is in exact mode: the
    union over ALL per-type sketches must equal the true global
    distinct-user count exactly, not just within tolerance."""
    load_table(spark, SF, "events").createOrReplaceTempView("events")
    row = spark.sql(
        """
        SELECT theta_sketch_estimate(theta_union_agg(sk)) AS est,
               (SELECT count(DISTINCT user_id) FROM events) AS exact
        FROM (SELECT theta_sketch_agg(user_id) AS sk
              FROM events GROUP BY event_type)
        """
    ).collect()[0]
    assert row.est == row.exact


# ----------------------------------------------- Matryoshka retrieval


def test_matryoshka_python_replay(spark):
    """Full replay of the two-stage pipeline with the same fold order
    (sequential left-to-right, like Spark's aggregate()): coarse
    prefix-cosine top-C candidates, full-dim rerank, top-k — ranks and
    neighbor sets must match exactly."""
    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: [float(x) for x in r.embedding] for r in rows}

    def dot(a, b):
        acc = 0.0
        for x, y in zip(a, b):
            acc += x * y
        return acc

    expect = {}
    qids = [v for v in sorted(vecs) if v < fsim.N_QUERIES]
    for q in qids:
        qp = vecs[q][: fsim.MRL_PREFIX]
        qn, qpn = dot(vecs[q], vecs[q]), dot(qp, qp)
        coarse = sorted(
            (
                (-dot(qp, vecs[c][: fsim.MRL_PREFIX])
                 / (dot(vecs[c][: fsim.MRL_PREFIX], vecs[c][: fsim.MRL_PREFIX]) * qpn) ** 0.5,
                 c)
                for c in vecs
                if c != q
            ),
        )[: fsim.MRL_CANDIDATES]
        rer = sorted(
            (-dot(vecs[q], vecs[c]) / (qn * dot(vecs[c], vecs[c])) ** 0.5, c)
            for _, c in coarse
        )[: fsim.TOP_K]
        for rank, (_, c) in enumerate(rer, 1):
            expect[(q, rank)] = c
    got = {
        (r.query_id, r.rank): r.neighbor_id
        for r in fsim.matryoshka_topk(spark, SF).collect()
    }
    assert got == expect


def test_matryoshka_cost_shape(spark):
    """Output is exactly TOP_K per query and every neighbor comes from
    the candidate pool (never the raw corpus directly)."""
    out = fsim.matryoshka_topk(spark, SF).collect()
    per_q = {}
    for r in out:
        per_q.setdefault(r.query_id, []).append(r.rank)
    assert set(per_q) == set(range(fsim.N_QUERIES))
    for ranks in per_q.values():
        assert sorted(ranks) == list(range(1, fsim.TOP_K + 1))


# ------------------------------------------------------ bucketed join


def test_bucketed_join_self_cleaning_and_idempotent(spark):
    """The contract entry drops its catalog tables and temp files and
    can run twice with identical results."""
    a = {tuple(r) for r in pbkt.bucketed_join(spark, SF).collect()}
    assert not spark.catalog.tableExists("orders_bkt_entry")
    assert not spark.catalog.tableExists("lineitem_bkt_entry")
    b = {tuple(r) for r in pbkt.bucketed_join(spark, SF).collect()}
    assert a == b and a
