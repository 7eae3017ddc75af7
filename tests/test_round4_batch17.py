"""Round-4 batch-17 operators: cosine radius search, Feistel epoch
shuffle, windowed funnel. These pin the operators' meaning: the radius
pair set + LSH hit flags replayed in Python from raw vectors, the
permutation laws (positions exactly 1..N per epoch, epochs distinct,
Feistel replay, bijection certificate), and the windowed funnel's
relationship to the unbounded funnel (monotone, agreeing on the
unbounded arm, window strictly binding on this corpus).
"""

from __future__ import annotations

import math

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.functions.splits import LEHMER_A, LEHMER_P
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------- range search


def test_range_search_python_replay(spark):
    rows = load_table(spark, SF, "embeddings").select("vec_id", "embedding").collect()
    vecs = {r.vec_id: r.embedding for r in rows}

    def cos(a, b):
        dot = sum(float(x) * float(y) for x, y in zip(a, b))
        na = sum(float(x) * float(x) for x in a)
        nb = sum(float(y) * float(y) for y in b)
        return dot / math.sqrt(na * nb)

    def buckets(v):
        return fsim.lsh_buckets(v, len(vecs))

    expect = {}
    for q in range(fsim.N_QUERIES):
        bq = buckets(vecs[q])
        for cid, cv in vecs.items():
            if cid == q:
                continue
            c = cos(vecs[q], cv)
            if c >= fsim.RANGE_TAU:
                hit = any(bq[t] == buckets(cv)[t] for t in range(fsim.LSH_TABLES))
                expect[(q, cid)] = hit

    out = fsim.range_search(spark, SF).collect()
    assert {(r.query_id, r.neighbor_id): r.lsh_found for r in out} == expect
    assert len(out) > 0
    # one-sided miss profile: every emitted pair IS above the radius
    for r in out:
        assert r.cosine >= fsim.RANGE_TAU


# ------------------------------------------------- epoch shuffle


def test_epoch_shuffle_permutation_laws(spark):
    out = fsplit.epoch_shuffle(spark, SF).collect()
    n_docs = load_table(spark, SF, "documents").count()
    by_epoch: dict = {}
    for r in out:
        assert r.bijective
        by_epoch.setdefault(r.epoch, []).append(r)
    assert set(by_epoch) == set(range(1, fsplit.EPOCHS + 1))
    orders = {}
    for ep, rows in by_epoch.items():
        assert sorted(r.pos for r in rows) == list(range(1, n_docs + 1))
        assert len({r.doc_id for r in rows}) == n_docs
        orders[ep] = [r.doc_id for r in sorted(rows, key=lambda r: r.pos)]
    # epochs are genuinely different shuffles (and not the identity)
    assert orders[1] != orders[2]
    assert orders[1] != sorted(orders[1])


def test_epoch_shuffle_feistel_replay(spark):
    """perm_val recomputed with a Python Feistel over the doc's rank."""
    docs = sorted(
        r.doc_id for r in load_table(spark, SF, "documents").select("doc_id").collect()
    )
    rank = {d: i for i, d in enumerate(docs)}  # 0-based corpus rank

    def perm(idx, epoch):
        H = fsplit.EPOCH_HALF
        l, r = idx // H, idx % H
        for rnd in range(fsplit.EPOCH_ROUNDS):
            c = (epoch * 7919 + rnd * 104729 + 12345) % LEHMER_P
            f = ((r * LEHMER_A + c) % LEHMER_P) % H
            l, r = r, (l + f) % H
        return l * H + r

    out = fsplit.epoch_shuffle(spark, SF).collect()
    for row in out:
        assert row.perm_val == perm(rank[row.doc_id], row.epoch), (row.doc_id, row.epoch)


# ------------------------------------------------ windowed funnel


def test_window_funnel_vs_unbounded(spark):
    win = {r.step: (r.n_windowed, r.n_unbounded) for r in evan.window_funnel(spark, SF).collect()}
    unb = {r.step: r.n_users for r in evan.funnel_conversion(spark, SF).collect()}
    assert set(win) == set(evan.FUNNEL_STEPS)
    for step in evan.FUNNEL_STEPS:
        assert win[step][1] == unb[step]  # unbounded arm == the classic funnel
        assert win[step][0] <= win[step][1]  # the window can only exclude
    # funnel monotonicity within the windowed arm
    w = [win[s][0] for s in evan.FUNNEL_STEPS]
    assert w[0] >= w[1] >= w[2]
    # the window genuinely binds on this corpus (else the entry is a no-op)
    assert any(win[s][0] < win[s][1] for s in evan.FUNNEL_STEPS)
