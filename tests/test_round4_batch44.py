"""Round-4 batch-44 operators: uncertainty sampling, butterfly census,
temperature mixture. Pins: Python replays of the margin selection, the
per-pair C(w,2) census, and the sqrt-flattened shares; the
uncertainty-sample law (selected margins are a prefix of the global
margin order, both keep-sides represented when available); and the
temperature law (upsample factor decreases as source size grows).
"""

from __future__ import annotations

from collections import defaultdict

from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.functions import text as ftext
from dnstap2clickhouse_spark.plans import curation as pcur
from dnstap2clickhouse_spark.plans import graph as pgraph
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ uncertainty sampling


def test_uncertainty_sample_is_margin_prefix(spark):
    logits = {r.doc_id: r.logit_e6
              for r in ftext.quality_logit(spark, SF).collect()}
    margins = sorted((abs(v - ftext.LOGIT_KEEP_E6), d)
                     for d, v in logits.items())
    expect = [(i + 1, d, logits[d], m)
              for i, (m, d) in enumerate(margins[: fsplit.UNCERTAIN_K])]
    got = [(r.rank, r.doc_id, r.logit_e6, r.margin_e6)
           for r in fsplit.uncertainty_sample(spark, SF).collect()]
    assert got == expect
    # keep flag rides through consistently
    for r in fsplit.uncertainty_sample(spark, SF).collect():
        assert r.keep == (r.logit_e6 >= ftext.LOGIT_KEEP_E6)


# ------------------------------------------------ butterfly census


def test_butterfly_python_replay(spark):
    lines = load_table(spark, SF, "lineitem").selectExpr(
        "l_orderkey", "l_partkey", "l_quantity").collect()
    by_order: dict = defaultdict(set)
    for r in lines:
        if r.l_quantity >= pgraph.TRIANGLE_MIN_QTY:
            by_order[r.l_orderkey].add(r.l_partkey)
    pair_w: dict = defaultdict(set)
    for o, parts in by_order.items():
        ps = sorted(parts)
        for i, a in enumerate(ps):
            for b in ps[i + 1:]:
                pair_w[(a, b)].add(o)
    bf = {p: len(os_) * (len(os_) - 1) // 2 for p, os_ in pair_w.items()}
    total = sum(bf.values())
    expect = sorted(((v, p) for p, v in bf.items() if v > 0),
                    key=lambda t: (-t[0], t[1]))[: pgraph.BUTTERFLY_TOP]
    out = pgraph.butterfly_count(spark, SF).collect()
    got = [(r.butterflies, (r.a, r.b)) for r in out]
    assert got == expect
    assert all(r.total_butterflies == total for r in out)
    for r in out:
        assert r.butterflies == r.n_shared_orders * (r.n_shared_orders - 1) // 2


# ------------------------------------------------ temperature mixture


def test_mixture_temperature_replay_and_flattening(spark):
    import math

    docs = load_table(spark, SF, "documents").select("source").collect()
    counts: dict = defaultdict(int)
    for r in docs:
        counts[r.source] += 1
    tot_n = sum(counts.values())
    tot_w = sum(math.isqrt(n) for n in counts.values())
    out = pcur.mixture_temperature(spark, SF).collect()
    ups = {}
    for r in out:
        n, w = counts[r.source], math.isqrt(counts[r.source])
        assert (r.n_docs, r.weight) == (n, w)
        assert r.prop_share_e6 == n * 1_000_000 // tot_n
        assert r.temp_share_e6 == w * 1_000_000 // tot_w
        assert r.upsample_e6 == r.temp_share_e6 * 1_000_000 // r.prop_share_e6
        ups[r.source] = (n, r.upsample_e6)
    # the law: a strictly smaller source never gets a smaller upsample
    pairs = sorted(ups.values())
    for (n1, u1), (n2, u2) in zip(pairs, pairs[1:]):
        if n1 < n2:
            assert u1 >= u2
