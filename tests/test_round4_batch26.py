"""Round-4 batch-26 operators: curation yield funnel, leakage-safe
splitting, and Markov stationary masses. Pins: the funnel's final stage
equals the v2 pipeline's cardinality and each stage count replays from
the gate entries; the safe split provably removes the measured naive
leakage; the power iteration replays exactly in integer arithmetic.
"""

from __future__ import annotations

from collections import Counter, defaultdict

from dnstap2clickhouse_spark.functions import dedup as fdedup
from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.plans import curation as pcur
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ yield report


def test_yield_funnel_consistent_with_v2(spark):
    rows = {r.gate: r for r in pcur.yield_report(spark, SF).collect()}
    assert [r.stage for r in sorted(rows.values(), key=lambda r: r.stage)] == \
        list(range(len(pcur.YIELD_STAGES)))
    # funnel telescopes: each stage's n_in is the previous n_out,
    # drops are non-negative
    ordered = sorted(rows.values(), key=lambda r: r.stage)
    for a, b in zip(ordered, ordered[1:]):
        assert b.n_in == a.n_out
        assert b.n_dropped == b.n_in - b.n_out >= 0
    # the final survivor count IS the v2 pipeline's output
    v2_n = pcur.curate_corpus_v2(spark, SF).count()
    assert ordered[-1].n_out == v2_n


def test_yield_stage_counts_replay(spark):
    """Stage drops replay from the standalone gate entries (the splice
    reuses those relations, so the counts must reconcile)."""
    from dnstap2clickhouse_spark.functions import text as ftext

    rows = {r.gate: r for r in pcur.yield_report(spark, SF).collect()}
    docs = load_table(spark, SF, "documents")
    n_corpus = docs.filter(f"source <> '{ftext.EVAL_SOURCE}'").count()
    assert rows["corpus"].n_out == n_corpus
    # near-dup drops = distinct doc_b of verified pairs that survived
    # the earlier gates; at minimum bounded by the pair entry's doc_bs
    dropped = {r.doc_b for r in fdedup.lsh_verified_pairs(spark, SF).collect()}
    assert rows["near_dup"].n_dropped <= len(dropped)


# ------------------------------------------------ leakage-safe split


def test_leakage_split_python_replay(spark):
    cc = {r.doc_id: r.cluster_id for r in fdedup.cc_clusters(spark, SF).collect()}

    def split_of(key: int) -> str:
        b = (key % fsplit.LEHMER_P) * fsplit.LEHMER_A % fsplit.LEHMER_P % 100
        for name, (lo, hi) in fsplit.SPLIT_BOUNDS.items():
            if lo <= b < hi:
                return name
        raise AssertionError

    out = fsplit.leakage_safe_split(spark, SF).collect()
    assert {r.doc_id: r.cluster_id for r in out} == cc
    clusters: dict = defaultdict(lambda: (set(), set()))
    naive_straddle = 0
    for r in out:
        assert r.split_safe == split_of(cc[r.doc_id])
        assert r.split_naive == split_of(r.doc_id)
    by_cluster: dict = defaultdict(list)
    for r in out:
        by_cluster[r.cluster_id].append(r)
    naive_straddle = sum(
        1 for ms in by_cluster.values()
        if len(ms) > 1 and len({m.split_naive for m in ms}) > 1
    )
    safe_straddle = sum(
        1 for ms in by_cluster.values()
        if len({m.split_safe for m in ms}) > 1
    )
    assert safe_straddle == 0
    for r in out[:5]:
        assert (r.straddle_naive, r.straddle_safe) == (naive_straddle, 0)
    # the corpus genuinely exhibits the leakage the safe split removes
    assert naive_straddle > 0


# ------------------------------------------------ Markov stationary


def test_markov_python_replay(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per_user: dict = defaultdict(list)
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        per_user[r.user_id].append(r.event_type)
    pairs: Counter = Counter()
    for seq in per_user.values():
        for a, b in zip(seq, seq[1:]):
            pairs[(a, b)] += 1
    rowt: Counter = Counter()
    for (a, _), n in pairs.items():
        rowt[a] += n
    states = sorted(rowt)
    k = len(states)
    x = {s: evan.MARKOV_E12 // k for s in states}
    masses = []
    for _ in range(2):
        nx: Counter = Counter()
        for (a, b), n in pairs.items():
            nx[b] += x[a] * n // rowt[a]
        x = dict(nx)
        masses.append(dict(x))

    out = {r.state: r for r in evan.markov_stationary(spark, SF).collect()}
    assert set(out) == set(states)
    total = sum(masses[1].values())
    for s in states:
        assert (out[s].mass1_e12, out[s].mass2_e12) == \
            (masses[0][s], masses[1][s])
        assert out[s].total_mass_e12 == total
        assert out[s].mass_conserved == \
            (evan.MARKOV_E12 - total <= k * 30)
    assert evan.MARKOV_E12 - total < k * 30  # dust stays bounded
