"""Round-4 batch-18 operators: BPE merge learning and 3-step journey
mining. These pin the operators' meaning: a full Python BPE replay
(pair counting, greedy left-to-right merge application, both rounds)
over the real corpus, the round-2 dependence on the round-1 merge, and
the journey counts recomputed from per-user event sequences.
"""

from __future__ import annotations

from collections import Counter

from dnstap2clickhouse_spark.functions import text as ftext
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------------ BPE merges


def _pair_counts(words):
    c: Counter = Counter()
    for w in words:
        for i in range(len(w) - 1):
            c[w[i : i + 2]] += 1
    return c


def test_bpe_merges_python_replay(spark):
    docs = load_table(spark, SF, "documents").select("text").collect()
    words = [w for r in docs for w in r.text.split(" ") if len(w) >= 2]

    p1 = _pair_counts(words)
    merge1 = min(p1.items(), key=lambda kv: (-kv[1], kv[0]))[0]
    # greedy left-to-right non-overlapping application == str.replace
    w2 = [w.replace(merge1, ftext.BPE_MARK) for w in words]
    p2 = _pair_counts([w for w in w2 if len(w) >= 2])

    def top(c):
        return sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: ftext.BPE_TOP]

    expect = [(1, p, n) for p, n in top(p1)] + [(2, p, n) for p, n in top(p2)]

    out = sorted(
        ftext.bpe_merges(spark, SF).collect(), key=lambda r: (r.round, r.rank)
    )
    assert [(r.round, r.pair, r.n) for r in out] == expect
    assert [r.rank for r in out] == [1, 2, 3, 4, 5, 1, 2, 3, 4, 5]
    assert [r.pair for r in out if r.is_merge] == [merge1, top(p2)[0][0]]


def test_bpe_round2_depends_on_merge(spark):
    """Round 2 must count over the MERGED corpus: the round-1 winner's
    count drops (its occurrences were rewritten to the 1-char mark),
    proving the recount isn't a copy of round 1."""
    rows = ftext.bpe_merges(spark, SF).collect()
    r1 = {r.pair: r.n for r in rows if r.round == 1}
    r2 = {r.pair: r.n for r in rows if r.round == 2}
    merge1 = [r.pair for r in rows if r.round == 1 and r.is_merge][0]
    assert r2.get(merge1, 0) < r1[merge1]
    # and the merged symbol participates in round-2 pairs
    assert any(ftext.BPE_MARK in p for p in r2) or merge1 not in r2


# ------------------------------------------------------ top paths


def test_top_paths_python_replay(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_id", "event_type"
    ).collect()
    per_user: dict = {}
    for r in sorted(ev, key=lambda r: (r.ts, r.event_id)):
        per_user.setdefault(r.user_id, []).append(r.event_type)
    c: Counter = Counter()
    for seq in per_user.values():
        for i in range(len(seq) - 2):
            c[tuple(seq[i : i + 3])] += 1
    expect = sorted(c.items(), key=lambda kv: (-kv[1], kv[0]))[: evan.PATHS_TOP]

    out = sorted(evan.top_paths(spark, SF).collect(), key=lambda r: r.rank)
    assert [((r.a, r.b, r.c), r.n) for r in out] == expect
    assert [r.rank for r in out] == list(range(1, len(out) + 1))
