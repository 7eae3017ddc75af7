"""Round-4 batch-19 operators: exact nearest-rank percentiles, negative-
condition sequence matching, and the fixed-weight linear quality
classifier. Each pinned by a full Python replay over the real corpus,
plus the semantic edges that distinguish each operator (nearest-rank
boundary, the strictly-between negative condition, threshold keep mix).
"""

from __future__ import annotations

import hashlib

from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.functions import text as ftext
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ exact percentiles


def test_exact_percentiles_python_replay(spark):
    ev = load_table(spark, SF, "events").select(
        "event_type", "value", "event_id"
    ).collect()
    by_type: dict = {}
    for r in ev:
        by_type.setdefault(r.event_type, []).append((r.value, r.event_id))

    out = {r.event_type: r for r in evan.exact_percentiles(spark, SF).collect()}
    assert set(out) == set(by_type)
    for t, rows in by_type.items():
        rows.sort()
        n = len(rows)
        assert out[t].n == n
        for p in evan.PCT_RANKS:
            # nearest-rank: the value at 1-indexed rank ceil(p*n/100)
            rank = (n * p + 99) // 100
            assert getattr(out[t], f"p{p}") == rows[rank - 1][0]


def test_exact_percentiles_rank_boundary(spark):
    """p99 on n rows picks ceil(0.99 n), never the interpolated value:
    the selected percentile must be an actual corpus value."""
    ev = load_table(spark, SF, "events").select("event_type", "value").collect()
    vals = {(r.event_type, r.value) for r in ev}
    for r in evan.exact_percentiles(spark, SF).collect():
        for p in evan.PCT_RANKS:
            assert (r.event_type, getattr(r, f"p{p}")) in vals
        assert r.p50 <= r.p95 <= r.p99


# ------------------------------------------------ sequence match


def test_sequence_match_python_replay(spark):
    ev = load_table(spark, SF, "events").select(
        "user_id", "ts", "event_type", "event_id"
    ).collect()
    per_user: dict = {}
    for r in ev:
        per_user.setdefault(r.user_id, []).append(r)

    out = {r.user_id: r for r in evan.sequence_match(spark, SF).collect()}
    expect_users = {
        u for u, rows in per_user.items()
        if any(r.event_type == evan.SEQ_FROM for r in rows)
    }
    assert set(out) == expect_users

    for u in expect_users:
        rows = per_user[u]
        t1 = min(r.ts for r in rows if r.event_type == evan.SEQ_FROM)
        after = [r.ts for r in rows if r.event_type == evan.SEQ_TO and r.ts > t1]
        t2 = min(after) if after else None
        n_between = (
            sum(1 for r in rows if r.event_type == evan.SEQ_NOT and t1 < r.ts < t2)
            if t2 is not None else 0
        )
        got = out[u]
        assert got.t1 == t1 and got.t2 == t2
        assert got.n_between == n_between
        assert got.matched == (t2 is not None)
        assert got.clean == (t2 is not None and n_between == 0)


def test_sequence_match_negative_condition_binds(spark):
    """The corpus must exercise both sides of the negative condition:
    some matched users are clean, some are blocked by an error between
    the anchors (otherwise the entry would not pin the semantic)."""
    rows = evan.sequence_match(spark, SF).collect()
    matched = [r for r in rows if r.matched]
    assert any(r.clean for r in matched)
    assert any(not r.clean for r in matched)
    # clean is strictly stronger than matched
    assert all(r.matched for r in rows if r.clean)


# ------------------------------------------------ quality logit


def _bucket(key: int, n: int) -> int:
    return (key % fsplit.LEHMER_P) * fsplit.LEHMER_A % fsplit.LEHMER_P % n


def _bucket2(key: int, n: int) -> int:
    h1 = (key % fsplit.LEHMER_P) * fsplit.LEHMER_A % fsplit.LEHMER_P
    return h1 * fsplit.LEHMER_A % fsplit.LEHMER_P % n


def test_quality_logit_python_replay(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    out = {r.doc_id: r for r in ftext.quality_logit(spark, SF).collect()}
    assert set(out) == {r.doc_id for r in docs}

    for d in docs:
        toks = d.text.split(" ")
        score = 0
        for tok in toks:
            h = int(hashlib.md5(tok.encode()).hexdigest()[:7], 16)
            b = _bucket(h, ftext.HASHED_DIM)
            score += _bucket2(b, ftext.LOGIT_W_BUCKETS) - 8
        n = len(toks)
        logit_e6 = ((score + 8 * n) * 1_000_000) // n - 8_000_000
        got = out[d.doc_id]
        assert (got.n_tokens, got.score, got.logit_e6) == (n, score, logit_e6)
        assert got.keep == (logit_e6 >= ftext.LOGIT_KEEP_E6)


def test_quality_logit_threshold_mix(spark):
    """The gate must actually separate the corpus (both verdicts occur),
    and the weight table spans negative and positive mass."""
    rows = ftext.quality_logit(spark, SF).collect()
    kept = sum(r.keep for r in rows)
    assert 0 < kept < len(rows)
    assert min(r.score for r in rows) < 0 < max(r.score for r in rows)
