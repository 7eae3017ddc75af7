"""Round-4 batch-29 operators: feature-store matrix, declarative
alerting, vocabulary growth. Full Python replays plus: recency anchored
at the corpus max (not wall-clock), every alert rule firing with both
op kinds replayed, and the vocab curve's saturation + conservation
identities.
"""

from __future__ import annotations

from collections import Counter, defaultdict
from decimal import ROUND_HALF_UP, Decimal

from dnstap2clickhouse_spark.functions import splits as fsplit
from dnstap2clickhouse_spark.functions import text as ftext
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def _e6(v: float) -> int:
    return int(Decimal(v * 1_000_000).quantize(0, ROUND_HALF_UP))


# ------------------------------------------------ feature matrix


def test_feature_matrix_python_replay(spark):
    import datetime

    ev = load_table(spark, SF, "events").collect()
    mx = max(r.ts for r in ev)
    cut = mx - datetime.timedelta(days=evan.FEAT_RECENT_DAYS)
    per_user: dict = defaultdict(list)
    for r in ev:
        per_user[r.user_id].append(r)

    out = {r.user_id: r for r in evan.feature_matrix(spark, SF).collect()}
    assert set(out) == set(per_user)
    for u, rows in per_user.items():
        got = out[u]
        assert got.n_events == len(rows)
        for t in evan.EVENT_TYPES:
            assert getattr(got, f"n_{t}") == \
                sum(1 for r in rows if r.event_type == t)
            assert getattr(got, f"r_{t}") == \
                sum(1 for r in rows if r.event_type == t and r.ts >= cut)
        assert got.value_e6 == sum(_e6(r.value) for r in rows)
        last = max(int(r.ts.timestamp() * 1e6) for r in rows)
        assert got.last_seen_us == last
        assert got.recency_us == int(mx.timestamp() * 1e6) - last
        assert got.recency_us >= 0


# ------------------------------------------------ alert eval


def test_alert_eval_python_replay(spark):
    ev = load_table(spark, SF, "events").collect()
    hourly: dict = defaultdict(lambda: [0, 0])
    for r in ev:
        h = int(r.ts.timestamp() * 1_000_000) // 3_600_000_000
        cell = hourly[(h, r.event_type)]
        cell[0] += 1
        cell[1] += _e6(r.value)

    expect = set()
    for rid, t, metric, op, thr in evan.ALERT_RULES:
        for (h, et), (n, v) in hourly.items():
            if et != t:
                continue
            val = n if metric == "hourly_count" else v
            if (op == "gt" and val > thr) or (op == "lt" and val < thr):
                expect.add((rid, h, val))

    out = evan.alert_eval(spark, SF).collect()
    assert {(r.rule_id, r.h, r.val) for r in out} == expect
    # every rule fires, and both op kinds occur
    fired = Counter(r.rule_id for r in out)
    assert set(fired) == {rid for rid, *_ in evan.ALERT_RULES}
    assert {r.op for r in out} == {"gt", "lt"}
    for r in out:
        if r.op == "gt":
            assert r.val > r.threshold
        else:
            assert r.val < r.threshold


# ------------------------------------------------ vocab growth


def _order_key(doc_id: int) -> int:
    h1 = (doc_id % fsplit.LEHMER_P) * fsplit.LEHMER_A % fsplit.LEHMER_P
    return h1 * fsplit.LEHMER_A % fsplit.LEHMER_P % fsplit.LEHMER_P


def test_vocab_growth_python_replay(spark):
    docs = load_table(spark, SF, "documents").select("doc_id", "text").collect()
    ordered = sorted(docs, key=lambda d: (_order_key(d.doc_id), d.doc_id))
    n, k = len(ordered), ftext.VOCAB_QUARTILES
    first: dict = {}
    inflow = [[0, 0] for _ in range(k)]  # [docs, token instances]
    for pos, d in enumerate(ordered, start=1):
        q = (pos - 1) * k // n
        toks = d.text.split(" ")
        inflow[q][0] += 1
        inflow[q][1] += len(toks)
        for tok in toks:
            first.setdefault(tok, q)
    news = Counter(first.values())

    out = sorted(ftext.vocab_growth(spark, SF).collect(),
                 key=lambda r: r.quartile)
    assert [r.quartile for r in out] == list(range(k))
    cum = 0
    for r in out:
        assert (r.n_docs, r.n_token_instances) == tuple(inflow[r.quartile])
        assert r.n_new_types == news.get(r.quartile, 0)
        cum += r.n_new_types
        assert r.vocab_cum == cum
    # conservation: cumulative vocab ends at the true distinct count
    assert out[-1].vocab_cum == len(first)
    assert sum(r.n_docs for r in out) == n
