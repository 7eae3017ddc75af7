"""Round-4 batch-49 operators: dedup savings, discount bands, weekday
profile. Pins: Python replays of all three; reconciliation of the
savings row with the canonical corpus (docs_after == #clusters +
non-clustered docs, tokens_after == survivor token mass); band-edge
arithmetic; and the convention-proof weekday law (1970-01-01 epoch day
maps to Thursday == weekday 3 under the (d + 3) % 7 rule).
"""

from __future__ import annotations

from collections import defaultdict

from dnstap2clickhouse_spark.functions import dedup as fdedup
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.plans import tpch
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


def test_savings_report_reconciles(spark):
    docs = load_table(spark, SF, "documents").collect()
    labels = {r.doc_id: r.cluster_id
              for r in fdedup._cc_labels(spark, SF).collect()}
    survives = {r.doc_id: labels.get(r.doc_id, r.doc_id) == r.doc_id
                or r.doc_id not in labels for r in docs}
    toks = {r.doc_id: len(r.text.split(" ")) for r in docs}
    chars = {r.doc_id: len(r.text) for r in docs}
    [row] = fdedup.savings_report(spark, SF).collect()
    assert row.docs_before == len(docs)
    assert row.docs_after == sum(survives.values())
    assert row.tokens_before == sum(toks.values())
    assert row.tokens_after == sum(toks[d] for d in toks if survives[d])
    assert row.chars_after == sum(chars[d] for d in chars if survives[d])
    assert row.doc_savings_e6 == ((len(docs) - row.docs_after)
                                  * 1_000_000 // len(docs))
    assert row.token_savings_e6 == ((row.tokens_before - row.tokens_after)
                                    * 1_000_000 // row.tokens_before)
    # same survivor set as the canonical corpus entry
    canon = fdedup.canonical_corpus(spark, SF).collect()
    clustered = set(labels)
    assert row.docs_after == len(canon) + len(docs) - len(clustered)


def test_discount_bands_replay(spark):
    lines = load_table(spark, SF, "lineitem").selectExpr(
        "CAST(round(l_discount * 100) AS BIGINT) AS d_e2",
        "l_quantity",
        "CAST(round(l_extendedprice * 100) AS BIGINT) AS gross",
        "CAST(round(l_extendedprice * (1 - l_discount) * 100) AS BIGINT)"
        " AS net").collect()
    grid: dict = defaultdict(lambda: [0, 0, 0, 0])
    for r in lines:
        b = r.d_e2 // tpch.DISCOUNT_BAND_E2
        c = grid[b]
        c[0] += 1
        c[1] += int(r.l_quantity)
        c[2] += r.gross
        c[3] += r.net
    out = tpch.discount_bands(spark, SF).collect()
    for r in out:
        b = r.discount_pct_lo // tpch.DISCOUNT_BAND_E2
        n, q, g, net = grid[b]
        assert (r.n_lines, r.total_qty, r.gross_cents, r.net_cents) == (n, q, g, net)
        assert r.giveback_e6 == (g - net) * 1_000_000 // g
    assert sum(r.n_lines for r in out) == len(lines)
    # deeper discounts give back more (monotone by construction)
    gb = [r.giveback_e6 for r in sorted(out, key=lambda r: r.discount_pct_lo)]
    assert gb == sorted(gb)


def test_weekday_profile_replay_and_convention(spark):
    ev = load_table(spark, SF, "events").selectExpr(
        "user_id", "unix_micros(ts) AS t_us",
        "CAST(round(value * 100) AS BIGINT) AS cents").collect()
    grid: dict = defaultdict(lambda: [0, set(), 0])
    for r in ev:
        wd = ((r.t_us // 86_400_000_000) + 3) % 7
        c = grid[wd]
        c[0] += 1
        c[1].add(r.user_id)
        c[2] += r.cents
    total = len(ev)
    out = evan.weekday_profile(spark, SF).collect()
    for r in out:
        n, users, cents = grid[r.weekday]
        assert (r.n_events, r.n_users, r.total_cents) == (n, len(users), cents)
        assert r.event_share_e6 == n * 1_000_000 // total
    # convention proof: epoch day 0 (1970-01-01, a Thursday) -> 3
    assert ((0 // 86_400_000_000) + 3) % 7 == 3
