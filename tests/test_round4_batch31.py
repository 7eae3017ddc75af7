"""Round-4 batch-31 operators: salted join/agg as a contract entry,
embedding drift, SLO burn-down. Pins: salted result == plain result
with the salted plan genuinely spreading the shuffle key, the drift
report replaying from integer mean vectors, and the burn-down's
cumulative arithmetic.
"""

from __future__ import annotations

from collections import defaultdict
from decimal import ROUND_HALF_UP, Decimal

from pyspark.sql import functions as F

from dnstap2clickhouse_spark.functions import similarity as fsim
from dnstap2clickhouse_spark.plans import events_analytics as evan
from dnstap2clickhouse_spark.plans import tpch
from dnstap2clickhouse_spark.sources.tables import load_table

SF = "/root/testdata/sf0.001"


# ------------------------------------------------ salted join


def test_salted_join_equals_plain(spark):
    out = {r.o_orderpriority: r.revenue_cents
           for r in tpch.salted_revenue_join(spark, SF).collect()}
    orders = load_table(spark, SF, "orders")
    li = load_table(spark, SF, "lineitem")
    plain = {
        r.o_orderpriority: r.cents
        for r in li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(F.sum(F.expr("CAST(round(l_extendedprice * 100) AS BIGINT)"))
             .alias("cents"))
        .collect()
    }
    assert out == plain


def test_salted_plan_spreads_key(spark):
    """The physical point: the salted join's shuffle key carries the
    salt column, so a hot priority cannot pin one reducer."""
    from dnstap2clickhouse_spark.operators.skew import SALT_COL

    plan = tpch.salted_revenue_join(spark, SF)._jdf.queryExecution().toString()
    assert SALT_COL in plan


# ------------------------------------------------ embedding drift


def test_embedding_drift_python_replay(spark):
    emb = load_table(spark, SF, "embeddings").collect()
    sums: dict = defaultdict(lambda: defaultdict(int))
    counts: dict = defaultdict(int)
    for r in emb:
        g = r.label % fsim.DRIFT_GROUPS
        counts[g] += 1
        for i, x in enumerate(r.embedding):
            sums[g][i] += int(
                Decimal(float(x) * fsim._E9).quantize(0, ROUND_HALF_UP)
            )
    diffs = [
        sums[0][i] // counts[0] - sums[1][i] // counts[1]
        for i in range(fsim.KMEANS_DIMS)
    ]
    dist = sum(float(d) * float(d) for d in diffs)
    top = max(range(len(diffs)), key=lambda i: (abs(diffs[i]), -i))

    [row] = fsim.embedding_drift(spark, SF).collect()
    assert row.dist_e6 == int(Decimal(dist / 1e12).quantize(0, ROUND_HALF_UP))
    assert row.top_dim == top + 1  # SQL dims are 1-based
    assert row.top_shift_e6 == int(
        Decimal(abs(diffs[top]) / 1e3).quantize(0, ROUND_HALF_UP)
    )


# ------------------------------------------------ SLO burn


def test_slo_burn_python_replay(spark):
    ev = load_table(spark, SF, "events").select("ts", "event_type").collect()
    daily: dict = defaultdict(lambda: [0, 0])
    for r in ev:
        d = int(r.ts.timestamp() * 1_000_000) // 86_400_000_000
        daily[d][0] += 1
        daily[d][1] += r.event_type == "error"

    out = sorted(evan.slo_burn(spark, SF).collect(), key=lambda r: r.day)
    assert [r.day for r in out] == sorted(daily)
    cum_t = cum_e = 0
    for r in out:
        n, e = daily[r.day]
        cum_t += n
        cum_e += e
        assert (r.n_events, r.n_errors) == (n, e)
        assert r.rate_e6 == e * 1_000_000 // n
        assert r.day_breached == (e * 10_000 > evan.SLO_BP * n)
        assert r.budget_used_e6 == \
            cum_e * 10_000_000_000 // (cum_t * evan.SLO_BP)
    # both outcomes occur — the objective genuinely separates days
    assert any(r.day_breached for r in out)
    assert any(not r.day_breached for r in out)
